"""R1CS instances as device-regularized sparse matrices.

TPU-native counterpart of Spartan's SparseMatPolynomial / R1CSInstance
(reference: Spartan/src/r1csinstance.rs, sparse_mlpoly.rs:440-500):
  * multiply_vec (Az/Bz/Cz) pads each matrix to row-regular form — a
    (num_cons, k_row) gather + field-mul + small tree reduction;
  * compute_eval_table_sparse pads to column-regular form, with "heavy"
    columns (e.g. the constant-one column that every gadget constraint
    touches) split out and tree-reduced separately — no data-dependent
    scatter anywhere;
  * evaluate() contracts val * eq_rx[row] * eq_ry[col] in one fused pass.
Instance::new padding semantics (pow2 cons/vars, input-column shift)
follow lib.rs:146-244 exactly.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..field.prime_field import FQ, L_MODULUS as L
from ..poly.dense import DensePoly, eq_evals, ints_to_dev


def _next_pow2(n: int) -> int:
    m = 1
    while m < n:
        m *= 2
    return m


@functools.partial(jax.jit, static_argnames=("nseg",))
def _regular_reduce(vals_mont, idx, z, nseg: int):
    """out[s] = sum_k vals[s, k] * z[idx[s, k]]  (idx into z rows)."""
    gathered = z[idx]                       # (nseg, k, 16)
    prod = FQ.mul(vals_mont, gathered)
    return FQ.sum_reduce(prod, axis=1)


@jax.jit
def _masked_dot(vals_mont, gathered):
    return FQ.sum_reduce(FQ.mul(vals_mont, gathered), axis=0)


class SparseMat:
    """One sparse matrix in (row, col, val) form + device-regular layouts."""

    def __init__(self, entries: List[Tuple[int, int, int]], num_rows: int,
                 num_cols_hint: int):
        self.entries = [(int(r), int(c), int(v) % L) for r, c, v in entries]
        self.num_rows = num_rows
        self.num_cols_hint = num_cols_hint
        self._row_layout = None
        self._col_layout = None

    @property
    def nnz(self) -> int:
        return len(self.entries)

    # -- row-regular layout (for multiply_vec) --------------------------

    def _build_row_layout(self):
        rows = {}
        for r, c, v in self.entries:
            rows.setdefault(r, []).append((c, v))
        kmax = max((len(x) for x in rows.values()), default=1)
        idx = np.zeros((self.num_rows, kmax), dtype=np.int32)
        vals = [[0] * kmax for _ in range(self.num_rows)]
        for r, lst in rows.items():
            for k, (c, v) in enumerate(lst):
                idx[r, k] = c
                vals[r][k] = v
        vals_dev = FQ.to_mont(vals)
        self._row_layout = (jnp.asarray(idx), vals_dev)

    def multiply_vec(self, num_cols: int, z_dev: jnp.ndarray) -> jnp.ndarray:
        """-> (num_rows,) device vector; z_dev: (num_cols, 16) mont."""
        if self._row_layout is None:
            self._build_row_layout()
        idx, vals = self._row_layout
        return _regular_reduce(vals, idx, z_dev, self.num_rows)

    # -- column-regular layout (for compute_eval_table_sparse) ----------

    def _build_col_layout(self, num_cols: int, heavy_threshold: int = 8):
        cols = {}
        for r, c, v in self.entries:
            cols.setdefault(c, []).append((r, v))
        regular, heavy = {}, {}
        for c, lst in cols.items():
            (heavy if len(lst) > heavy_threshold else regular)[c] = lst
        kmax = max((len(x) for x in regular.values()), default=1)
        reg_cols = sorted(regular)
        idx = np.zeros((max(len(reg_cols), 1), kmax), dtype=np.int32)
        vals = [[0] * kmax for _ in range(max(len(reg_cols), 1))]
        for i, c in enumerate(reg_cols):
            for k, (r, v) in enumerate(regular[c]):
                idx[i, k] = r
                vals[i][k] = v
        heavy_list = []
        for c in sorted(heavy):
            lst = heavy[c]
            n = _next_pow2(len(lst))
            ridx = np.zeros((n,), dtype=np.int32)
            rvals = [0] * n
            for k, (r, v) in enumerate(lst):
                ridx[k] = r
                rvals[k] = v
            heavy_list.append((c, jnp.asarray(ridx), FQ.to_mont(rvals)))
        self._col_layout = (np.asarray(reg_cols, dtype=np.int64),
                            jnp.asarray(idx), FQ.to_mont(vals), heavy_list)

    def compute_eval_table(self, evals_rx_dev: jnp.ndarray,
                           num_cols: int) -> jnp.ndarray:
        """-> (num_cols,) device vector M^T evals_rx."""
        if self._col_layout is None:
            self._build_col_layout(num_cols)
        reg_cols, idx, vals, heavy_list = self._col_layout
        out = FQ.zeros((num_cols,))
        if len(reg_cols):
            contrib = _regular_reduce(vals, idx, evals_rx_dev, idx.shape[0])
            out = out.at[reg_cols].set(contrib)
        for c, ridx, rvals in heavy_list:
            val = _masked_dot(rvals, evals_rx_dev[ridx])
            out = out.at[c].set(val)
        return out

    # -- evaluation -----------------------------------------------------

    def evaluate(self, eq_rx_dev: jnp.ndarray, eq_ry_dev: jnp.ndarray) -> int:
        rows = np.asarray([e[0] for e in self.entries], dtype=np.int64)
        cols = np.asarray([e[1] for e in self.entries], dtype=np.int64)
        vals = FQ.to_mont([e[2] for e in self.entries])
        prod = FQ.mul(FQ.mul(vals, eq_rx_dev[rows]), eq_ry_dev[cols])
        return int(FQ.from_mont(FQ.sum_reduce(prod, axis=0)))


class R1CSInstance:
    """Padded R1CS instance (reference Instance::new semantics)."""

    def __init__(self, num_cons: int, num_vars: int, num_inputs: int,
                 A: Sequence[Tuple[int, int, int]],
                 B: Sequence[Tuple[int, int, int]],
                 C: Sequence[Tuple[int, int, int]]):
        num_vars_padded = _next_pow2(max(num_vars, num_inputs + 1))
        num_cons_padded = _next_pow2(max(num_cons, 2))

        def shift(entries):
            out = []
            for r, c, v in entries:
                assert r < num_cons and c < num_vars + 1 + num_inputs
                if c >= num_vars:
                    out.append((r, c + num_vars_padded - num_vars, v % L))
                else:
                    out.append((r, c, v % L))
            # reference pads a dummy zero entry per constraint when the
            # original count was 0/1 (lib.rs:208-214)
            if num_cons in (0, 1):
                for i in range(len(out), num_cons_padded):
                    out.append((i, num_vars, 0))
            return out

        self.num_cons = num_cons_padded
        self.num_vars = num_vars_padded
        self.num_inputs = num_inputs
        ncols = 2 * num_vars_padded
        self.A = SparseMat(shift(A), num_cons_padded, ncols)
        self.B = SparseMat(shift(B), num_cons_padded, ncols)
        self.C = SparseMat(shift(C), num_cons_padded, ncols)

    # ------------------------------------------------------------------

    def build_z(self, vars_ints: Sequence[int], inputs: Sequence[int]) -> jnp.ndarray:
        """z = vars || 1 || inputs || 0-pad, length 2*num_vars (device)."""
        assert len(vars_ints) == self.num_vars
        z = list(vars_ints) + [1] + list(inputs)
        z += [0] * (2 * self.num_vars - len(z))
        return ints_to_dev(z)

    def multiply_vec(self, z_dev) -> Tuple[DensePoly, DensePoly, DensePoly]:
        ncols = 2 * self.num_vars
        return (DensePoly(self.A.multiply_vec(ncols, z_dev)),
                DensePoly(self.B.multiply_vec(ncols, z_dev)),
                DensePoly(self.C.multiply_vec(ncols, z_dev)))

    def is_sat(self, vars_ints: Sequence[int], inputs: Sequence[int]) -> bool:
        vars_padded = list(vars_ints) + [0] * (self.num_vars - len(vars_ints))
        z = self.build_z(vars_padded, inputs)
        Az, Bz, Cz = self.multiply_vec(z)
        lhs = FQ.mul(Az.Z, Bz.Z)
        return bool(np.asarray(FQ.eq(lhs, Cz.Z)).all())

    def compute_eval_table_sparse(self, evals_rx_dev):
        ncols = 2 * self.num_vars
        return (self.A.compute_eval_table(evals_rx_dev, ncols),
                self.B.compute_eval_table(evals_rx_dev, ncols),
                self.C.compute_eval_table(evals_rx_dev, ncols))

    def evaluate(self, rx: Sequence[int], ry: Sequence[int]):
        eq_rx = eq_evals(rx)
        eq_ry = eq_evals(ry)
        return (self.A.evaluate(eq_rx, eq_ry),
                self.B.evaluate(eq_rx, eq_ry),
                self.C.evaluate(eq_rx, eq_ry))
