"""R1CS instances as device-regularized sparse matrices.

TPU-native counterpart of Spartan's SparseMatPolynomial / R1CSInstance
(reference: Spartan/src/r1csinstance.rs, sparse_mlpoly.rs:440-500).

Scale design (LeNet-L5 is ~2e7 constraints / ~1e8 nonzeros):
  * entries live as numpy arrays (rows/cols int64 + a small VALUE
    CODEBOOK: gadget matrices draw values from a tiny set — powers of
    two, +-1, +-2 — so values are int32 codes into a <=300-entry
    codebook, 20 B/entry instead of Python tuples);
  * multiply_vec / compute_eval_table regularize by COUNT BUCKETS: the
    entries of every row (resp. column) with the same nonzero count form
    one (m, k) gather+mul+tree-reduce kernel — no data-dependent
    scatter, no padding blowup from one heavy row;
  * row buckets shard over the active mesh (parallel/ops.py);
  * evaluate() contracts val * eq_rx[row] * eq_ry[col] in device chunks.

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
from ..poly.dense import (DensePoly, eq_evals, eq_evals_host,
                          host_tables_wanted, ints_to_dev)


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


def _to_arrays(entries):
    """Entries (list of (row, col, val) tuples OR (rows, cols, vals)
    array triple) -> (rows int64, cols int64, vals object ndarray)."""
    if isinstance(entries, tuple) and len(entries) == 3:
        rows, cols, vals = entries
        return (np.asarray(rows, dtype=np.int64),
                np.asarray(cols, dtype=np.int64),
                np.asarray(vals, dtype=object))
    rows = np.fromiter((int(e[0]) for e in entries), dtype=np.int64,
                       count=len(entries))
    cols = np.fromiter((int(e[1]) for e in entries), dtype=np.int64,
                       count=len(entries))
    vals = np.empty(len(entries), dtype=object)
    for i, e in enumerate(entries):
        vals[i] = int(e[2])
    return rows, cols, vals


def _bucket_layout(keys: np.ndarray, others: np.ndarray, codes: np.ndarray,
                   num_segments: int):
    """Group entries by segment id `keys`; one (segs, idx, code) triple per
    distinct per-segment nonzero count (segments of equal count batch
    into a single regular kernel)."""
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    os_ = others[order]
    cs = codes[order]
    counts = np.bincount(ks, minlength=num_segments)
    buckets = []
    for k in np.unique(counts[counts > 0]):
        segs = np.where(counts == k)[0]
        sel = counts[ks] == k
        m = len(segs)
        idx = os_[sel].reshape(m, int(k))
        code = cs[sel].reshape(m, int(k))
        buckets.append((segs.astype(np.int64), idx.astype(np.int64),
                        code.astype(np.int32)))
    return buckets


class SparseMat:
    """One sparse matrix as (rows, cols, value-codebook codes)."""

    def __init__(self, entries, num_rows: int, num_cols_hint: int):
        rows, cols, vals = _to_arrays(entries)
        self.rows = rows
        self.cols = cols
        self.num_rows = num_rows
        self.num_cols_hint = num_cols_hint
        # value codebook: code 0 is always the field zero (pad value)
        book = {0: 0}
        codes = np.empty(len(vals), dtype=np.int32)
        for i, v in enumerate(vals):
            v = int(v) % L
            code = book.get(v)
            if code is None:
                code = len(book)
                book[v] = code
            codes[i] = code
        self.codes = codes
        self.codebook: List[int] = list(book.keys())
        self._codebook_mont = None
        self._row_buckets = None
        self._col_buckets = None

    @property
    def nnz(self) -> int:
        return int(len(self.rows))

    @property
    def entries(self):
        """Lazy (row, col, val) tuples — for digests/small paths only."""
        cb = self.codebook
        return [(int(r), int(c), cb[int(k)])
                for r, c, k in zip(self.rows, self.cols, self.codes)]

    def _book_mont(self):
        if self._codebook_mont is None:
            self._codebook_mont = FQ.to_mont(self.codebook)
        return self._codebook_mont

    # -- bucketed reductions --------------------------------------------

    #: bound on idx-elements per kernel (the 16x16 limb-product temporary
    #: costs ~1 KB per element; 2^20 elements ~ 1 GB peak)
    REDUCE_CHUNK_ELEMS = 1 << 20

    def _reduce_buckets(self, buckets, table_dev, out_len: int):
        """sum_k val * table[idx] per segment, scattered into (out_len,);
        big buckets stream in segment chunks to bound HBM peaks."""
        from ..parallel.ops import sharded_regular_reduce
        book = self._book_mont()
        out = FQ.zeros((out_len,))
        for segs, idx, code in buckets:
            m, k = idx.shape
            rows_per = max(1, self.REDUCE_CHUNK_ELEMS // max(k, 1))
            # round the chunk to a power of two so kernels are shared
            rp = 1
            while rp * 2 <= rows_per:
                rp *= 2
            for lo in range(0, m, rp):
                hi = min(lo + rp, m)
                vals_dev = book[jnp.asarray(code[lo:hi])]
                idx_dev = jnp.asarray(idx[lo:hi])
                part = sharded_regular_reduce(vals_dev, idx_dev, table_dev,
                                              hi - lo)
                if part is None:
                    part = _regular_reduce(vals_dev, idx_dev, table_dev,
                                           hi - lo)
                out = out.at[jnp.asarray(segs[lo:hi])].set(part)
        return out

    def multiply_vec(self, num_cols: int, z_dev: jnp.ndarray) -> jnp.ndarray:
        """-> (num_rows,) device vector; z_dev: (num_cols, 16) mont."""
        if self._row_buckets is None:
            self._row_buckets = _bucket_layout(self.rows, self.cols,
                                               self.codes, self.num_rows)
        return self._reduce_buckets(self._row_buckets, z_dev, self.num_rows)

    def compute_eval_table(self, evals_rx_dev: jnp.ndarray,
                           num_cols: int) -> jnp.ndarray:
        """-> (num_cols,) device vector M^T evals_rx."""
        if self._col_buckets is None:
            self._col_buckets = _bucket_layout(self.cols, self.rows,
                                               self.codes, num_cols)
        return self._reduce_buckets(self._col_buckets, evals_rx_dev, num_cols)

    # -- host paths (small instances: protocol-spine arithmetic) ---------

    def multiply_vec_host(self, z: List[int]) -> List[int]:
        cb = self.codebook
        out = [0] * self.num_rows
        for r, c, k in zip(self.rows.tolist(), self.cols.tolist(),
                           self.codes.tolist()):
            out[r] += cb[k] * z[c]
        return [v % L for v in out]

    def compute_eval_table_host(self, evals_rx: List[int],
                                num_cols: int) -> List[int]:
        cb = self.codebook
        out = [0] * num_cols
        for r, c, k in zip(self.rows.tolist(), self.cols.tolist(),
                           self.codes.tolist()):
            out[c] += cb[k] * evals_rx[r]
        return [v % L for v in out]

    def evaluate_host(self, eq_rx: List[int], eq_ry: List[int]) -> int:
        cb = self.codebook
        total = 0
        for r, c, k in zip(self.rows.tolist(), self.cols.tolist(),
                           self.codes.tolist()):
            total += cb[k] * eq_rx[r] % L * eq_ry[c]
        return total % L

    # -- evaluation -------------------------------------------------------

    def evaluate(self, eq_rx_dev: jnp.ndarray, eq_ry_dev: jnp.ndarray,
                 chunk: int = 1 << 20) -> int:
        book = self._book_mont()
        total = FQ.zeros(())
        for lo in range(0, self.nnz, chunk):
            hi = min(lo + chunk, self.nnz)
            rows = jnp.asarray(self.rows[lo:hi])
            cols = jnp.asarray(self.cols[lo:hi])
            vals = book[jnp.asarray(self.codes[lo:hi])]
            prod = FQ.mul(FQ.mul(vals, eq_rx_dev[rows]), eq_ry_dev[cols])
            total = FQ.add(total, FQ.sum_reduce(prod, axis=0))
        return int(FQ.from_mont(total))


class R1CSInstance:
    """Padded R1CS instance (reference Instance::new semantics)."""

    def __init__(self, num_cons: int, num_vars: int, num_inputs: int,
                 A, B, C):
        num_vars_padded = _next_pow2(max(num_vars, num_inputs + 1))
        num_cons_padded = _next_pow2(max(num_cons, 2))

        def shift(entries):
            rows, cols, vals = _to_arrays(entries)
            assert rows.size == 0 or (rows.max() < num_cons
                                      and cols.max() < num_vars + 1 + num_inputs)
            delta = num_vars_padded - num_vars
            if delta:
                cols = np.where(cols >= num_vars, cols + delta, cols)
            # reference pads a dummy zero entry per constraint when the
            # original count was 0/1 (lib.rs:208-214)
            if num_cons in (0, 1):
                extra = np.arange(len(rows), num_cons_padded, dtype=np.int64)
                rows = np.concatenate([rows, extra])
                cols = np.concatenate(
                    [cols, np.full(len(extra), num_vars, np.int64)])
                zpad = np.zeros(len(extra), dtype=object)
                vals = np.concatenate([vals, zpad]) if len(vals) else zpad
            return (rows, cols, vals)

        self.num_cons = num_cons_padded
        self.num_vars = num_vars_padded
        self.num_inputs = num_inputs
        self.total_nnz = 0
        ncols = 2 * num_vars_padded
        self.A = SparseMat(shift(A), num_cons_padded, ncols)
        self.B = SparseMat(shift(B), num_cons_padded, ncols)
        self.C = SparseMat(shift(C), num_cons_padded, ncols)
        self.total_nnz = self.A.nnz + self.B.nnz + self.C.nnz

    @property
    def host_mode(self) -> bool:
        """Small instances run the sat-proof table math on host ints."""
        return (host_tables_wanted(max(self.num_cons, 2 * self.num_vars))
                and self.total_nnz <= (1 << 17))

    # ------------------------------------------------------------------

    def build_z(self, vars_ints, inputs: Sequence[int]):
        """z = vars || 1 || inputs || 0-pad, length 2*num_vars.
        vars_ints: host int list OR a Montgomery device array (n, 16).
        Returns a host int list in host mode, a device array otherwise."""
        if isinstance(vars_ints, jnp.ndarray):
            assert vars_ints.shape[0] == self.num_vars
            tail = ints_to_dev([1] + list(inputs))
            pad = FQ.zeros((2 * self.num_vars - self.num_vars - 1
                            - len(inputs),))
            return jnp.concatenate([vars_ints, tail, pad], axis=0)
        assert len(vars_ints) == self.num_vars
        z = [int(v) % L for v in vars_ints] + [1] + \
            [int(v) % L for v in inputs]
        z += [0] * (2 * self.num_vars - len(z))
        if self.host_mode:
            return z
        return ints_to_dev(z)

    def multiply_vec(self, z) -> Tuple[DensePoly, DensePoly, DensePoly]:
        if isinstance(z, list):
            return (DensePoly(self.A.multiply_vec_host(z)),
                    DensePoly(self.B.multiply_vec_host(z)),
                    DensePoly(self.C.multiply_vec_host(z)))
        ncols = 2 * self.num_vars
        return (DensePoly(self.A.multiply_vec(ncols, z)),
                DensePoly(self.B.multiply_vec(ncols, z)),
                DensePoly(self.C.multiply_vec(ncols, z)))

    def is_sat(self, vars_ints, inputs: Sequence[int]) -> bool:
        if isinstance(vars_ints, jnp.ndarray):
            pad = FQ.zeros((self.num_vars - vars_ints.shape[0],))
            z = self.build_z(jnp.concatenate([vars_ints, pad], axis=0), inputs)
        else:
            vars_padded = list(vars_ints) + \
                [0] * (self.num_vars - len(vars_ints))
            z = self.build_z(vars_padded, inputs)
        Az, Bz, Cz = self.multiply_vec(z)
        if Az.is_host:
            return all(a * b % L == c
                       for a, b, c in zip(Az.Zh, Bz.Zh, Cz.Zh))
        lhs = FQ.mul(Az.Z, Bz.Z)
        ok = bool(np.asarray(FQ.eq(lhs, Cz.Z)).all())
        if ok:
            # the prover recomputes exactly this multiply_vec over the
            # same z (r1csproof._r1cs_prove_core); stash it so the
            # gadget-build assert isn't paid twice at scale
            self._sat_cache = (z, Az, Bz, Cz)
        return ok

    def consume_sat_cache(self, z):
        """(Az, Bz, Cz) cached by a successful is_sat over a bit-equal z,
        or None.  One device equality reduction guards against callers
        proving a different assignment than they checked."""
        cache = getattr(self, "_sat_cache", None)
        if cache is None:
            return None
        self._sat_cache = None
        zc, Az, Bz, Cz = cache
        if isinstance(z, jnp.ndarray) and isinstance(zc, jnp.ndarray) \
                and z.shape == zc.shape \
                and bool(jnp.all(z == zc)):
            return Az, Bz, Cz
        return None

    def compute_eval_table_sparse(self, evals_rx):
        ncols = 2 * self.num_vars
        if isinstance(evals_rx, list):
            return (self.A.compute_eval_table_host(evals_rx, ncols),
                    self.B.compute_eval_table_host(evals_rx, ncols),
                    self.C.compute_eval_table_host(evals_rx, ncols))
        return (self.A.compute_eval_table(evals_rx, ncols),
                self.B.compute_eval_table(evals_rx, ncols),
                self.C.compute_eval_table(evals_rx, ncols))

    def evaluate(self, rx: Sequence[int], ry: Sequence[int]):
        if self.host_mode:
            eq_rx = eq_evals_host(rx)
            eq_ry = eq_evals_host(ry)
            return (self.A.evaluate_host(eq_rx, eq_ry),
                    self.B.evaluate_host(eq_rx, eq_ry),
                    self.C.evaluate_host(eq_rx, eq_ry))
        eq_rx = eq_evals(rx)
        eq_ry = eq_evals(ry)
        return (self.A.evaluate(eq_rx, eq_ry),
                self.B.evaluate(eq_rx, eq_ry),
                self.C.evaluate(eq_rx, eq_ry))
