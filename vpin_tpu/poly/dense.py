"""Dense multilinear polynomials — hybrid host/device eval tables.

TPU-native counterpart of Spartan's DensePolynomial / EqPolynomial
(reference: Spartan/src/dense_mlpoly.rs:17-255), with a size-based
backend split:

  * LARGE tables (> HOST_POLY_MAX, or whenever a device mesh is active)
    live as FQ limb arrays (n, 16) in Montgomery form on the device;
    bound_poly_var_top is one fused vector op per sumcheck round, sharded
    over the mesh (parallel/ops.py).
  * SMALL tables live as host int lists.  A sumcheck round over a
    64-entry table is a few hundred modmuls — host integers beat a
    device dispatch (and its per-shape XLA compile) by orders of
    magnitude.  This mirrors how the protocol spine (transcript, sigma
    NIZKs) is host-side: tiny serial work stays on the CPU, bulk work
    goes to the TPU.

Both backends produce bit-identical protocol values (everything is exact
arithmetic mod l); tests cross-check them.
"""

from __future__ import annotations

import functools
import os
from typing import List, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..field.prime_field import FQ, L_MODULUS

#: tables at or below this length use host int lists; 0 forces device
HOST_POLY_MAX = int(os.environ.get("VPIN_HOST_POLY_MAX", "8192"))


def host_tables_wanted(n: int) -> bool:
    """Host backend for a table of length n?  Device wins when a mesh is
    active (so sharded kernels are exercised) or the table is large."""
    if n > HOST_POLY_MAX:
        return False
    from ..parallel.mesh import get_mesh
    return get_mesh() is None


def ints_to_dev(vals: Sequence[int]) -> jnp.ndarray:
    return FQ.to_mont([int(v) % L_MODULUS for v in vals])


def small_ints_to_dev(arr: np.ndarray) -> jnp.ndarray:
    """Fast path: nonnegative int64 numpy array -> Montgomery device array
    (vectorized limb split; no per-element Python)."""
    arr = np.asarray(arr, dtype=np.int64)
    assert arr.size == 0 or arr.min() >= 0
    limbs = np.zeros(arr.shape + (16,), dtype=np.uint32)
    for i in range(4):
        limbs[..., i] = ((arr >> (16 * i)) & 0xFFFF).astype(np.uint32)
    return FQ._to_mont_jit(jnp.asarray(limbs))


def dev_to_ints(arr) -> List[int]:
    return [int(v) for v in FQ.from_mont(arr).reshape(-1)]


@functools.partial(jax.jit, static_argnames=("n_bits",))
def _bit_product_evals(r_dev, n_bits: int):
    """eq table over n_bits variables: evals[i] = prod_j f(r_j, bit_j(i)),
    with r_0 on the MOST significant index bit (reference convention)."""
    n = 1 << n_bits
    idx = jnp.arange(n, dtype=jnp.uint32)
    acc = FQ.ones((n,))
    one = FQ.ones(())
    for j in range(n_bits):
        bit = (idx >> (n_bits - 1 - j)) & 1
        rj = r_dev[j]
        factor = FQ.select(bit == 1, jnp.broadcast_to(rj, (n, 16)),
                           jnp.broadcast_to(FQ.sub(one, rj), (n, 16)))
        acc = FQ.mul(acc, factor)
    return acc


def eq_evals(r: Sequence[int]) -> jnp.ndarray:
    """Full 2^ell eq table as an outer product of two half tables (device)."""
    ell = len(r)
    if ell == 0:
        return FQ.ones((1,))
    half = ell // 2
    if half == 0 or ell <= 4:
        return _bit_product_evals(ints_to_dev(r), ell)
    L = _bit_product_evals(ints_to_dev(r[:half]), half)
    R = _bit_product_evals(ints_to_dev(r[half:]), ell - half)
    outer = FQ.mul(L[:, None, :], R[None, :, :])
    return outer.reshape(-1, 16)


def eq_evals_host(r: Sequence[int]) -> List[int]:
    """Full 2^ell eq table as host ints (doubling construction,
    reference dense_mlpoly.rs:78-94)."""
    evals = [1]
    for rj in r:
        rj = int(rj) % L_MODULUS
        nxt = []
        for v in evals:
            hi = v * rj % L_MODULUS
            nxt.append((v - hi) % L_MODULUS)
            nxt.append(hi)
        evals = nxt
    return evals


def eq_eval_single(r: Sequence[int], rx: Sequence[int]) -> int:
    """eq(r, rx) as an exact host int (reference EqPolynomial::evaluate)."""
    acc = 1
    for a, b in zip(r, rx):
        acc = acc * ((a * b + (1 - a) * (1 - b)) % L_MODULUS) % L_MODULUS
    return acc


def factored_lens(ell: int):
    return ell // 2, ell - ell // 2


@jax.jit
def _bound_top(Z, r_dev):
    n = Z.shape[0] // 2
    lo, hi = Z[:n], Z[n:]
    return FQ.add(lo, FQ.mul(jnp.broadcast_to(r_dev, (n, 16)), FQ.sub(hi, lo)))


@jax.jit
def _dot(a, b):
    return FQ.dot(a, b, axis=0)


class DensePoly:
    """Mutable dense multilinear polynomial over FQ.

    Backed by either a device Montgomery limb array (``Z``) or a host int
    list (``Zh``); exactly one is non-None.
    """

    def __init__(self, Z: Union[jnp.ndarray, List[int]]):
        if isinstance(Z, list):
            n = len(Z)
            assert n & (n - 1) == 0, "length must be a power of two"
            self.Zh: List[int] = Z
            self.Z = None
        else:
            assert Z.ndim == 2 and Z.shape[-1] == 16
            n = Z.shape[0]
            assert n & (n - 1) == 0, "length must be a power of two"
            self.Z = Z
            self.Zh = None

    @property
    def is_host(self) -> bool:
        return self.Zh is not None

    @staticmethod
    def from_ints(vals: Sequence[int]) -> "DensePoly":
        vals = [int(v) % L_MODULUS for v in vals]
        if host_tables_wanted(len(vals)):
            return DensePoly(vals)
        return DensePoly(ints_to_dev(vals))

    def to_dev(self) -> "DensePoly":
        if self.is_host:
            return DensePoly(ints_to_dev(self.Zh))
        return self

    def to_host(self) -> "DensePoly":
        if self.is_host:
            return self
        return DensePoly(dev_to_ints(self.Z))

    @property
    def len(self) -> int:
        return len(self.Zh) if self.is_host else self.Z.shape[0]

    @property
    def num_vars(self) -> int:
        return int(self.len).bit_length() - 1

    def clone(self) -> "DensePoly":
        return DensePoly(list(self.Zh) if self.is_host else self.Z)

    def bound_poly_var_top(self, r: int) -> None:
        if self.is_host:
            Zh = self.Zh
            n = len(Zh) // 2
            r = int(r) % L_MODULUS
            self.Zh = [(Zh[i] + r * (Zh[n + i] - Zh[i])) % L_MODULUS
                       for i in range(n)]
            return
        r_dev = FQ.to_mont([r])
        from ..parallel.ops import sharded_bound_top
        out = sharded_bound_top(self.Z, r_dev[0])
        self.Z = out if out is not None else _bound_top(self.Z, r_dev)

    def evaluate(self, r: Sequence[int]) -> int:
        assert len(r) == self.num_vars
        if self.is_host:
            chis = eq_evals_host(r)
            return sum(v * c for v, c in zip(self.Zh, chis)) % L_MODULUS
        chis = eq_evals(r)
        return int(FQ.from_mont(_dot(self.Z, chis)))

    def bound_L(self, L_vec) -> Union[jnp.ndarray, List[int]]:
        """L^T Z viewed as an (L_size x R_size) matrix -> (R_size,) vector
        (reference DensePolynomial::bound).  Host polys take a host int
        list and return one; device polys take a device vector."""
        lnv, rnv = factored_lens(self.num_vars)
        L_size, R_size = 1 << lnv, 1 << rnv
        if self.is_host:
            Zh = self.Zh
            return [sum(int(L_vec[i]) * Zh[i * R_size + j]
                        for i in range(L_size)) % L_MODULUS
                    for j in range(R_size)]
        M = self.Z.reshape(L_size, R_size, 16)
        # stream row chunks: the full (L, R, 16) product is 8x-padded as
        # an HLO temp on TPU (16 -> 128 lanes), OOMing at SPARK scale
        chunk = max(1, (1 << 19) // R_size)
        rp = 1
        while rp * 2 <= chunk:
            rp *= 2
        if L_size <= rp:
            return FQ.sum_reduce(FQ.mul(L_vec[:, None, :], M), axis=0)
        acc = FQ.zeros((R_size,))
        for lo in range(0, L_size, rp):
            hi = min(lo + rp, L_size)
            part = FQ.sum_reduce(
                FQ.mul(L_vec[lo:hi, None, :], M[lo:hi]), axis=0)
            acc = FQ.add(acc, part)
        return acc

    def index(self, i: int) -> int:
        if self.is_host:
            return self.Zh[i]
        return int(FQ.from_mont(self.Z[i]))
