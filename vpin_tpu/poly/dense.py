"""Dense multilinear polynomials as device-resident scalar vectors.

TPU-native counterpart of Spartan's DensePolynomial / EqPolynomial
(reference: Spartan/src/dense_mlpoly.rs:17-255):
  * eval tables live as FQ limb arrays (n, 16) in Montgomery form;
  * bound_poly_var_top is one fused vector op per sumcheck round;
  * eq-polynomial tables build as an L x R outer product of two
    half-tables (equivalent to the reference's doubling construction,
    dense_mlpoly.rs:78-94, but shape-stable for XLA).
Scalar values entering/leaving the device are exact host ints.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..field.prime_field import FQ, L_MODULUS


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
    """Full 2^ell eq table as an outer product of two half tables."""
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
    """Mutable dense multilinear polynomial over FQ (device)."""

    def __init__(self, Z: jnp.ndarray):
        assert Z.ndim == 2 and Z.shape[-1] == 16
        n = Z.shape[0]
        assert n & (n - 1) == 0, "length must be a power of two"
        self.Z = Z

    @staticmethod
    def from_ints(vals: Sequence[int]) -> "DensePoly":
        return DensePoly(ints_to_dev(vals))

    @property
    def len(self) -> int:
        return self.Z.shape[0]

    @property
    def num_vars(self) -> int:
        return int(self.len).bit_length() - 1

    def clone(self) -> "DensePoly":
        return DensePoly(self.Z)

    def bound_poly_var_top(self, r: int) -> None:
        r_dev = FQ.to_mont([r])
        from ..parallel.ops import sharded_bound_top
        out = sharded_bound_top(self.Z, r_dev[0])
        self.Z = out if out is not None else _bound_top(self.Z, r_dev)

    def evaluate(self, r: Sequence[int]) -> int:
        assert len(r) == self.num_vars
        chis = eq_evals(r)
        return int(FQ.from_mont(_dot(self.Z, chis)))

    def bound_L(self, L_dev: jnp.ndarray) -> jnp.ndarray:
        """L^T Z viewed as an (L_size x R_size) matrix -> (R_size,) vector
        (reference DensePolynomial::bound)."""
        lnv, rnv = factored_lens(self.num_vars)
        L_size, R_size = 1 << lnv, 1 << rnv
        M = self.Z.reshape(L_size, R_size, 16)
        return FQ.sum_reduce(FQ.mul(L_dev[:, None, :], M), axis=0)

    def index(self, i: int) -> int:
        return int(FQ.from_mont(self.Z[i]))
