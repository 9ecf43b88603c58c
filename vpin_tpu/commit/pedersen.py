"""Pedersen commitments over ristretto255, batched on TPU.

Mirrors Spartan's commitments.rs exactly:
  * MultiCommitGens::new derives n+1 generators from
    SHAKE256(label || compressed ristretto basepoint) via the one-way map
    (reference: Spartan/src/commitments.rs:20-38);
  * commit = MSM(scalars, G) + blind * h (commitments.rs:74-98);
  * the Hyrax row-commit (DensePolynomial::commit_inner,
    dense_mlpoly.rs:160-191) becomes one batched ladder over an
    (L_size, R_size) grid + a row reduction — the rayon `par_iter` of the
    reference is replaced by device batching (and later by sharded pjit).
"""

from __future__ import annotations

import functools
import hashlib
from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from ..field.prime_field import FQ, int_to_limbs
from ..curve.ristretto import (
    RISTRETTO, PointE, RISTRETTO_BASEPOINT_COMPRESSED,
)

R = RISTRETTO


def _demont_bits(scalars_mont: jnp.ndarray, n_bits: int = 253) -> jnp.ndarray:
    plain = FQ.mul(scalars_mont,
                   jnp.broadcast_to(jnp.asarray(int_to_limbs(1)), scalars_mont.shape))
    return FQ.limbs_to_bits(plain, n_bits)


class MultiCommitGens:
    """n generators + blinding generator h."""

    def __init__(self, n: int, G: PointE, h: PointE):
        self.n = n
        self.G = G          # (n,) batch
        self.h = h          # () single

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def new(n: int, label: bytes) -> "MultiCommitGens":
        shake = hashlib.shake_256()
        shake.update(label)
        shake.update(RISTRETTO_BASEPOINT_COMPRESSED)
        stream = shake.digest(64 * (n + 1))
        chunks = [stream[64 * i: 64 * (i + 1)] for i in range(n + 1)]
        pts = R.from_uniform_bytes(chunks)
        G = PointE(*(c[:n] for c in pts))
        h = PointE(*(c[n] for c in pts))
        return MultiCommitGens(n, G, h)

    def split_at(self, mid: int) -> Tuple["MultiCommitGens", "MultiCommitGens"]:
        g1 = PointE(*(c[:mid] for c in self.G))
        g2 = PointE(*(c[mid:] for c in self.G))
        return (MultiCommitGens(mid, g1, self.h),
                MultiCommitGens(self.n - mid, g2, self.h))

    def scale(self, s: int) -> "MultiCommitGens":
        from ..curve.weierstrass import scalars_to_bits
        bits = scalars_to_bits([s % FQ.modulus] * self.n, 253)
        return MultiCommitGens(self.n, R.pscalar_mul_bits(self.G, bits), self.h)


def commit_scalar(x: int, blind: int, gens: MultiCommitGens) -> PointE:
    """x*G[0] + blind*h for single host scalars."""
    assert gens.n == 1
    from ..curve.weierstrass import scalars_to_bits
    G0 = PointE(*(c[0] for c in gens.G))
    stack = PointE(*(jnp.stack([a[0], b], axis=0) for a, b in zip(gens.G, gens.h)))
    bits = scalars_to_bits([x % FQ.modulus, blind % FQ.modulus], 253)
    return R.psum_points(R.pscalar_mul_bits(stack, bits), axis=0)


def commit_vec_dev(scalars_mont: jnp.ndarray, blind: int,
                   gens: MultiCommitGens) -> PointE:
    """MSM(scalars, G) + blind*h; scalars are a device FQ vector (n, 16)."""
    n = scalars_mont.shape[0]
    assert gens.n == n, (gens.n, n)
    bits = np.asarray(_demont_bits(scalars_mont))
    msm = R.psum_points(R.pscalar_mul_bits(gens.G, jnp.asarray(bits)), axis=0)
    if blind % FQ.modulus == 0:
        return msm
    from ..curve.weierstrass import scalars_to_bits
    hb = R.pscalar_mul_bits(PointE(*(c[None] for c in gens.h)),
                            scalars_to_bits([blind % FQ.modulus], 253))
    return R.padd(msm, PointE(*(c[0] for c in hb)))


def commit_vec_ints(scalars: List[int], blind: int, gens: MultiCommitGens) -> PointE:
    return commit_vec_dev(FQ.to_mont([s % FQ.modulus for s in scalars]), blind, gens)


def hyrax_commit(Z_mont: jnp.ndarray, blinds: List[int],
                 gens_n: MultiCommitGens) -> PointE:
    """Row commitments of Z viewed as an (L, R) matrix: one MSM per row,
    all rows batched into a single ladder (reference commit_inner)."""
    L = len(blinds)
    n = Z_mont.shape[0]
    Rsz = n // L
    assert L * Rsz == n and gens_n.n == Rsz
    bits = np.asarray(_demont_bits(Z_mont)).reshape(L, Rsz, -1)
    Gb = PointE(*(jnp.broadcast_to(c[None], (L, Rsz, 16)) for c in gens_n.G))
    rows = R.psum_points(R.pscalar_mul_bits(Gb, jnp.asarray(bits)), axis=1)  # (L,)
    from ..curve.weierstrass import scalars_to_bits
    hb = R.pscalar_mul_bits(PointE(*(jnp.broadcast_to(c, (L, 16)) for c in gens_n.h)),
                            scalars_to_bits([b % FQ.modulus for b in blinds], 253))
    return R.padd(rows, hb)


def msm_points(scalars: List[int], points: PointE) -> PointE:
    """Generic host-scalar MSM over a (n,) point batch (vartime MSM stand-in,
    reference group.rs:103-122)."""
    from ..curve.weierstrass import scalars_to_bits
    bits = scalars_to_bits([s % FQ.modulus for s in scalars], 253)
    return R.psum_points(R.pscalar_mul_bits(points, bits), axis=0)
