"""Pedersen commitments over ristretto255, batched on TPU.

Mirrors Spartan's commitments.rs exactly:
  * MultiCommitGens::new derives n+1 generators from
    SHAKE256(label || compressed ristretto basepoint) via the one-way map
    (reference: Spartan/src/commitments.rs:20-38);
  * commit = MSM(scalars, G) + blind * h (commitments.rs:74-98);
  * the Hyrax row-commit (DensePolynomial::commit_inner,
    dense_mlpoly.rs:160-191) batches all rows into ONE windowed-table
    MSM kernel — the rayon `par_iter` of the reference is replaced by
    device batching (and sharded across a mesh by parallel/hyrax.py).

All MSMs run through curve/msm.py's windowed digit tables.  Generator
vectors are fixed per (label, n), so their tables are built once and
amortize across every commitment of a proof (~16x fewer group ops than
the former 253-round ladder).
"""

from __future__ import annotations

import functools
import hashlib
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..field.prime_field import FQ, int_to_limbs
from ..curve.ristretto import (
    RISTRETTO, PointE, RISTRETTO_BASEPOINT_COMPRESSED,
)
from ..curve.msm import FixedBaseMSM, host_digits, limbs_to_digits, msm_oneshot

R = RISTRETTO

_ONE_PLAIN = jnp.asarray(int_to_limbs(1))


@jax.jit
def digits_from_mont(scalars_mont: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-form scalar limbs (..., 16) -> base-256 digits (..., 32)."""
    plain = FQ.mul(scalars_mont, jnp.broadcast_to(_ONE_PLAIN, scalars_mont.shape))
    return limbs_to_digits(plain)


class MultiCommitGens:
    """n generators + blinding generator h."""

    def __init__(self, n: int, G: PointE, h: PointE):
        self.n = n
        self.G = G          # (n,) batch
        self.h = h          # () single
        self._G_msm = None
        self._h_msm = None

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

    @property
    def G_msm(self) -> FixedBaseMSM:
        if self._G_msm is None:
            self._G_msm = FixedBaseMSM(R, self.G)
        return self._G_msm

    @property
    def h_msm(self) -> FixedBaseMSM:
        if self._h_msm is None:
            self._h_msm = FixedBaseMSM(R, PointE(*(c[None] for c in self.h)))
        return self._h_msm

    def split_at(self, mid: int) -> Tuple["MultiCommitGens", "MultiCommitGens"]:
        g1 = PointE(*(c[:mid] for c in self.G))
        g2 = PointE(*(c[mid:] for c in self.G))
        return (MultiCommitGens(mid, g1, self.h),
                MultiCommitGens(self.n - mid, g2, self.h))

    def scale(self, s: int) -> "MultiCommitGens":
        from ..curve.weierstrass import scalars_to_bits
        bits = scalars_to_bits([s % FQ.modulus] * self.n, 253)
        return MultiCommitGens(self.n, R.pscalar_mul_bits(self.G, bits), self.h)


def _blind_term(blind: int, gens: MultiCommitGens) -> PointE:
    return gens.h_msm.msm(jnp.asarray(host_digits([blind])))


def commit_scalar(x: int, blind: int, gens: MultiCommitGens) -> PointE:
    """x*G[0] + blind*h for single host scalars."""
    assert gens.n == 1
    dig = jnp.asarray(host_digits([x, blind]))           # (2, 32)
    xg = gens.G_msm.msm(dig[:1])
    hb = gens.h_msm.msm(dig[1:])
    return R.padd(xg, hb)


def commit_vec_dev(scalars_mont: jnp.ndarray, blind: int,
                   gens: MultiCommitGens) -> PointE:
    """MSM(scalars, G) + blind*h; scalars are a device FQ vector (n, 16)."""
    n = scalars_mont.shape[0]
    assert gens.n == n, (gens.n, n)
    msm = gens.G_msm.msm(digits_from_mont(scalars_mont))
    if blind % FQ.modulus == 0:
        return msm
    return R.padd(msm, _blind_term(blind, gens))


def commit_vec_ints(scalars: List[int], blind: int, gens: MultiCommitGens) -> PointE:
    msm = gens.G_msm.msm(jnp.asarray(host_digits(scalars)))
    if blind % FQ.modulus == 0:
        return msm
    return R.padd(msm, _blind_term(blind, gens))


def hyrax_commit(Z_mont: jnp.ndarray, blinds: List[int],
                 gens_n: MultiCommitGens) -> PointE:
    """Row commitments of Z viewed as an (L, R) matrix: one table-MSM per
    row, all rows batched into a single kernel (reference commit_inner)."""
    Lr = len(blinds)
    n = Z_mont.shape[0]
    Rsz = n // Lr
    assert Lr * Rsz == n and gens_n.n == Rsz
    digits = digits_from_mont(Z_mont).reshape(Lr, Rsz, 32)
    rows = gens_n.G_msm.msm(digits)                       # (L,)
    hb = gens_n.h_msm.msm(jnp.asarray(host_digits(blinds))[:, None, :])  # (L,)
    return R.padd(rows, hb)


def msm_points(scalars: List[int], points: PointE) -> PointE:
    """Generic host-scalar MSM over a (n,) point batch (vartime MSM
    equivalent, reference group.rs:103-122); one-shot windowed table."""
    return msm_oneshot(R, points, jnp.asarray(host_digits(scalars)))
