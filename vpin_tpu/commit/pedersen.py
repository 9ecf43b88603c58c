"""Pedersen commitments over ristretto255 — hybrid host/device backend.

Mirrors Spartan's commitments.rs exactly:
  * MultiCommitGens::new derives n+1 generators from
    SHAKE256(label || compressed ristretto basepoint) via the one-way map
    (reference: Spartan/src/commitments.rs:20-38) — derivation runs on
    the HOST (curve/host_ristretto.py), it is tiny and serial;
  * commit = MSM(scalars, G) + blind * h (commitments.rs:74-98);
  * the Hyrax row-commit (DensePolynomial::commit_inner,
    dense_mlpoly.rs:160-191): the rayon `par_iter` of the reference
    becomes device batching + mesh sharding for big witnesses, and plain
    host MSMs for small ones.

Backend policy (the TPU-first split): the serial protocol spine — round
commitments over 2-5 points, generator derivation — is host integer
arithmetic; table-scale MSMs (big Hyrax rows, SPARK commitments) run on
the device through curve/msm.py windowed digit tables, sharded over the
active mesh.  The crossover is HOST_MSM_MAX / HOST_WORK_MAX.
"""

from __future__ import annotations

import functools
import hashlib
import os
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..field.prime_field import FQ, int_to_limbs
from ..curve import host_ristretto as H
from ..curve.host_ristretto import HPoint
from ..curve.ristretto import (
    RISTRETTO, PointE, RISTRETTO_BASEPOINT_COMPRESSED,
)
from ..curve.rpoint import HOST_MSM_MAX, RPoint, pointe_from_host
from ..curve.msm import FixedBaseMSM, host_digits, limbs_to_digits, msm_oneshot

R = RISTRETTO

_ONE_PLAIN = int_to_limbs(1)   # host numpy: no device constant at lowering

#: total point-ops bound (rows * width) under which Hyrax row commits run
#: on the host instead of the device
HOST_WORK_MAX = int(os.environ.get("VPIN_HOST_WORK_MAX", "16384"))


@jax.jit
def digits_from_mont(scalars_mont: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-form scalar limbs (..., 16) -> base-256 digits (..., 32)."""
    plain = FQ.mul(scalars_mont, jnp.broadcast_to(_ONE_PLAIN, scalars_mont.shape))
    return limbs_to_digits(plain)


class MultiCommitGens:
    """n generators + blinding generator h.  Host points are primary;
    device views (G / h PointE, MSM digit tables) build lazily."""

    def __init__(self, n: int, Gh: List[HPoint], hh: HPoint):
        self.n = n
        self.Gh = Gh                    # host generators, len n
        self.hh = hh                    # host blinding generator
        self._G_dev = None
        self._h_dev = None
        self._G_msm = None
        self._h_msm = None

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def new(n: int, label: bytes) -> "MultiCommitGens":
        shake = hashlib.shake_256()
        shake.update(label)
        shake.update(RISTRETTO_BASEPOINT_COMPRESSED)
        stream = shake.digest(64 * (n + 1))
        pts = [H.from_uniform_bytes(stream[64 * i: 64 * (i + 1)])
               for i in range(n + 1)]
        return MultiCommitGens(n, pts[:n], pts[n])

    # -- device views ----------------------------------------------------

    @property
    def G(self) -> PointE:
        if self._G_dev is None:
            self._G_dev = pointe_from_host(self.Gh)
        return self._G_dev

    @property
    def h(self) -> PointE:
        if self._h_dev is None:
            self._h_dev = pointe_from_host([self.hh], squeeze=True)
        return self._h_dev

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

    @property
    def Gh_msm(self) -> FixedBaseMSM:
        """Fused [G..., h] table: Hyrax rows commit in ONE MSM kernel."""
        if getattr(self, "_Gh_msm", None) is None:
            self._Gh_msm = FixedBaseMSM(
                R, pointe_from_host(self.Gh + [self.hh]))
        return self._Gh_msm

    # -- host views --------------------------------------------------------

    def G_point(self, i: int) -> RPoint:
        return RPoint(self.Gh[i])

    @property
    def h_point(self) -> RPoint:
        return RPoint(self.hh)

    def split_at(self, mid: int) -> Tuple["MultiCommitGens", "MultiCommitGens"]:
        return (MultiCommitGens(mid, self.Gh[:mid], self.hh),
                MultiCommitGens(self.n - mid, self.Gh[mid:], self.hh))

    def scale(self, s: int) -> "MultiCommitGens":
        s = int(s) % FQ.modulus
        return MultiCommitGens(self.n, [g.mul(s) for g in self.Gh], self.hh)


def commit_scalar(x: int, blind: int, gens: MultiCommitGens) -> RPoint:
    """x*G[0] + blind*h for single host scalars."""
    assert gens.n == 1
    return RPoint(H.msm([int(x), int(blind)], [gens.Gh[0], gens.hh]))


def commit_vec_ints(scalars: List[int], blind: int,
                    gens: MultiCommitGens) -> RPoint:
    """<scalars, G> + blind*h over host scalars."""
    n = len(scalars)
    assert gens.n == n
    if n <= HOST_MSM_MAX:
        return RPoint(H.msm([int(s) for s in scalars] + [int(blind)],
                            gens.Gh + [gens.hh]))
    msm = gens.G_msm.msm(jnp.asarray(host_digits(scalars)))
    if blind % FQ.modulus:
        msm = R.padd(msm, gens.h_msm.msm(jnp.asarray(host_digits([blind]))))
    return RPoint.from_dev(msm)


def commit_vec_dev(scalars_mont: jnp.ndarray, blind: int,
                   gens: MultiCommitGens) -> PointE:
    """MSM(scalars, G) + blind*h; scalars are a device FQ vector (n, 16).
    Device path — used by table-scale callers."""
    n = scalars_mont.shape[0]
    assert gens.n == n, (gens.n, n)
    msm = gens.G_msm.msm(digits_from_mont(scalars_mont))
    if blind % FQ.modulus == 0:
        return msm
    hb = gens.h_msm.msm(jnp.asarray(host_digits([blind])))
    return R.padd(msm, hb)


def hyrax_commit_host(Z_ints: Sequence[int], blinds: List[int],
                      gens_n: MultiCommitGens) -> List[HPoint]:
    """Row commitments over host scalars (small witnesses)."""
    Lr = len(blinds)
    n = len(Z_ints)
    Rsz = n // Lr
    assert Lr * Rsz == n and gens_n.n == Rsz
    pts = gens_n.Gh + [gens_n.hh]
    return [H.msm([int(v) for v in Z_ints[i * Rsz:(i + 1) * Rsz]]
                  + [int(blinds[i])], pts)
            for i in range(Lr)]


#: bound on scalars converted to digits per chunk: the (rows, R, 32)
#: int32 digit temp pads 4x on TPU (32 -> 128 lanes), so one full-table
#: conversion at SPARK-encode scale (2^24+ scalars) would need 16+ GB
HYRAX_DIGIT_CHUNK = 1 << 19


def hyrax_commit(Z_mont: jnp.ndarray, blinds: List[int],
                 gens_n: MultiCommitGens) -> PointE:
    """Row commitments of Z viewed as an (L, R) matrix: one table-MSM per
    row, rows batched into device kernels (reference commit_inner),
    sharded over the active mesh, and STREAMED in row chunks so the
    digit-conversion temps stay bounded at any table size."""
    Lr = len(blinds)
    n = Z_mont.shape[0]
    Rsz = n // Lr
    assert Lr * Rsz == n and gens_n.n == Rsz
    bdig_all = np.asarray(host_digits(blinds))

    rp = 1
    while rp * 2 * Rsz <= HYRAX_DIGIT_CHUNK and rp * 2 <= Lr:
        rp *= 2
    if Lr <= rp:
        digits = digits_from_mont(Z_mont).reshape(Lr, Rsz, 32)
        bdig = jnp.asarray(bdig_all)[:, None, :]          # (L, 1, 32)
        return gens_n.Gh_msm.msm(jnp.concatenate([digits, bdig], axis=1))

    chunks = []
    for lo in range(0, Lr, rp):
        hi = min(lo + rp, Lr)
        digs = digits_from_mont(Z_mont[lo * Rsz:hi * Rsz]) \
            .reshape(hi - lo, Rsz, 32)
        bd = jnp.asarray(bdig_all[lo:hi])[:, None, :]
        chunks.append(gens_n.Gh_msm.msm(
            jnp.concatenate([digs, bd], axis=1)))
    return PointE(*(jnp.concatenate([c[i] for c in chunks], axis=0)
                    for i in range(4)))


def msm_points(scalars: List[int], points) -> PointE:
    """Generic host-scalar MSM over a device (n,) point batch (vartime MSM
    equivalent, reference group.rs:103-122); one-shot windowed table."""
    return msm_oneshot(R, points, jnp.asarray(host_digits(scalars)))
