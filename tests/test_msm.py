"""Windowed-table MSM vs the naive ladder — bit-for-bit equality.

The table MSM (curve/msm.py) replaces the 253-round ladder in every
Pedersen/Hyrax/bullet path; these tests pin its results to the
straightforward ladder formulation on random inputs.
"""

import random

import numpy as np
import jax.numpy as jnp

from vpin_tpu.field.prime_field import FQ, L_MODULUS as L
from vpin_tpu.curve.ristretto import RISTRETTO, PointE
from vpin_tpu.curve.weierstrass import scalars_to_bits
from vpin_tpu.curve.msm import host_digits, msm_oneshot
from vpin_tpu.commit.pedersen import (
    MultiCommitGens, commit_vec_ints, hyrax_commit,
)

R = RISTRETTO
RNG = random.Random(7)


def _random_points(n):
    ks = [RNG.randrange(1, L) for _ in range(n)]
    bits = scalars_to_bits(ks, 253)
    return R.pscalar_mul_bits(R.basepoint((n,)), bits)


def _ladder_msm(scalars, points):
    bits = scalars_to_bits([s % L for s in scalars], 253)
    return R.psum_points(R.pscalar_mul_bits(points, bits), axis=0)


def test_oneshot_msm_matches_ladder():
    n = 8
    pts = _random_points(n)
    scalars = [RNG.randrange(L) for _ in range(n - 2)] + [0, 1]
    want = _ladder_msm(scalars, pts)
    got = msm_oneshot(R, pts, jnp.asarray(host_digits(scalars)))
    assert bool(np.asarray(R.peq(want, got)))
    assert R.encode_bytes(want) == R.encode_bytes(got)


def test_fixed_base_commit_matches_ladder():
    gens = MultiCommitGens.new(8, b"test_msm_gens")
    scalars = [RNG.randrange(L) for _ in range(8)]
    blind = RNG.randrange(L)
    got = commit_vec_ints(scalars, blind, gens)   # host-backed RPoint
    stack = PointE(*(jnp.concatenate([c, h[None]], axis=0)
                     for c, h in zip(gens.G, gens.h)))
    want = _ladder_msm(scalars + [blind], stack)
    assert R.encode_bytes(want)[0] == got.compress()


def test_hyrax_rows_match_ladder():
    gens = MultiCommitGens.new(4, b"test_msm_hyrax")
    Lr, Rsz = 2, 4
    vals = [RNG.randrange(L) for _ in range(Lr * Rsz)]
    blinds = [RNG.randrange(L) for _ in range(Lr)]
    rows = hyrax_commit(FQ.to_mont(vals), blinds, gens)
    enc = R.encode_bytes(rows)
    for r in range(Lr):
        stack = PointE(*(jnp.concatenate([c, h[None]], axis=0)
                         for c, h in zip(gens.G, gens.h)))
        want = _ladder_msm(vals[r * Rsz:(r + 1) * Rsz] + [blinds[r]], stack)
        assert R.encode_bytes(want)[0] == enc[r]
