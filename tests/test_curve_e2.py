"""Curve E2 device ops vs host ground truth (exact int arithmetic)."""

import random

import numpy as np
import jax

from vpin_tpu.curve.host_ec import (
    E2_G_HOST, E2_HOST, E2_ORDER, HostPoint, host_infinity,
)
from vpin_tpu.curve.weierstrass import E2, scalars_to_bits

RNG = random.Random(7)


def rand_host_points(n):
    return [RNG.randrange(1, E2_ORDER) * E2_G_HOST for _ in range(n)]


def test_host_ec_sanity():
    G = E2_G_HOST
    assert E2_HOST.is_on_curve(G)
    assert E2_HOST.is_on_curve(5 * G)
    assert (E2_ORDER * G).inf
    assert (2 * G) + (3 * G) == 5 * G
    assert G + (-G) == host_infinity()


def test_device_add_matches_host():
    n = 8
    Ps = rand_host_points(n)
    Qs = rand_host_points(n)
    dP = E2.from_affine_host(Ps)
    dQ = E2.from_affine_host(Qs)
    out = E2.to_affine_host(jax.jit(E2.add)(dP, dQ))
    for i in range(n):
        assert out[i] == Ps[i] + Qs[i]


def test_device_add_special_cases():
    G = E2_G_HOST
    INF = host_infinity()
    cases = [
        (G, G, 2 * G),              # doubling through the complete formula
        (G, INF, G),                # P + inf
        (INF, G, G),                # inf + P
        (INF, INF, INF),            # inf + inf
        (G, -G, INF),               # P + (-P)
        (2 * G, 2 * G, 4 * G),
        (3 * G, -3 * G, INF),
    ]
    dP = E2.from_affine_host([c[0] for c in cases])
    dQ = E2.from_affine_host([c[1] for c in cases])
    out = E2.to_affine_host(jax.jit(E2.add)(dP, dQ))
    for i, (_, _, want) in enumerate(cases):
        assert out[i] == want, f"case {i}"


def test_scalar_mul():
    ks = [0, 1, 2, 3, 7, RNG.randrange(E2_ORDER), E2_ORDER - 1, E2_ORDER]
    G_batch = E2.generator((len(ks),))
    bits = scalars_to_bits(ks, 253)
    out = E2.to_affine_host(jax.jit(E2.scalar_mul_bits)(G_batch, bits))
    for i, k in enumerate(ks):
        assert out[i] == k * E2_G_HOST, f"k={k}"


def test_scalar_mul_distinct_points():
    Ps = rand_host_points(4)
    ks = [RNG.randrange(2**64) for _ in range(4)]
    dP = E2.from_affine_host(Ps)
    out = E2.to_affine_host(E2.scalar_mul_host_scalars(dP, ks))
    for i in range(4):
        assert out[i] == ks[i] * Ps[i]


def test_sum_points():
    Ps = rand_host_points(5) + [host_infinity()]
    dP = E2.from_affine_host(Ps)
    out = E2.to_affine_host(jax.jit(E2.sum_points)(dP))
    want = host_infinity()
    for P in Ps:
        want = want + P
    assert out[()] == want


def test_affine_roundtrip_and_eq():
    Ps = rand_host_points(3) + [host_infinity()]
    dP = E2.from_affine_host(Ps)
    x, y, inf = E2.to_affine(dP)
    back = E2.from_affine(x, y, inf)
    assert list(np.asarray(E2.eq(dP, back))) == [True] * 4
    assert list(np.asarray(E2.is_infinity(dP))) == [False, False, False, True]


import pytest


@pytest.mark.slow
def test_fused_pallas_add_bit_identical():
    """pallas_ec fused add == jnp path, bit-for-bit, incl. infinity and
    doubling cases (interpret mode off-TPU)."""
    from vpin_tpu.curve.pallas_ec import ec_add_pallas

    n = 130
    Ps = rand_host_points(4) * 33
    Qs = rand_host_points(4) * 33
    Ps = Ps[:n]; Qs = Qs[:n]
    Ps[0] = host_infinity()
    Qs[1] = Ps[1]                       # doubling case
    dP = E2.from_affine_host(Ps)
    dQ = E2.from_affine_host(Qs)
    ref = E2._add_jnp(dP, dQ)
    fused = ec_add_pallas(E2, dP, dQ, interpret=True)
    for a, b in zip(ref, fused):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_fused_pallas_ladder_step_bit_identical():
    from vpin_tpu.curve.pallas_ec import ec_ladder_step_pallas

    Ps = rand_host_points(2) * 65
    Qs = rand_host_points(2) * 65
    dP = E2.from_affine_host(Ps)
    dQ = E2.from_affine_host(Qs)
    bits = np.asarray([i % 2 for i in range(130)], np.uint32)
    added = E2._add_jnp(dP, dQ)
    acc_ref = E2.select(bits == 1, added, dP)
    base_ref = E2._add_jnp(dQ, dQ)
    acc_f, base_f = ec_ladder_step_pallas(E2, dP, dQ, bits, interpret=True)
    for a, b in zip(list(acc_ref) + list(base_ref),
                    list(acc_f) + list(base_f)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
