"""Field-layer golden tests: JAX limb kernels vs exact Python ints.

Mirrors the role of Spartan's scalar unit tests
(reference: Spartan/src/scalar/ristretto255.rs tests) but generates the
ground truth with arbitrary-precision Python integers.
"""

import random

import numpy as np
import jax
import pytest

from vpin_tpu.field import FQ, FP, L_MODULUS, P_MODULUS, N_LIMBS


FIELDS = [(FQ, L_MODULUS), (FP, P_MODULUS)]
RNG = random.Random(0xC0FFEE)


def rand_ints(modulus, n):
    special = [0, 1, 2, modulus - 1, modulus - 2, (modulus - 1) // 2, 2**128, 2**252 % modulus]
    vals = special + [RNG.randrange(modulus) for _ in range(n - len(special))]
    return vals[:n]


@pytest.mark.parametrize("F,mod", FIELDS, ids=["Fl", "Fp"])
def test_roundtrip(F, mod):
    vals = rand_ints(mod, 16)
    dev = F.to_mont(vals)
    back = F.from_mont(dev)
    assert [int(x) for x in back] == vals


@pytest.mark.parametrize("F,mod", FIELDS, ids=["Fl", "Fp"])
def test_add_sub_neg(F, mod):
    a_int = rand_ints(mod, 32)
    b_int = list(reversed(rand_ints(mod, 32)))
    a, b = F.to_mont(a_int), F.to_mont(b_int)
    add = jax.jit(F.add)(a, b)
    sub = jax.jit(F.sub)(a, b)
    neg = jax.jit(F.neg)(a)
    assert list(F.from_mont(add)) == [(x + y) % mod for x, y in zip(a_int, b_int)]
    assert list(F.from_mont(sub)) == [(x - y) % mod for x, y in zip(a_int, b_int)]
    assert list(F.from_mont(neg)) == [(-x) % mod for x in a_int]


@pytest.mark.parametrize("F,mod", FIELDS, ids=["Fl", "Fp"])
def test_mul_square(F, mod):
    a_int = rand_ints(mod, 64)
    b_int = list(reversed(rand_ints(mod, 64)))
    a, b = F.to_mont(a_int), F.to_mont(b_int)
    mul = jax.jit(F.mul)(a, b)
    sq = jax.jit(F.square)(a)
    assert list(F.from_mont(mul)) == [(x * y) % mod for x, y in zip(a_int, b_int)]
    assert list(F.from_mont(sq)) == [(x * x) % mod for x in a_int]


@pytest.mark.parametrize("F,mod", FIELDS, ids=["Fl", "Fp"])
def test_mul_const(F, mod):
    a_int = rand_ints(mod, 16)
    a = F.to_mont(a_int)
    for k in [0, 1, 2, 3, 19, 0xFFFF, mod - 1]:
        out = jax.jit(lambda x: F.mul_const(x, k))(a)
        assert list(F.from_mont(out)) == [(x * k) % mod for x in a_int]


@pytest.mark.parametrize("F,mod", FIELDS, ids=["Fl", "Fp"])
def test_inv(F, mod):
    a_int = [x for x in rand_ints(mod, 12) if x != 0]
    a = F.to_mont(a_int)
    inv = jax.jit(F.inv)(a)
    assert list(F.from_mont(inv)) == [pow(x, -1, mod) for x in a_int]
    # inv(0) == 0, matching dalek's Scalar::invert convention
    z = jax.jit(F.inv)(F.zeros((1,)))
    assert int(F.from_mont(z)[0]) == 0


@pytest.mark.parametrize("F,mod", FIELDS, ids=["Fl", "Fp"])
def test_batched_shapes(F, mod):
    a_int = [[RNG.randrange(mod) for _ in range(3)] for _ in range(4)]
    b_int = [[RNG.randrange(mod) for _ in range(3)] for _ in range(4)]
    a, b = F.to_mont(a_int), F.to_mont(b_int)
    out = jax.jit(F.mul)(a, b)
    assert out.shape == (4, 3, N_LIMBS)
    got = F.from_mont(out)
    for i in range(4):
        for j in range(3):
            assert int(got[i][j]) == a_int[i][j] * b_int[i][j] % mod


@pytest.mark.parametrize("F,mod", FIELDS, ids=["Fl", "Fp"])
def test_select_eq_iszero(F, mod):
    a = F.to_mont([5, 7, 0])
    b = F.to_mont([5, 8, 1])
    assert list(np.asarray(F.eq(a, b))) == [True, False, False]
    assert list(np.asarray(F.is_zero(a))) == [False, False, True]
    sel = F.select(np.array([True, False, True]), a, b)
    assert [int(x) for x in F.from_mont(sel)] == [5, 8, 0]


def test_bytes_helpers():
    v = RNG.randrange(L_MODULUS)
    assert FQ.from_bytes(FQ.to_bytes(v)) == v
    wide = RNG.randrange(2**512).to_bytes(64, "little")
    assert FQ.from_bytes_wide(wide) == int.from_bytes(wide, "little") % L_MODULUS


@pytest.mark.parametrize("F,mod", FIELDS, ids=["Fl", "Fp"])
def test_pallas_mont_mul_matches_jnp(F, mod):
    """The fused Pallas kernel (interpret mode on CPU) must be bit-equal
    to the stock limb path, including the padded tail of a ragged batch."""
    from vpin_tpu.field.pallas_mont import mont_mul_pallas

    n = 300  # deliberately not a TILE multiple
    xs = [RNG.randrange(mod) for _ in range(n)]
    ys = [RNG.randrange(mod) for _ in range(n)]
    a, b = F.to_mont(xs), F.to_mont(ys)
    want = F.from_mont(F._mul_jnp(a, b))
    got = F.from_mont(mont_mul_pallas(F, a, b, interpret=True))
    assert [int(g) for g in got] == [int(w) for w in want]
    assert all(int(g) == x * y % mod for g, x, y in zip(got, xs, ys))
