"""Fused EC point addition (curve E2) as a single Pallas TPU kernel.

The RCB15 complete-addition formula is 17 field muls + ~20 add/subs; the
jnp path (weierstrass.py `add`) runs them as separate XLA/Pallas ops, so
every intermediate round-trips HBM and measured throughput sat ~12x
below what the Montgomery-mul kernel's own throughput supports
(artifacts/ROOFLINE.md).  This kernel keeps the ENTIRE addition — all
17 Montgomery products, the carry resolutions, and the projective
combination — in VMEM for a tile of the batch:

  * batch on the 128-wide lane axis (TILE a multiple of 128),
  * limbs on the sublane axis (16 or 32 rows),
  * field ops in the rows layout shared with field/pallas_mont.py.

A second entry point fuses one double-and-add LADDER STEP
(acc' = bit ? acc+base : acc; base' = 2*base — two fused additions plus
the select) so the scalar-mult scan body is exactly one kernel launch.

Reference semantics: the same complete addition the witness generators
and homomorphic layers use everywhere (reference point algebra:
src/cnn_networks/Server.py:268-323 via python-ecdsa); results are
canonical limbs, bit-identical to the jnp path (tests/test_curve_e2.py
cross-checks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.prime_field import LIMB_BITS, LIMB_MASK, N_LIMBS, int_to_limbs
from ..field.pallas_mont import (
    _carry_lookahead_rows, _mul_rows, _resolve_rows,
)

TILE = 512


def _cond_sub_rows(s, NC):
    """Reduce s in [0, 2N) to [0, N) (rows layout): add 2^256-N, keep on
    carry-out."""
    t, carry = _carry_lookahead_rows(s + NC)
    return jnp.where((carry > 0)[None, :], t, s)


def _fadd(a, b, NC):
    s, _ = _carry_lookahead_rows(a + b)   # a+b < 2N < 2^256: no carry out
    return _cond_sub_rows(s, NC)


def _fsub(a, b, N, NC):
    # a + N + (2^256-1 - b) + 1 == a - b + N (mod 2^256), value in (0, 2N)
    t = a + N + (jnp.uint32(LIMB_MASK) - b)
    one = jnp.concatenate(
        [jnp.ones((1,) + t.shape[1:], jnp.uint32),
         jnp.zeros((t.shape[0] - 1,) + t.shape[1:], jnp.uint32)], axis=0)
    s, _ = _resolve_rows(t + one)
    return _cond_sub_rows(s, NC)


def _fmul(a, b, N, NP, NC):
    """Full Montgomery product in rows layout (strict in, strict out)."""
    P_rel = _mul_rows(a, b, 2 * N_LIMBS)
    P, _ = _resolve_rows(P_rel)
    m_rel = _mul_rows(P[:N_LIMBS], NP, N_LIMBS)
    m, _ = _resolve_rows(m_rel)
    U = _mul_rows(m, N, 2 * N_LIMBS)
    S, _ = _resolve_rows(P + U)
    return _cond_sub_rows(S[N_LIMBS:], NC)


def _ec_add_rows(p1, p2, A, B3, N, NP, NC):
    """RCB15 complete projective addition in rows layout.

    p1/p2: (X, Y, Z) tuples of (16, T) strict Montgomery limbs.
    Identical formula to WeierstrassCurve.add, so outputs are
    bit-identical canonical limbs."""
    X1, Y1, Z1 = p1
    X2, Y2, Z2 = p2
    mul = lambda a, b: _fmul(a, b, N, NP, NC)       # noqa: E731
    add = lambda a, b: _fadd(a, b, NC)              # noqa: E731
    sub = lambda a, b: _fsub(a, b, N, NC)           # noqa: E731

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = sub(mul(add(X1, Y1), add(X2, Y2)), add(t0, t1))   # X1Y2+X2Y1
    t4 = sub(mul(add(X1, Z1), add(X2, Z2)), add(t0, t2))   # X1Z2+X2Z1
    t5 = sub(mul(add(Y1, Z1), add(Y2, Z2)), add(t1, t2))   # Y1Z2+Y2Z1

    at4 = mul(A, t4)
    b3t2 = mul(B3, t2)
    at2 = mul(A, t2)
    b3t4 = mul(B3, t4)
    W = add(b3t2, at4)
    U = sub(t1, W)
    V = add(t1, W)
    M = add(add(add(t0, t0), t0), at2)               # 3*X1X2 + a*Z1Z2

    y3a = mul(U, V)
    S = add(b3t4, mul(A, sub(t0, at2)))

    X3 = sub(mul(U, t3), mul(t5, S))
    Y3 = add(y3a, mul(M, S))
    Z3 = add(mul(t5, V), mul(t3, M))
    return X3, Y3, Z3


def _load_consts(a_ref, b3_ref, n_ref, nprime_ref, ncomp_ref, shape):
    c = lambda r: jnp.broadcast_to(r[:].reshape(N_LIMBS, 1), shape)  # noqa: E731
    return (c(a_ref), c(b3_ref), c(n_ref), c(nprime_ref), c(ncomp_ref))


def _ec_add_kernel(x1, y1, z1, x2, y2, z2,
                   a_ref, b3_ref, n_ref, nprime_ref, ncomp_ref,
                   ox, oy, oz):
    # operands arrive in (limb, batch) rows layout: minor dim a lane
    # multiple, so XLA's operand copies tile compactly (a (n, 16) minor
    # dim would pad 16 -> 128 lanes: 8x HBM expansion per temp)
    p1 = (x1[:], y1[:], z1[:])
    p2 = (x2[:], y2[:], z2[:])
    A, B3, N, NP, NC = _load_consts(a_ref, b3_ref, n_ref, nprime_ref,
                                    ncomp_ref, p1[0].shape)
    X3, Y3, Z3 = _ec_add_rows(p1, p2, A, B3, N, NP, NC)
    ox[:] = X3
    oy[:] = Y3
    oz[:] = Z3


def _ladder_step_kernel(ax, ay, az, bx, by, bz, bits,
                        a_ref, b3_ref, n_ref, nprime_ref, ncomp_ref,
                        oax, oay, oaz, obx, oby, obz):
    """One double-and-add step: acc' = bit ? acc+base : acc;
    base' = base+base.  Two fused additions, one launch."""
    acc = (ax[:], ay[:], az[:])
    base = (bx[:], by[:], bz[:])
    A, B3, N, NP, NC = _load_consts(a_ref, b3_ref, n_ref, nprime_ref,
                                    ncomp_ref, acc[0].shape)
    added = _ec_add_rows(acc, base, A, B3, N, NP, NC)
    dbl = _ec_add_rows(base, base, A, B3, N, NP, NC)
    take = (bits[:] == 1)                      # bits block: (1, TILE)
    oax[:] = jnp.where(take, added[0], acc[0])
    oay[:] = jnp.where(take, added[1], acc[1])
    oaz[:] = jnp.where(take, added[2], acc[2])
    obx[:] = dbl[0]
    oby[:] = dbl[1]
    obz[:] = dbl[2]


@functools.lru_cache(maxsize=None)
def _consts_host(modulus: int, nprime: int, a_mont: int, b3_mont: int):
    return (int_to_limbs(a_mont), int_to_limbs(b3_mont),
            int_to_limbs(modulus), int_to_limbs(nprime),
            int_to_limbs((1 << 256) - modulus))


@functools.lru_cache(maxsize=None)
def _ec_add_call(modulus: int, nprime: int, a_mont: int, b3_mont: int,
                 interpret: bool):
    consts = _consts_host(modulus, nprime, a_mont, b3_mont)

    @jax.jit
    def run(x1, y1, z1, x2, y2, z2):
        n = x1.shape[1]
        grid = (n // TILE,)
        spec = pl.BlockSpec((N_LIMBS, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((N_LIMBS,), lambda i: (0,),
                             memory_space=pltpu.VMEM)
        out = jax.ShapeDtypeStruct((N_LIMBS, n), jnp.uint32)
        return pl.pallas_call(
            _ec_add_kernel,
            out_shape=(out, out, out),
            grid=grid,
            in_specs=[spec] * 6 + [cspec] * 5,
            out_specs=(spec, spec, spec),
            interpret=interpret,
        )(x1, y1, z1, x2, y2, z2, *consts)

    return run


@functools.lru_cache(maxsize=None)
def _ladder_step_call(modulus: int, nprime: int, a_mont: int, b3_mont: int,
                      interpret: bool):
    consts = _consts_host(modulus, nprime, a_mont, b3_mont)

    @jax.jit
    def run(ax, ay, az, bx, by, bz, bits):
        n = ax.shape[1]
        grid = (n // TILE,)
        spec = pl.BlockSpec((N_LIMBS, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        # bits ride as (1, n): 1-D operands with partial blocks trip a
        # Mosaic/XLA layout mismatch (T(1024) vs T(512)) when grid > 1
        bits = bits.reshape(1, -1)
        bspec = pl.BlockSpec((1, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((N_LIMBS,), lambda i: (0,),
                             memory_space=pltpu.VMEM)
        out = jax.ShapeDtypeStruct((N_LIMBS, n), jnp.uint32)
        return pl.pallas_call(
            _ladder_step_kernel,
            out_shape=(out,) * 6,
            grid=grid,
            in_specs=[spec] * 6 + [bspec] + [cspec] * 5,
            out_specs=(spec,) * 6,
            interpret=interpret,
        )(ax, ay, az, bx, by, bz, bits, *consts)

    return run


def _curve_key(curve):
    F = curve.F
    a_mont = int(curve.a_int) * F.R % F.modulus
    b3_mont = 3 * int(curve.b_int) * F.R % F.modulus
    return (F.modulus, F.nprime_int, a_mont, b3_mont)


def _flatten_pad(arrs, shape):
    """-> list of (16, n_pad) rows-layout arrays + live count.  The
    transpose keeps every program temp compactly tiled (see kernel)."""
    flat = []
    n = int(np.prod(shape, dtype=int)) if shape else 1
    n_pad = max(-(-n // TILE) * TILE, TILE)
    for t in arrs:
        t = jnp.broadcast_to(t, shape + (N_LIMBS,)).reshape(-1, N_LIMBS).T
        if n_pad != n:
            t = jnp.pad(t, ((0, 0), (0, n_pad - n)))
        flat.append(t)
    return flat, n


def ec_add_pallas(curve, P, Q, interpret: bool | None = None):
    """Fused complete addition over a batch of E2 points."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = jnp.broadcast_shapes(P.x.shape[:-1], Q.x.shape[:-1])
    flat, n = _flatten_pad(list(P) + list(Q), shape)
    ox, oy, oz = _ec_add_call(*_curve_key(curve), interpret)(*flat)
    return type(P)(ox.T[:n].reshape(shape + (N_LIMBS,)),
                   oy.T[:n].reshape(shape + (N_LIMBS,)),
                   oz.T[:n].reshape(shape + (N_LIMBS,)))


def ec_ladder_step_pallas(curve, acc, base, bit, interpret: bool | None = None):
    """One fused double-and-add step over a batch.  bit: (...,) uint32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bit = jnp.asarray(bit, jnp.uint32)
    shape = jnp.broadcast_shapes(acc.x.shape[:-1], base.x.shape[:-1],
                                 bit.shape)
    flat, n = _flatten_pad(list(acc) + list(base), shape)
    bits = jnp.broadcast_to(bit, shape).reshape(-1)
    if flat[0].shape[1] != bits.shape[0]:
        bits = jnp.pad(bits, (0, flat[0].shape[1] - bits.shape[0]))
    outs = _ladder_step_call(*_curve_key(curve), interpret)(*flat, bits)
    pts = [t.T[:n].reshape(shape + (N_LIMBS,)) for t in outs]
    return (type(acc)(*pts[:3]), type(acc)(*pts[3:]))
