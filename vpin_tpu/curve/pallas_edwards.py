"""Fused ristretto255 (Edwards) point addition as a Pallas TPU kernel.

Same design as pallas_ec.py but for the COMMITMENT curve: the
add-2008-hwcd-3 unified formula (a = -1) is 8 field muls + 8 add/subs;
fusing them into one VMEM-resident kernel removes the ~30 HBM
round-trips per add of the jnp path.  Every Pedersen/Hyrax commitment,
MSM digit-table build/fold/Horner pass, and bullet verification walks
through this add (reference MSM: Spartan/src/group.rs:103-122 via
curve25519-dalek's vartime Straus/Pippenger; commitments.rs:74-98).

Results are canonical limbs, bit-identical to the jnp path
(tests/test_ristretto.py cross-checks in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.prime_field import N_LIMBS, int_to_limbs
from .pallas_ec import TILE, _fadd, _fsub, _fmul


def _ed_add_rows(p1, p2, D2, N, NP, NC):
    """add-2008-hwcd-3 (a=-1) in rows layout; identical formula to
    RistrettoGroup.add, so outputs are bit-identical canonical limbs."""
    X1, Y1, Z1, T1 = p1
    X2, Y2, Z2, T2 = p2
    mul = lambda a, b: _fmul(a, b, N, NP, NC)       # noqa: E731
    add = lambda a, b: _fadd(a, b, NC)              # noqa: E731
    sub = lambda a, b: _fsub(a, b, N, NC)           # noqa: E731

    A_ = mul(sub(Y1, X1), sub(Y2, X2))
    B_ = mul(add(Y1, X1), add(Y2, X2))
    C_ = mul(T1, mul(D2, T2))
    Dd = mul(Z1, add(Z2, Z2))
    E_ = sub(B_, A_)
    Ff = sub(Dd, C_)
    G_ = add(Dd, C_)
    H_ = add(B_, A_)
    X3 = mul(E_, Ff)
    Y3 = mul(G_, H_)
    T3 = mul(E_, H_)
    Z3 = mul(Ff, G_)
    return X3, Y3, Z3, T3


def _consts(d2_ref, n_ref, nprime_ref, ncomp_ref, shape):
    c = lambda r: jnp.broadcast_to(r[:].reshape(N_LIMBS, 1), shape)  # noqa: E731
    return c(d2_ref), c(n_ref), c(nprime_ref), c(ncomp_ref)


def _ed_add_kernel(x1, y1, z1, t1, x2, y2, z2, t2,
                   d2_ref, n_ref, nprime_ref, ncomp_ref,
                   ox, oy, oz, ot):
    # (limb, batch) rows layout end-to-end: minor dim a lane multiple, so
    # XLA operand copies tile compactly (see pallas_ec.py)
    p1 = (x1[:], y1[:], z1[:], t1[:])
    p2 = (x2[:], y2[:], z2[:], t2[:])
    D2, N, NP, NC = _consts(d2_ref, n_ref, nprime_ref, ncomp_ref, p1[0].shape)
    X3, Y3, Z3, T3 = _ed_add_rows(p1, p2, D2, N, NP, NC)
    ox[:] = X3
    oy[:] = Y3
    oz[:] = Z3
    ot[:] = T3


def _ed_ladder_kernel(ax, ay, az, at, bx, by, bz, bt, bits,
                      d2_ref, n_ref, nprime_ref, ncomp_ref,
                      oax, oay, oaz, oat, obx, oby, obz, obt):
    acc = (ax[:], ay[:], az[:], at[:])
    base = (bx[:], by[:], bz[:], bt[:])
    D2, N, NP, NC = _consts(d2_ref, n_ref, nprime_ref, ncomp_ref,
                            acc[0].shape)
    added = _ed_add_rows(acc, base, D2, N, NP, NC)
    dbl = _ed_add_rows(base, base, D2, N, NP, NC)
    take = (bits[:] == 1)                      # bits block: (1, TILE)
    for o, a, b in zip((oax, oay, oaz, oat), added, acc):
        o[:] = jnp.where(take, a, b)
    for o, d in zip((obx, oby, obz, obt), dbl):
        o[:] = d


@functools.lru_cache(maxsize=None)
def _host_consts(modulus: int, nprime: int, d2_mont: int):
    return (int_to_limbs(d2_mont), int_to_limbs(modulus),
            int_to_limbs(nprime), int_to_limbs((1 << 256) - modulus))


@functools.lru_cache(maxsize=None)
def _ed_add_call(modulus: int, nprime: int, d2_mont: int, interpret: bool):
    consts = _host_consts(modulus, nprime, d2_mont)

    @jax.jit
    def run(*coords):
        n = coords[0].shape[1]
        grid = (n // TILE,)
        spec = pl.BlockSpec((N_LIMBS, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((N_LIMBS,), lambda i: (0,),
                             memory_space=pltpu.VMEM)
        out = jax.ShapeDtypeStruct((N_LIMBS, n), jnp.uint32)
        return pl.pallas_call(
            _ed_add_kernel,
            out_shape=(out,) * 4,
            grid=grid,
            in_specs=[spec] * 8 + [cspec] * 4,
            out_specs=(spec,) * 4,
            interpret=interpret,
        )(*coords, *consts)

    return run


@functools.lru_cache(maxsize=None)
def _ed_ladder_call(modulus: int, nprime: int, d2_mont: int, interpret: bool):
    consts = _host_consts(modulus, nprime, d2_mont)

    @jax.jit
    def run(*args):
        n = args[0].shape[1]
        grid = (n // TILE,)
        spec = pl.BlockSpec((N_LIMBS, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        # bits ride as (1, n): 1-D operands with partial blocks trip a
        # Mosaic/XLA layout mismatch when grid > 1 (see pallas_ec.py)
        args = args[:8] + (args[8].reshape(1, -1),)
        bspec = pl.BlockSpec((1, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((N_LIMBS,), lambda i: (0,),
                             memory_space=pltpu.VMEM)
        out = jax.ShapeDtypeStruct((N_LIMBS, n), jnp.uint32)
        return pl.pallas_call(
            _ed_ladder_kernel,
            out_shape=(out,) * 8,
            grid=grid,
            in_specs=[spec] * 8 + [bspec] + [cspec] * 4,
            out_specs=(spec,) * 8,
            interpret=interpret,
        )(*args, *consts)

    return run


def _group_key(group):
    F = group.F
    from .ristretto import D, P as _P
    d2_mont = 2 * D % _P * F.R % F.modulus
    return (F.modulus, F.nprime_int, d2_mont)


def _flatten_pad(arrs, shape):
    """-> list of (16, n_pad) rows-layout arrays + live count."""
    flat = []
    n = int(np.prod(shape, dtype=int)) if shape else 1
    n_pad = max(-(-n // TILE) * TILE, TILE)
    for t in arrs:
        t = jnp.broadcast_to(t, shape + (N_LIMBS,)).reshape(-1, N_LIMBS).T
        if n_pad != n:
            t = jnp.pad(t, ((0, 0), (0, n_pad - n)))
        flat.append(t)
    return flat, n


def ed_add_pallas(group, P, Q, interpret: bool | None = None):
    """Fused unified addition over a batch of ristretto points."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = jnp.broadcast_shapes(P.x.shape[:-1], Q.x.shape[:-1])
    flat, n = _flatten_pad(list(P) + list(Q), shape)
    outs = _ed_add_call(*_group_key(group), interpret)(*flat)
    return type(P)(*(t.T[:n].reshape(shape + (N_LIMBS,)) for t in outs))


def ed_ladder_step_pallas(group, acc, base, bit,
                          interpret: bool | None = None):
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
    outs = _ed_ladder_call(*_group_key(group), interpret)(*flat, bits)
    pts = [t.T[:n].reshape(shape + (N_LIMBS,)) for t in outs]
    return (type(acc)(*pts[:4]), type(acc)(*pts[4:]))
