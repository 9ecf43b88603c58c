"""Fused Montgomery multiplication as a Pallas TPU kernel.

The jnp path in prime_field.py expresses one field mul as ~50 HLO ops
(outer product, two skew reductions, three carry-lookahead passes); XLA
fuses most of it, but the (B, 16, 16) partial-product tensor and the
intermediate 32-limb vectors still round-trip through HBM for large
batches, and each op re-reads its inputs.  This kernel keeps the whole
pipeline — product, m = lo*N' mod R, +m*N, carry resolution, conditional
subtract — in VMEM for a tile of the batch, in a lanes-friendly
(limb, batch) layout:

  * batch on the 128-wide lane axis (TILE a multiple of 128),
  * limbs on the sublane axis (16 or 32 rows),
  * partial products via 16 unrolled shifted multiply-adds (each a
    (16, TILE) vector op) instead of a materialized (TILE, 16, 16) cube,
  * carries resolved with the same Kogge-Stone lookahead as the jnp
    path, vectorized across lanes.

Reference semantics: Spartan's 4x64 Montgomery multiply
(src/proof_generation/Spartan/src/scalar/ristretto255.rs:702-770),
rebuilt for 16x16-bit limbs.  Bit-for-bit equal to PrimeField.mul —
tests/test_field.py cross-checks the two paths.

Falls back to interpret mode off-TPU so the same code path is testable
on the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .prime_field import LIMB_BITS, LIMB_MASK, N_LIMBS, int_to_limbs

TILE = 512  # batch elements per grid step (lanes: 4 x 128)


def _carry_lookahead_rows(s):
    """Kogge-Stone carry resolution over the sublane (limb) axis.
    s: (K, T) uint32 with entries < 2^17 -> (digits (K, T), carry (T,))."""
    K = s.shape[0]
    d = s & LIMB_MASK
    G = s >> LIMB_BITS
    P = (d == LIMB_MASK).astype(jnp.uint32)
    dist = 1
    while dist < K:
        z = jnp.zeros((dist,) + s.shape[1:], jnp.uint32)
        Gs = jnp.concatenate([z, G[:-dist]], axis=0)
        Ps = jnp.concatenate([z, P[:-dist]], axis=0)
        G = G | (P & Gs)
        P = P & Ps
        dist *= 2
    carry_in = jnp.concatenate([jnp.zeros_like(G[:1]), G[:-1]], axis=0)
    # K-1 (not -1): negative indices lower to dynamic_slice, which the
    # Mosaic TPU backend does not implement.
    return (d + carry_in) & LIMB_MASK, G[K - 1]


def _resolve_rows(acc):
    """Relaxed (K, T) limbs (entries < 2^26) -> strict digits + final carry."""
    d = acc & LIMB_MASK
    c = acc >> LIMB_BITS
    # shift carries up one limb (pad+add keeps the kernel free of
    # scatter/update ops, which pallas can't take as captured constants)
    s = d + jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], axis=0)
    out, fc = _carry_lookahead_rows(s)
    return out, fc + c[c.shape[0] - 1]


def _mul_rows(a, b, out_limbs):
    """Schoolbook product of strict (16, T) limb arrays -> relaxed
    (out_limbs, T).  16 shifted multiply-adds; every op is (16, T)."""
    T = a.shape[1]
    acc = jnp.zeros((out_limbs, T), jnp.uint32)
    for i in range(N_LIMBS):
        prod = a[i][None, :] * b  # (16, T) full uint32 products
        lo = prod & LIMB_MASK
        hi = prod >> LIMB_BITS
        n_lo = min(N_LIMBS, out_limbs - i)
        if n_lo > 0:
            acc = acc + jnp.pad(lo[:n_lo],
                                ((i, out_limbs - i - n_lo), (0, 0)))
        n_hi = min(N_LIMBS, out_limbs - i - 1)
        if n_hi > 0:
            acc = acc + jnp.pad(hi[:n_hi],
                                ((i + 1, out_limbs - i - 1 - n_hi), (0, 0)))
        # entries stay < 2^21: each limb accumulates at most 32 terms
        # of < 2^16, so no interleaved normalization is needed.
    return acc


def _mont_mul_kernel(a_ref, b_ref, n_ref, nprime_ref, ncomp_ref, out_ref):
    # operands arrive as (16, TILE): limbs on sublanes, batch on lanes —
    # a (n, 16) minor dim would make XLA pad every operand copy 16->128
    # lanes (8x HBM per program temp; see pallas_ec.py)
    a = a_ref[:]
    b = b_ref[:]
    N = jnp.broadcast_to(n_ref[:].reshape(N_LIMBS, 1), a.shape)
    NP = jnp.broadcast_to(nprime_ref[:].reshape(N_LIMBS, 1), a.shape)
    NC = jnp.broadcast_to(ncomp_ref[:].reshape(N_LIMBS, 1), a.shape)

    P_rel = _mul_rows(a, b, 2 * N_LIMBS)            # (32, T) relaxed
    P, _ = _resolve_rows(P_rel)                     # strict, < N^2
    m_rel = _mul_rows(P[:N_LIMBS], NP, N_LIMBS)     # (16, T) mod R
    m, _ = _resolve_rows(m_rel)
    U = _mul_rows(m, N, 2 * N_LIMBS)                # (32, T)
    S, _ = _resolve_rows(P + U)
    hi = S[N_LIMBS:]                                # (16, T) in [0, 2N)
    t, carry = _carry_lookahead_rows(hi + NC)
    res = jnp.where((carry > 0)[None, :], t, hi)
    out_ref[:] = res


@functools.lru_cache(maxsize=None)
def _mont_mul_call(modulus: int, nprime: int, interpret: bool):
    # host numpy constants: safe to close over from any trace context
    # (jnp constants created here would leak tracers under an outer jit)
    n_host = int_to_limbs(modulus)
    np_host = int_to_limbs(nprime)
    nc_host = int_to_limbs((1 << 256) - modulus)

    @jax.jit
    def run(a, b):
        n = a.shape[1]
        grid = (n // TILE,)
        spec = pl.BlockSpec((N_LIMBS, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((N_LIMBS,), lambda i: (0,),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _mont_mul_kernel,
            out_shape=jax.ShapeDtypeStruct((N_LIMBS, n), jnp.uint32),
            grid=grid,
            in_specs=[spec, spec, cspec, cspec, cspec],
            out_specs=spec,
            interpret=interpret,
        )(a, b, n_host, np_host, nc_host)

    return run


def mont_mul_pallas(field, a, b, interpret: bool | None = None):
    """Montgomery product via the fused kernel.  a, b: (..., 16) uint32
    strict limbs in Montgomery form, broadcastable batch shapes; the
    batch is flattened, transposed to the (limb, batch) rows layout and
    padded to a TILE multiple."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape).reshape(-1, N_LIMBS).T
    b = jnp.broadcast_to(b, shape).reshape(-1, N_LIMBS).T
    n = a.shape[1]
    n_pad = -(-n // TILE) * TILE
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n))
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
    out = _mont_mul_call(field.modulus, field.nprime_int, interpret)(a, b)
    return out.T[:n].reshape(shape)
