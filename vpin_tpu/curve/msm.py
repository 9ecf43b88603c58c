"""Windowed-table multi-scalar multiplication (MSM) on TPU.

TPU-native replacement for dalek's vartime (Straus/Pippenger) MSM as
used by Spartan for every Pedersen/Hyrax commitment and for bullet
verification (reference: Spartan/src/group.rs:103-122,
Spartan/src/commitments.rs:74-98, Spartan/src/dense_mlpoly.rs:160-191).

Instead of the 253-round double-and-add ladder (~506 full-width batched
group ops per MSM), scalars are split into W = ceil(253/c) windows of
c bits and each point gets a digit table

    S[d][i] = d * P_i            for d in [0, 2^c)

so the MSM collapses to, per window, a pure gather of table entries and
a log-depth batched tree-sum, followed by one Horner pass (c doublings
per window) over the W window sums:

    sum_i a_i * P_i = sum_w 2^{c*w} * ( sum_i S[digit_{w,i}][i] )

No data-dependent control flow anywhere: digits drive a static-shape
gather, so the whole MSM is one jitted kernel per (n, rows) shape.

Cost per MSM over n points (c = 8, W = 32):
    ladder:  ~506 batched point ops of width n
    here:    n*W tree adds + 253 narrow Horner ops (~16x less work),
             plus a one-time table build (2^c adds of width n) that is
             CACHED per base vector — Pedersen/Hyrax generator vectors
             are fixed, so the table amortizes across an entire proof.

The digit tables align with the field layout: 16-bit limbs split into
exactly two 8-bit digits, so digit extraction is two mask ops.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..field.prime_field import L_MODULUS

WINDOW_BITS = 8                      # c: one 16-bit limb = two digits
N_WINDOWS = 32                       # ceil(256/8); top windows of l are 0
N_BUCKETS = 1 << WINDOW_BITS


def limbs_to_digits(plain_limbs: jnp.ndarray) -> jnp.ndarray:
    """Plain (non-Montgomery) scalar limbs (..., 16) -> LSB-first base-256
    digit array (..., 32) int32."""
    lo = (plain_limbs & 0xFF).astype(jnp.int32)
    hi = ((plain_limbs >> 8) & 0xFF).astype(jnp.int32)
    return jnp.stack([lo, hi], axis=-1).reshape(plain_limbs.shape[:-1] + (32,))


def host_digits(ints) -> np.ndarray:
    """Host ints -> (n, 32) int32 digit array (scalars reduced mod l)."""
    out = np.zeros((len(ints), 32), dtype=np.int32)
    for i, v in enumerate(ints):
        v = int(v) % L_MODULUS
        for j in range(32):
            out[i, j] = (v >> (8 * j)) & 0xFF
    return out


@functools.lru_cache(maxsize=32)
def _table_kernel(group, n_pad: int):
    def chain(P):
        ident = group.identity((n_pad,))

        def body(acc, _):
            nxt = group.add(acc, P)
            return nxt, acc

        _, rows = jax.lax.scan(body, ident, None, length=N_BUCKETS)
        return rows                       # (2^c, n_pad): rows[d] = d * P

    return jax.jit(chain)


def build_table(group, P, n_pad: Optional[int] = None):
    """Digit table for a base-point batch P of shape (n,):
    returns PointE of shape (2^c, n_pad) with table[d, i] = d * P_i.
    Sequential chain of 2^c - 1 width-n adds (one-time per base set)."""
    cls = type(P)
    n = P.x.shape[0]
    n_pad = n_pad or n
    if n_pad != n:
        pad = group.identity((n_pad - n,))
        P = cls(*(jnp.concatenate([a, b], axis=0) for a, b in zip(P, pad)))
    return _table_kernel(group, n_pad)(P)


def _fold_sum(group, Q):
    """Tree-sum a point batch over its SECOND batch axis (power-of-two),
    shape-stable: one add inside a lax.scan over log2(n) strides (keeps
    the traced graph — and hence XLA compile time — tiny)."""
    n = Q.x.shape[1]
    if n == 1:
        return type(Q)(*(c[:, 0] for c in Q))
    return group.sum_points(Q, axis=1)


def _msm_body(group, table, digits, vary=()):
    """Traceable MSM over a digit table.

    table:  (2^c, n_pad) PointE
    digits: (rows, n_pad, 32) int32  (LSB-first windows)
    vary:   mesh axis names when tracing inside shard_map — the Horner
            scan carry must be marked varying over them (lax.pvary) or
            the carry-in (replicated identity) and carry-out (data-
            dependent accumulator) types mismatch
    -> (rows,) PointE

    Graph size is O(1) group adds: the window fold, the Horner doubling
    chain and the window scan are all lax loops over fixed-shape bodies.
    """
    cls = type(table)
    n_pad = table.x.shape[1]
    n_rows = digits.shape[0]
    dig_w = jnp.moveaxis(digits, -1, 0)              # (W, rows, n_pad)
    col = jnp.arange(n_pad)

    def window(carry, dig):
        gathered = cls(*(c[dig, col] for c in table))   # (rows, n_pad)
        return carry, _fold_sum(group, gathered)        # (rows,)

    _, Qw = jax.lax.scan(window, 0, dig_w)              # (W, rows)

    # Horner over windows, MSB first: acc = 2^c * acc + Q_w
    rev = cls(*(c[::-1] for c in Qw))

    def dbl(acc, _):
        return group.add(acc, acc), None

    def horner(acc, q):
        acc, _ = jax.lax.scan(dbl, acc, None, length=WINDOW_BITS)
        return group.add(acc, q), None

    acc0 = group.identity((n_rows,))
    if vary:
        acc0 = cls(*(jax.lax.pcast(c, tuple(vary), to="varying")
                     for c in acc0))
    acc, _ = jax.lax.scan(horner, acc0, rev)
    return acc


@functools.lru_cache(maxsize=32)
def _msm_kernel(group, n_pad: int, n_rows: int):
    return jax.jit(functools.partial(_msm_body, group))


#: bound on (rows * n_pad) per kernel call — the per-window gather
#: materializes that many points plus add temporaries
MSM_CHUNK_ELEMS = 1 << 19


def msm_digits(group, table, digits: jnp.ndarray):
    """MSM via a prebuilt digit table.

    digits: (rows, n, 32) or (n, 32) int32; n is padded up to the table
    width with zero digits (digit 0 -> identity row of the table).
    Rows shard over the active mesh (parallel/ops.py) when one is set,
    and stream in chunks so HBM peaks stay bounded.
    Returns PointE of shape (rows,) (or scalar shape for 2-D digits)."""
    squeeze = digits.ndim == 2
    if squeeze:
        digits = digits[None]
    rows, n, W = digits.shape
    assert W == N_WINDOWS
    n_pad = table.x.shape[1]
    if n != n_pad:
        digits = jnp.pad(digits, ((0, 0), (0, n_pad - n), (0, 0)))
    from ..parallel.ops import sharded_msm_digits
    out = sharded_msm_digits(group, table, digits)
    if out is None:
        rows_per = max(1, MSM_CHUNK_ELEMS // n_pad)
        rp = 1
        while rp * 2 <= rows_per:
            rp *= 2
        if rows <= rp:
            out = _msm_kernel(group, n_pad, rows)(table, digits)
        else:
            chunks = []
            for lo in range(0, rows, rp):
                hi = min(lo + rp, rows)
                chunks.append(_msm_kernel(group, n_pad, hi - lo)(
                    table, digits[lo:hi]))
            cls = type(table)
            out = cls(*(jnp.concatenate([c[i] for c in chunks], axis=0)
                        for i in range(len(chunks[0]))))
    return type(table)(*(c[0] for c in out)) if squeeze else out


def _pow2(n: int) -> int:
    m = 1
    while m < n:
        m *= 2
    return m


class FixedBaseMSM:
    """Cached digit tables for a fixed base-point vector (Pedersen gens)."""

    def __init__(self, group, P):
        self.group = group
        self.n = P.x.shape[0]
        self.n_pad = _pow2(max(self.n, 1))
        self.table = build_table(group, P, self.n_pad)

    def msm(self, digits: jnp.ndarray):
        return msm_digits(self.group, self.table, digits)


def msm_oneshot(group, P, digits: jnp.ndarray):
    """One-shot MSM over fresh points (table built inline, not cached).
    Still ~6x fewer group ops than the ladder for n >= 32."""
    n = P.x.shape[0]
    table = build_table(group, P, _pow2(max(n, 1)))
    return msm_digits(group, table, digits)
