"""Deferred batched proof verification.

The reference verifier interleaves transcript replay with hundreds of
small group operations (per-round MSMs, decompressions, equality
checks).  On TPU each such op is a device dispatch, so we restructure:

  * transcript replay stays host-side (keccak C core) and drives the
    challenge stream exactly as the reference does;
  * every group EQUATION  sum_i s_i * P_i == identity  is deferred into a
    VerifyAccumulator instead of being checked inline;
  * at the end, all equations are combined with verifier-private random
    weights rho_j (standard batch-verification: if any single equation
    fails, the combined equation fails except with probability ~2^-253)
    and checked with ONE batched decompression + a handful of table MSMs.

Equation terms reference points three ways:
  (s, bytes)            -- a compressed proof point (batch-decoded once)
  (s, (gens, i))        -- generator i of a MultiCommitGens (i = -1: h)
  (s, RPoint)           -- an already-decoded point

This reduces verification from O(rounds * ops) dispatches to
O(rounds) transcript-commitment fusions + ~6 batched device calls.
"""

from __future__ import annotations

import secrets
from typing import List, Sequence, Tuple, Union

import numpy as np
import jax.numpy as jnp

from .field.prime_field import FQ, L_MODULUS as L
from .curve.ristretto import RISTRETTO, PointE
from .curve.rpoint import RPoint
from .curve.msm import host_digits, msm_oneshot

R = RISTRETTO

Term = Tuple[int, object]


def as_terms(x) -> List[Term]:
    """bytes | RPoint | term list -> term list."""
    if isinstance(x, (bytes, bytearray)):
        return [(1, bytes(x))]
    if isinstance(x, RPoint):
        return [(1, x)]
    return list(x)


def scale_terms(terms: Sequence[Term], k: int) -> List[Term]:
    k = k % L
    return [(s * k % L, ref) for s, ref in terms]


def neg_terms(terms: Sequence[Term]) -> List[Term]:
    return [((L - s) % L, ref) for s, ref in terms]


import functools


@functools.lru_cache(maxsize=16)
def _combine_kernel(k: int):
    import jax
    from .curve.weierstrass import scalars_to_bits  # noqa: F401

    def run(pts, bits):
        return R.encode(R.sum_points(R.scalar_mul_bits(pts, bits), axis=0))

    return jax.jit(run)


def combine_compress(points: Sequence[RPoint], scalars: Sequence[int]) -> bytes:
    """Materialize sum_i s_i * P_i as compressed bytes in ONE fused device
    call (used for verifier-computed points that must enter the
    transcript, e.g. per-round claim combinations)."""
    from .curve.rpoint import rpoint_stack
    from .curve.weierstrass import scalars_to_bits
    k = len(points)
    stack = rpoint_stack(points)
    bits = jnp.asarray(np.asarray(
        scalars_to_bits([s % L for s in scalars], 253)))
    limbs = np.asarray(_combine_kernel(k)(stack, bits))
    v = sum(int(limbs[i]) << (16 * i) for i in range(16))
    return v.to_bytes(32, "little")


class VerifyAccumulator:
    """Collects group equations; check() verifies them all at once."""

    def __init__(self):
        self.eqs: List[List[Term]] = []

    def add(self, *groups) -> None:
        """One equation: the concatenation of the term groups must sum to
        the identity point."""
        eq: List[Term] = []
        for g in groups:
            eq.extend(as_terms(g))
        self.eqs.append(eq)

    def check(self) -> bool:
        if not self.eqs:
            return True
        byte_coeff = {}
        gens_coeff = {}
        pt_terms: List[Tuple[int, RPoint]] = []
        for eq in self.eqs:
            rho = secrets.randbelow(L - 1) + 1
            for s, ref in eq:
                c = s * rho % L
                if c == 0:
                    continue
                if isinstance(ref, (bytes, bytearray)):
                    key = bytes(ref)
                    byte_coeff[key] = (byte_coeff.get(key, 0) + c) % L
                elif isinstance(ref, RPoint):
                    pt_terms.append((c, ref))
                else:
                    gens, idx = ref
                    d = gens_coeff.setdefault(id(gens), (gens, {}))[1]
                    d[idx] = (d.get(idx, 0) + c) % L

        partials: List[PointE] = []

        # 1. compressed proof points: one batched decode + one-shot MSM
        items = [(b, c) for b, c in byte_coeff.items() if c]
        if items:
            pts = R.decode_bytes([b for b, _ in items])
            partials.append(msm_oneshot(
                R, pts, jnp.asarray(host_digits([c for _, c in items]))))

        # 2. already-decoded points
        if pt_terms:
            from .curve.rpoint import rpoint_stack
            stack = rpoint_stack([p for _, p in pt_terms])
            partials.append(msm_oneshot(
                R, stack, jnp.asarray(host_digits([c for c, _ in pt_terms]))))

        # 3. generator vectors: cached digit tables
        for gens, d in gens_coeff.values():
            coeffs = np.zeros((gens.n,), dtype=object)
            h_coeff = 0
            for idx, c in d.items():
                if idx == -1:
                    h_coeff = c
                else:
                    coeffs[idx] = c
            if np.any(coeffs != 0):
                partials.append(gens.G_msm.msm(
                    jnp.asarray(host_digits(list(coeffs)))))
            if h_coeff:
                partials.append(gens.h_msm.msm(
                    jnp.asarray(host_digits([h_coeff]))))

        if not partials:
            return True          # every equation cancelled identically
        total = partials[0]
        for p in partials[1:]:
            total = R.padd(total, p)
        return bool(np.asarray(R.peq(total, R.identity(()))))
