"""Deferred batched proof verification.

The reference verifier interleaves transcript replay with hundreds of
small group operations (per-round MSMs, decompressions, equality
checks).  We restructure:

  * transcript replay stays host-side (keccak C core) and drives the
    challenge stream exactly as the reference does;
  * every group EQUATION  sum_i s_i * P_i == identity  is deferred into a
    VerifyAccumulator instead of being checked inline;
  * at the end, all equations are combined with verifier-private random
    weights rho_j (standard batch-verification: if any single equation
    fails, the combined equation fails except with probability ~2^-253)
    and checked with ONE MSM — host Straus/Pippenger below HOST_MSM_MAX
    points, device windowed tables above (curve/msm.py).

Equation terms reference points three ways:
  (s, bytes)            -- a compressed proof point (decoded once)
  (s, (gens, i))        -- generator i of a MultiCommitGens (i = -1: h)
  (s, RPoint)           -- an already-decoded point
"""

from __future__ import annotations

import secrets
from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from .field.prime_field import L_MODULUS as L
from .curve import host_ristretto as H
from .curve.rpoint import HOST_MSM_MAX, RPoint
from .curve.ristretto import RISTRETTO

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


def combine_compress(points: Sequence[RPoint], scalars: Sequence[int]) -> bytes:
    """Materialize sum_i s_i * P_i as compressed bytes (used for
    verifier-computed points that must enter the transcript, e.g.
    per-round claim combinations — always a handful of points)."""
    return H.msm([s % L for s in scalars], [p.h for p in points]).encode()


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

        # flatten everything into one (scalars, host points) MSM;
        # compressed proof points decode exactly once
        scalars: List[int] = []
        points: List[H.HPoint] = []
        for b, c in byte_coeff.items():
            if c:
                scalars.append(c)
                points.append(H.decode(b))
        for c, p in pt_terms:
            scalars.append(c)
            points.append(p.h)
        for gens, d in gens_coeff.values():
            for idx, c in d.items():
                if not c:
                    continue
                scalars.append(c)
                points.append(gens.hh if idx == -1 else gens.Gh[idx])

        if not points:
            return True          # every equation cancelled identically
        from .utils.hostonly import host_only
        if len(points) <= HOST_MSM_MAX or host_only():
            return H.msm(scalars, points).is_identity()
        from .curve.msm import host_digits, msm_oneshot
        from .curve.rpoint import pointe_from_host
        stack = pointe_from_host(points)
        total = msm_oneshot(R, stack, jnp.asarray(host_digits(scalars)))
        return bool(np.asarray(R.peq(total, R.identity(()))))
