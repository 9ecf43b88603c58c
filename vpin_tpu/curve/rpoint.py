"""Host-convenience wrapper for single ristretto255 points.

Sigma-protocol code (nizk layer) manipulates a handful of points at a
time; RPoint gives it dalek-like ergonomics while every operation still
runs through the batched padded device kernels.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax.numpy as jnp

from ..field.prime_field import FQ
from .ristretto import RISTRETTO, PointE
from .weierstrass import scalars_to_bits

R = RISTRETTO


class RPoint:
    __slots__ = ("p",)

    def __init__(self, p: PointE):
        assert p.x.shape == (16,)
        self.p = p

    # -- constructors ---------------------------------------------------

    @staticmethod
    def identity() -> "RPoint":
        return RPoint(R.identity(()))

    @staticmethod
    def basepoint() -> "RPoint":
        return RPoint(R.basepoint(()))

    @staticmethod
    def decompress(b: bytes) -> "RPoint":
        return RPoint(PointE(*(c[0] for c in R.decode_bytes([b]))))

    # -- ops ------------------------------------------------------------

    def __add__(self, other: "RPoint") -> "RPoint":
        return RPoint(R.padd(self.p, other.p))

    def __sub__(self, other: "RPoint") -> "RPoint":
        return RPoint(R.padd(self.p, R.pneg(other.p)))

    def __neg__(self) -> "RPoint":
        return RPoint(R.pneg(self.p))

    def mul(self, k: int) -> "RPoint":
        bits = scalars_to_bits([k % FQ.modulus], 253)[0]
        return RPoint(R.pscalar_mul_bits(self.p, bits))

    __mul__ = mul
    __rmul__ = mul

    def compress(self) -> bytes:
        return R.encode_bytes(self.p)[0]

    def __eq__(self, other) -> bool:
        return bool(np.asarray(R.peq(self.p, other.p)).all())

    def __hash__(self):
        return hash(self.compress())


def rpoint_stack(points: Sequence[RPoint]) -> PointE:
    return PointE(*(jnp.stack([q.p[i] for q in points], axis=0) for i in range(4)))


def msm_host(scalars: Sequence[int], points: Sequence[RPoint]) -> RPoint:
    """MSM over a host list of points (vartime MSM equivalent, reference
    Spartan/src/group.rs:103-122); one-shot windowed-table MSM."""
    assert len(scalars) == len(points)
    if not points:
        return RPoint.identity()
    from .msm import host_digits, msm_oneshot
    stack = rpoint_stack(points)
    out = msm_oneshot(R, stack, jnp.asarray(host_digits(list(scalars))))
    return RPoint(out)


def decompress_many(encs: Sequence[bytes]) -> List[RPoint]:
    pts = R.decode_bytes(list(encs))
    return [RPoint(PointE(*(c[i] for c in pts))) for i in range(len(encs))]


def compress_many(points: Sequence[RPoint]) -> List[bytes]:
    if not points:
        return []
    return R.encode_bytes(rpoint_stack(points))
