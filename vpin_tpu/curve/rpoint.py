"""Single-point ristretto255 wrapper for the sigma-protocol layer.

RPoint is HOST-backed (curve/host_ristretto.py): the nizk layer touches a
handful of points per Fiat-Shamir step, strictly serially, so host ints
beat a device dispatch per op (and avoid per-shape XLA compiles).  Batch
lifting to the device (rpoint_stack / pointe_from_host) is zero-compute:
Montgomery conversion happens in host integers, the device just receives
limb arrays.  Large MSMs route back to the device via curve/msm.py.
"""

from __future__ import annotations

import os
from typing import List, Sequence

import numpy as np
import jax.numpy as jnp

from ..field.prime_field import FP, int_to_limbs
from . import host_ristretto as H
from .host_ristretto import HPoint
from .ristretto import RISTRETTO, P, PointE

R = RISTRETTO

#: MSMs at or below this many points run on the host; larger ones go to
#: the device windowed-table kernels (compile amortizes there).
HOST_MSM_MAX = int(os.environ.get("VPIN_HOST_MSM_MAX", "1024"))


class RPoint:
    __slots__ = ("h",)

    def __init__(self, h: HPoint):
        assert isinstance(h, HPoint)
        self.h = h

    # -- constructors ---------------------------------------------------

    @staticmethod
    def identity() -> "RPoint":
        return RPoint(H.identity())

    @staticmethod
    def basepoint() -> "RPoint":
        return RPoint(H.basepoint())

    @staticmethod
    def decompress(b: bytes) -> "RPoint":
        return RPoint(H.decode(bytes(b)))

    @staticmethod
    def from_dev(p: PointE) -> "RPoint":
        """Device single point -> host (one from_mont transfer)."""
        x, y, z, t = (int(FP.from_mont(c)) for c in p)
        return RPoint(HPoint(x, y, z, t))

    # -- ops ------------------------------------------------------------

    def __add__(self, other: "RPoint") -> "RPoint":
        return RPoint(self.h + other.h)

    def __sub__(self, other: "RPoint") -> "RPoint":
        return RPoint(self.h - other.h)

    def __neg__(self) -> "RPoint":
        return RPoint(-self.h)

    def mul(self, k: int) -> "RPoint":
        return RPoint(self.h.mul(int(k)))

    __mul__ = mul
    __rmul__ = mul

    def compress(self) -> bytes:
        return self.h.encode()

    @property
    def p(self) -> PointE:
        """Device view (single extended point, Montgomery limbs)."""
        return pointe_from_host([self.h], squeeze=True)

    def __eq__(self, other) -> bool:
        return self.h.eq(other.h)

    def __hash__(self):
        return hash(self.compress())


def _mont_limbs(v: int) -> np.ndarray:
    return int_to_limbs(v * FP.R % P)


def pointe_from_host(points: Sequence[HPoint], squeeze: bool = False) -> PointE:
    """Host points -> device PointE batch; Montgomery conversion runs in
    host integers so no device kernel is involved."""
    n = len(points)
    coords = np.zeros((4, n, 16), dtype=np.uint32)
    for i, q in enumerate(points):
        coords[0, i] = _mont_limbs(q.x % P)
        coords[1, i] = _mont_limbs(q.y % P)
        coords[2, i] = _mont_limbs(q.z % P)
        coords[3, i] = _mont_limbs(q.t % P)
    if squeeze:
        assert n == 1
        return PointE(*(jnp.asarray(coords[j, 0]) for j in range(4)))
    return PointE(*(jnp.asarray(coords[j]) for j in range(4)))


def rpoint_stack(points: Sequence[RPoint]) -> PointE:
    return pointe_from_host([q.h for q in points])


def msm_host(scalars: Sequence[int], points: Sequence[RPoint]) -> RPoint:
    """MSM over host points (vartime MSM equivalent, reference
    Spartan/src/group.rs:103-122).  Host Straus/Pippenger below
    HOST_MSM_MAX points, device windowed table above."""
    assert len(scalars) == len(points)
    if not points:
        return RPoint.identity()
    from ..utils.hostonly import host_only
    if len(points) <= HOST_MSM_MAX or host_only():
        return RPoint(H.msm(list(scalars), [q.h for q in points]))
    from .msm import host_digits, msm_oneshot
    stack = rpoint_stack(points)
    out = msm_oneshot(R, stack, jnp.asarray(host_digits(list(scalars))))
    return RPoint.from_dev(out)


def decompress_many(encs: Sequence[bytes]) -> List[RPoint]:
    return [RPoint(H.decode(bytes(e))) for e in encs]


def compress_many(points: Sequence[RPoint]) -> List[bytes]:
    return [q.compress() for q in points]
