"""Batched short-Weierstrass group ops on TPU (curve E2).

TPU-native replacement for the reference's python-ecdsa point arithmetic
(reference hot loop: src/cnn_networks/Server.py:268-323 does interpreted
per-pixel Point algebra; here whole tensors of points move through
branch-free projective formulas on the VPU).

Uses the *complete* projective addition of Renes-Costello-Batina 2015
(Alg. 1, arbitrary a): one formula covers generic add, doubling, the
identity, and inverse pairs — no data-dependent control flow, so the
whole batch jits to straight-line vector code.  Points are (X:Y:Z)
with infinity = (0:1:0).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..field import FQ, PrimeField
from .host_ec import E2_A, E2_B, E2_P, E2_GX, E2_GY, E2_ORDER, E2_HOST, HostPoint


class PointW(NamedTuple):
    """A batch of projective Weierstrass points; each leaf (..., 16) uint32."""
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    @property
    def batch_shape(self):
        return self.x.shape[:-1]


class WeierstrassCurve:
    """y^2 = x^3 + a x + b over a PrimeField, batched JAX ops."""

    def __init__(self, field: PrimeField, a: int, b: int, gx: int, gy: int, order: int):
        self.F = field
        self.a_int, self.b_int = a, b
        self.order = order
        self.A = field.to_mont([a])[0]
        self.B3 = field.to_mont([3 * b % field.modulus])[0]
        self.gx_int, self.gy_int = gx, gy

    # -- constructors ---------------------------------------------------

    def infinity(self, shape=()) -> PointW:
        F = self.F
        return PointW(F.zeros(shape), F.ones(shape), F.zeros(shape))

    def generator(self, shape=()) -> PointW:
        F = self.F
        gx = jnp.broadcast_to(F.to_mont([self.gx_int])[0], tuple(shape) + (16,))
        gy = jnp.broadcast_to(F.to_mont([self.gy_int])[0], tuple(shape) + (16,))
        return PointW(gx, gy, F.ones(shape))

    def from_affine_host(self, pts) -> PointW:
        """Host list/array of HostPoint (or (x, y, inf) tuples) -> device batch."""
        flat = np.asarray(pts, dtype=object).reshape(-1)
        xs, ys, infs = [], [], []
        for P in flat:
            if isinstance(P, HostPoint):
                x, y, inf = P.x, P.y, P.inf
            else:
                x, y, inf = P
            xs.append(0 if inf else x)
            ys.append(1 if inf else y)
            infs.append(bool(inf))
        F = self.F
        shape = np.asarray(pts, dtype=object).shape
        X = F.to_mont(xs).reshape(shape + (16,))
        Y = F.to_mont(ys).reshape(shape + (16,))
        Z = jnp.where(np.asarray(infs).reshape(shape)[..., None],
                      F.zeros(shape), F.ones(shape))
        return PointW(X, Y, Z)

    def to_affine_host(self, P: PointW):
        """Device batch -> numpy object array of HostPoint."""
        x, y, inf = self.to_affine(P)
        xs = self.F.from_mont(x).reshape(-1)
        ys = self.F.from_mont(y).reshape(-1)
        infs = np.asarray(inf).reshape(-1)
        out = np.empty(xs.shape, dtype=object)
        for i in range(xs.shape[0]):
            out[i] = HostPoint(E2_HOST, int(xs[i]), int(ys[i]), bool(infs[i]))
        return out.reshape(np.asarray(inf).shape)

    # -- core group law -------------------------------------------------

    def add(self, P: PointW, Q: PointW) -> PointW:
        """Complete projective addition (RCB15 Alg. 1, general a).
        12M + 5 constant-muls; valid for every input pair."""
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        a, b3 = self.A, self.B3

        t0 = F.mul(X1, X2)
        t1 = F.mul(Y1, Y2)
        t2 = F.mul(Z1, Z2)
        t3 = F.mul(F.add(X1, Y1), F.add(X2, Y2))
        t3 = F.sub(t3, F.add(t0, t1))                       # X1Y2 + X2Y1
        t4 = F.mul(F.add(X1, Z1), F.add(X2, Z2))
        t4 = F.sub(t4, F.add(t0, t2))                       # X1Z2 + X2Z1
        t5 = F.mul(F.add(Y1, Z1), F.add(Y2, Z2))
        t5 = F.sub(t5, F.add(t1, t2))                       # Y1Z2 + Y2Z1
        Z3 = F.mul(a, t4)
        X3 = F.mul(b3, t2)
        Z3 = F.add(X3, Z3)                                  # b3*Z1Z2 + a*(X1Z2+X2Z1)
        X3 = F.sub(t1, Z3)
        Z3 = F.add(t1, Z3)
        Y3 = F.mul(X3, Z3)
        t1 = F.add(t0, t0)
        t1 = F.add(t1, t0)                                  # 3*X1X2
        t2 = F.mul(a, t2)                                   # a*Z1Z2
        t4 = F.mul(b3, t4)                                  # b3*(X1Z2+X2Z1)
        t1 = F.add(t1, t2)                                  # 3X1X2 + aZ1Z2
        t2 = F.sub(t0, t2)                                  # X1X2 - aZ1Z2
        t2 = F.mul(a, t2)
        t4 = F.add(t4, t2)
        t0 = F.mul(t1, t4)
        Y3 = F.add(Y3, t0)
        t0 = F.mul(t5, t4)
        X3 = F.mul(X3, t3)
        X3 = F.sub(X3, t0)
        t0 = F.mul(t3, t1)
        Z3 = F.mul(t5, Z3)
        Z3 = F.add(Z3, t0)
        return PointW(X3, Y3, Z3)

    def double(self, P: PointW) -> PointW:
        # Completeness of `add` covers P+P; a dedicated doubling formula is a
        # later micro-optimization (saves ~3M).
        return self.add(P, P)

    def neg(self, P: PointW) -> PointW:
        return PointW(P.x, self.F.neg(P.y), P.z)

    def select(self, mask, P: PointW, Q: PointW) -> PointW:
        F = self.F
        return PointW(F.select(mask, P.x, Q.x),
                      F.select(mask, P.y, Q.y),
                      F.select(mask, P.z, Q.z))

    def is_infinity(self, P: PointW):
        return self.F.is_zero(P.z)

    def eq(self, P: PointW, Q: PointW):
        """Projective equality: X1Z2==X2Z1 and Y1Z2==Y2Z1 (and inf matching)."""
        F = self.F
        both_inf = jnp.logical_and(self.is_infinity(P), self.is_infinity(Q))
        one_inf = jnp.logical_xor(self.is_infinity(P), self.is_infinity(Q))
        ex = F.eq(F.mul(P.x, Q.z), F.mul(Q.x, P.z))
        ey = F.eq(F.mul(P.y, Q.z), F.mul(Q.y, P.z))
        return jnp.where(both_inf, True,
                         jnp.where(one_inf, False, jnp.logical_and(ex, ey)))

    # -- conversions ----------------------------------------------------

    def to_affine(self, P: PointW):
        """-> (x, y, inf_mask); x,y in Montgomery form; (0, 0) at infinity."""
        F = self.F
        inf = self.is_infinity(P)
        zinv = F.inv(P.z)  # inv(0) = 0, so infinity maps to (0, 0)
        return F.mul(P.x, zinv), F.mul(P.y, zinv), inf

    def from_affine(self, x, y, inf=None) -> PointW:
        F = self.F
        shape = x.shape[:-1]
        if inf is None:
            return PointW(x, y, F.ones(shape))
        one = F.ones(shape)
        zero = F.zeros(shape)
        return PointW(F.select(inf, zero, x),
                      F.select(inf, one, y),
                      F.select(inf, zero, one))

    # -- scalar multiplication ------------------------------------------

    def scalar_mul_bits(self, P: PointW, bits) -> PointW:
        """[k]P where bits is (..., n_bits) uint32, LSB-first, broadcastable
        to P's batch shape.  Branch-free double-and-add via lax.scan."""
        bits = jnp.asarray(bits, jnp.uint32)
        n_bits = bits.shape[-1]
        acc0 = self.infinity(P.batch_shape)

        def body(carry, i):
            acc, base = carry
            bit = jnp.take(bits, i, axis=-1)
            added = self.add(acc, base)
            acc = self.select(bit == 1, added, acc)
            base = self.add(base, base)
            return (acc, base), None

        (acc, _), _ = jax.lax.scan(body, (acc0, P), jnp.arange(n_bits))
        return acc

    def scalar_mul_host_scalars(self, P: PointW, scalars, n_bits=None) -> PointW:
        """[k_i]P_i for host int scalars (list/array matching batch shape)."""
        arr = np.asarray(scalars, dtype=object)
        if n_bits is None:
            n_bits = max((int(v).bit_length() for v in arr.reshape(-1)), default=1)
            n_bits = max(n_bits, 1)
        bits = scalars_to_bits(arr, n_bits)
        return self.scalar_mul_bits(P, bits)

    # -- reductions -----------------------------------------------------

    def sum_points(self, P: PointW, axis: int = 0) -> PointW:
        """Tree-reduce point sum along a batch axis (log2(n) batched adds)."""
        if axis < 0:
            axis += P.x.ndim - 1
        n = P.x.shape[axis]
        # pad to a power of two with infinity
        m = 1
        while m < n:
            m *= 2
        if m != n:
            pad = self.infinity(P.x.shape[:axis] + (m - n,) + P.x.shape[axis + 1:-1])
            P = PointW(*(jnp.concatenate([p, q], axis=axis) for p, q in zip(P, pad)))
        while m > 1:
            half = m // 2
            lo = PointW(*(jax.lax.slice_in_dim(t, 0, half, axis=axis) for t in P))
            hi = PointW(*(jax.lax.slice_in_dim(t, half, m, axis=axis) for t in P))
            P = self.add(lo, hi)
            m = half
        return PointW(*(jnp.squeeze(t, axis=axis) for t in P))


def scalars_to_bits(scalars, n_bits: int) -> np.ndarray:
    """Host ints (object ndarray / nested lists) -> LSB-first uint32 bits."""
    arr = np.asarray(scalars, dtype=object)
    flat = arr.reshape(-1)
    out = np.zeros((flat.shape[0], n_bits), dtype=np.uint32)
    for i, v in enumerate(flat):
        v = int(v)
        assert v >= 0, "negative scalars must be pre-reduced mod group order"
        for j in range(n_bits):
            out[i, j] = (v >> j) & 1
        assert v >> n_bits == 0, "scalar wider than n_bits"
    return out.reshape(arr.shape + (n_bits,))


# Curve E2 over F_l (reference: src/convolution/Client.py:134-156).
E2 = WeierstrassCurve(FQ, E2_A, E2_B, E2_GX, E2_GY, E2_ORDER)
