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

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..field import FQ, PrimeField
from .host_ec import E2_A, E2_B, E2_P, E2_GX, E2_GY, E2_ORDER, E2_HOST, HostPoint
from .padded import PaddedOps


class PointW(NamedTuple):
    """A batch of projective Weierstrass points; each leaf (..., 16) uint32."""
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    @property
    def batch_shape(self):
        return self.x.shape[:-1]


class WeierstrassCurve(PaddedOps):
    """y^2 = x^3 + a x + b over a PrimeField, batched JAX ops."""

    def __init__(self, field: PrimeField, a: int, b: int, gx: int, gy: int, order: int):
        self.F = field
        self.a_int, self.b_int = a, b
        self.order = order
        # host numpy Montgomery constants: safe to close over in jit
        self.A = field.mont_limbs_np(a)
        self.B3 = field.mont_limbs_np(3 * b % field.modulus)
        self.gx_int, self.gy_int = gx, gy

    # -- cached jitted entry points -------------------------------------
    # Orchestration-level code (nn layers, BSGS, protocol drivers) calls
    # these so each (op, shape) pair compiles exactly once per process and
    # hits the persistent compilation cache across runs.

    @functools.cached_property
    def jadd(self):
        return jax.jit(self.add)

    @functools.cached_property
    def jneg(self):
        return jax.jit(self.neg)

    @functools.cached_property
    def jeq(self):
        return jax.jit(self.eq)

    @functools.cached_property
    def jselect(self):
        return jax.jit(self.select)

    @functools.cached_property
    def jto_affine(self):
        return jax.jit(self.to_affine)

    @functools.cached_property
    def jscalar_mul_bits(self):
        return jax.jit(self.scalar_mul_bits)

    @functools.cached_property
    def jsum_points(self):
        return jax.jit(self.sum_points, static_argnames=("axis",))

    # -- constructors ---------------------------------------------------

    def infinity(self, shape=()) -> PointW:
        F = self.F
        return PointW(F.zeros(shape), F.ones(shape), F.zeros(shape))

    identity = infinity

    def generator(self, shape=()) -> PointW:
        F = self.F
        gx = jnp.broadcast_to(F.mont_limbs_np(self.gx_int), tuple(shape) + (16,))
        gy = jnp.broadcast_to(F.mont_limbs_np(self.gy_int), tuple(shape) + (16,))
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
        x, y, inf = self.pto_affine(P)
        xs = self.F.from_mont(x).reshape(-1)
        ys = self.F.from_mont(y).reshape(-1)
        infs = np.asarray(inf).reshape(-1)
        out = np.empty(xs.shape, dtype=object)
        for i in range(xs.shape[0]):
            out[i] = HostPoint(E2_HOST, int(xs[i]), int(ys[i]), bool(infs[i]))
        return out.reshape(np.asarray(inf).shape)

    # -- core group law -------------------------------------------------

    def _mulmany(self, xs, ys):
        """One wide field-mul over a stacked leading axis; keeps the HLO
        graph small (compile time) and the VPU lanes full (runtime)."""
        shape = jnp.broadcast_shapes(*(x.shape for x in xs), *(y.shape for y in ys))
        s = self.F.mul(jnp.stack([jnp.broadcast_to(x, shape) for x in xs], 0),
                       jnp.stack([jnp.broadcast_to(y, shape) for y in ys], 0))
        return [s[i] for i in range(len(xs))]

    def add(self, P: PointW, Q: PointW) -> PointW:
        """Complete projective addition (RCB15 Alg. 1, general a); valid
        for every input pair.  Large batches dispatch to the fully fused
        Pallas kernel (pallas_ec.py: all 17 field muls in VMEM, one
        launch); the jnp path packs the muls into 4 stacked field-muls
        by dependency stage."""
        from ..field.prime_field import _pallas_wanted
        if _pallas_wanted():
            n = int(np.prod(jnp.broadcast_shapes(
                P.x.shape[:-1], Q.x.shape[:-1]), dtype=int))
            if n >= 128:
                from .pallas_ec import ec_add_pallas
                return ec_add_pallas(self, P, Q)
        return self._add_jnp(P, Q)

    def _add_jnp(self, P: PointW, Q: PointW) -> PointW:
        F = self.F
        shape = jnp.broadcast_shapes(P.x.shape, Q.x.shape)
        X1, Y1, Z1 = (jnp.broadcast_to(v, shape) for v in P)
        X2, Y2, Z2 = (jnp.broadcast_to(v, shape) for v in Q)
        a, b3 = self.A, self.B3

        # stage 0: operand sums (one stacked add)
        sa = F.add(jnp.stack([X1, X2, X1, X2, Y1, Y2]),
                   jnp.stack([Y1, Y2, Z1, Z2, Z1, Z2]))
        # stage 1: 6 products
        t0, t1, t2, sxy, sxz, syz = self._mulmany(
            [X1, Y1, Z1, sa[0], sa[2], sa[4]],
            [X2, Y2, Z2, sa[1], sa[3], sa[5]])
        t3 = F.sub(sxy, F.add(t0, t1))                 # X1Y2 + X2Y1
        t4 = F.sub(sxz, F.add(t0, t2))                 # X1Z2 + X2Z1
        t5 = F.sub(syz, F.add(t1, t2))                 # Y1Z2 + Y2Z1
        # stage 2: constant products
        at4, b3t2, at2, b3t4 = self._mulmany([a, b3, a, b3], [t4, t2, t2, t4])
        W = F.add(b3t2, at4)                           # b3*Z1Z2 + a*(X1Z2+X2Z1)
        U = F.sub(t1, W)
        V = F.add(t1, W)
        M = F.add(F.add(F.add(t0, t0), t0), at2)       # 3*X1X2 + a*Z1Z2
        # stage 3
        y3a, at0mat2 = self._mulmany([U, a], [V, F.sub(t0, at2)])
        S = F.add(b3t4, at0mat2)                       # a(X1X2-aZ1Z2) + b3(X1Z2+X2Z1)
        # stage 4
        MS, t5S, Ut3, t3M, t5V = self._mulmany(
            [M, t5, U, t3, t5], [S, S, t3, M, V])
        X3 = F.sub(Ut3, t5S)
        Y3 = F.add(y3a, MS)
        Z3 = F.add(t5V, t3M)
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
        # identity built from the input so it inherits sharding/varying axes
        zx = jnp.zeros_like(P.x)
        acc0 = PointW(zx, zx + self.F.R_dev, jnp.zeros_like(P.z))

        from ..field.prime_field import _pallas_wanted
        batch = int(np.prod(jnp.broadcast_shapes(
            P.x.shape[:-1], bits.shape[:-1]), dtype=int))
        if _pallas_wanted() and batch >= 128:
            # fused ladder step: acc+base, 2*base and the bit-select in
            # ONE kernel launch per bit
            from .pallas_ec import ec_ladder_step_pallas

            def body(carry, i):
                acc, base = carry
                bit = jnp.take(bits, i, axis=-1)
                return ec_ladder_step_pallas(self, acc, base, bit), None
        else:
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
        """Log-depth point sum along a batch axis.

        Shift-and-add reduction with a *fixed* array shape per level (the
        shift is a traced dynamic_slice into an infinity-padded copy), so
        the whole reduction is one small lax.scan body instead of
        log2(n) distinct inlined tree levels — tiny HLO graph, and the
        same pattern shards cleanly under pjit."""
        if axis != 0:
            P = PointW(*(jnp.moveaxis(t, axis, 0) for t in P))
        n = P.x.shape[0]
        if n == 1:
            return PointW(*(t[0] for t in P))
        levels = int(np.ceil(np.log2(n)))
        zx = jnp.zeros_like(P.x)
        pad = PointW(zx, zx + self.F.R_dev, jnp.zeros_like(P.z))
        strides = jnp.asarray([1 << t for t in range(levels)], jnp.int32)

        def body(acc, stride):
            padded = PointW(*(jnp.concatenate([t, q], axis=0)
                              for t, q in zip(acc, pad)))
            shifted = PointW(*(jax.lax.dynamic_slice_in_dim(t, stride, n, axis=0)
                               for t in padded))
            return self.add(acc, shifted), None

        acc, _ = jax.lax.scan(body, P, strides)
        return PointW(*(t[0] for t in acc))


def scalars_to_bits(scalars, n_bits: int) -> np.ndarray:
    """Host ints (object ndarray / nested lists) -> LSB-first uint32 bits."""
    arr = np.asarray(scalars, dtype=object)
    v = np.array([int(x) for x in arr.reshape(-1)], dtype=object)
    assert all(x >= 0 for x in v), "negative scalars must be pre-reduced mod group order"
    out = np.zeros((v.shape[0], n_bits), dtype=np.uint32)
    for j in range(n_bits):
        out[:, j] = (v & 1).astype(np.uint32)
        v = v >> 1
    assert all(x == 0 for x in v), "scalar wider than n_bits"
    return out.reshape(arr.shape + (n_bits,))


# Curve E2 over F_l (reference: src/convolution/Client.py:134-156).
E2 = WeierstrassCurve(FQ, E2_A, E2_B, E2_GX, E2_GY, E2_ORDER)
