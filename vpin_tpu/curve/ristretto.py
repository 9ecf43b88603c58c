"""ristretto255 group, batched on TPU (commitment curve of the SNARK).

TPU-native replacement for curve25519-dalek's RistrettoPoint as used by
Spartan (reference: Spartan/src/group.rs:6-8, commitments.rs:20-98):
extended-coordinate Edwards arithmetic over F_p (p = 2^255-19), RFC 9496
encode/decode and the Elligator-based one-way map (dalek's
from_uniform_bytes), all as batched branch-free JAX ops.

Two curves coexist in the system: E2 (encrypted inference + witness) and
ristretto255 (Pedersen/Hyrax commitments) — see SURVEY.md section 2.5.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..field.prime_field import FP, P_MODULUS, int_to_limbs
from .padded import PaddedOps

P = P_MODULUS

# --- host-side ristretto255 constants (all derived, then cross-checked
#     against the RFC 9496 values in tests) ---
D = (-121665 * pow(121666, -1, P)) % P
SQRT_M1 = pow(2, (P - 1) // 4, P)
if SQRT_M1 % 2 == 1:
    SQRT_M1 = P - SQRT_M1          # RFC convention: constants are even ("abs")


def _sqrt_even(v: int) -> int:
    """Even square root of v mod p (p = 5 mod 8), or raise."""
    r = pow(v, (P + 3) // 8, P)
    if r * r % P != v % P:
        r = r * SQRT_M1 % P
    if r * r % P != v % P:
        raise ValueError("not a square")
    return r if r % 2 == 0 else P - r


ONE_MINUS_D_SQ = (1 - D * D) % P
D_MINUS_ONE_SQ = (D - 1) * (D - 1) % P
# sqrt(a*d - 1) with a = -1.  dalek/RFC 9496 fix the ODD root here (unlike
# the other constants): 2506...235, so flip the even root.
SQRT_AD_MINUS_ONE = P - _sqrt_even((-1 * D - 1) % P)
INVSQRT_A_MINUS_D = pow(_sqrt_even((-1 - D) % P), -1, P)  # 1/sqrt(a - d)
if INVSQRT_A_MINUS_D % 2 == 1:
    INVSQRT_A_MINUS_D = P - INVSQRT_A_MINUS_D

# ed25519 basepoint
BASE_Y = 4 * pow(5, -1, P) % P
BASE_X = 15112221349535400772501151409588531511454012693041857206046113283949847762202
RISTRETTO_BASEPOINT_COMPRESSED = bytes.fromhex(
    "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76")


class PointE(NamedTuple):
    """Batch of extended-coordinate Edwards points (X:Y:Z:T), T = XY/Z."""
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    t: jnp.ndarray

    @property
    def batch_shape(self):
        return self.x.shape[:-1]


def _c(v: int):
    """Host int -> Montgomery constant (16,) as a HOST numpy array (safe
    to close over in jitted code: no device round trip at lowering)."""
    return int_to_limbs(v * FP.R % P)


class RistrettoGroup(PaddedOps):
    F = FP

    def __init__(self):
        self.D2 = _c(2 * D % P)
        self.Dc = _c(D)
        self.SQRT_M1c = _c(SQRT_M1)
        self.ONE_MINUS_D_SQc = _c(ONE_MINUS_D_SQ)
        self.D_MINUS_ONE_SQc = _c(D_MINUS_ONE_SQ)
        self.SQRT_AD_MINUS_ONEc = _c(SQRT_AD_MINUS_ONE)
        self.INVSQRT_A_MINUS_Dc = _c(INVSQRT_A_MINUS_D)
        self._sqrt_exp_bits = tuple(int(b) for b in bin((P - 5) // 8)[2:])

    # -- constructors ---------------------------------------------------

    def identity(self, shape=()) -> PointE:
        F = self.F
        return PointE(F.zeros(shape), F.ones(shape), F.ones(shape), F.zeros(shape))

    def basepoint(self, shape=()) -> PointE:
        F = self.F
        bx = jnp.broadcast_to(_c(BASE_X), tuple(shape) + (16,))
        by = jnp.broadcast_to(_c(BASE_Y), tuple(shape) + (16,))
        bt = jnp.broadcast_to(_c(BASE_X * BASE_Y % P), tuple(shape) + (16,))
        return PointE(bx, by, F.ones(shape), bt)

    def from_host_xy(self, xs, ys) -> PointE:
        F = self.F
        x = F.to_mont(list(xs))
        y = F.to_mont(list(ys))
        t = F.to_mont([int(a) * int(b) % P for a, b in zip(xs, ys)])
        return PointE(x, y, F.ones((len(list(xs)),)), t)

    # -- group law (unified a=-1 extended formulas; complete) -----------

    def _mulmany(self, xs, ys):
        shape = jnp.broadcast_shapes(*(x.shape for x in xs), *(y.shape for y in ys))
        s = self.F.mul(jnp.stack([jnp.broadcast_to(x, shape) for x in xs], 0),
                       jnp.stack([jnp.broadcast_to(y, shape) for y in ys], 0))
        return [s[i] for i in range(len(xs))]

    def add(self, Pp: PointE, Q: PointE) -> PointE:
        from ..field.prime_field import _pallas_wanted
        if _pallas_wanted():
            n = int(np.prod(jnp.broadcast_shapes(
                Pp.x.shape[:-1], Q.x.shape[:-1]), dtype=int))
            if n >= 128:
                from .pallas_edwards import ed_add_pallas
                return ed_add_pallas(self, Pp, Q)
        return self._add_jnp(Pp, Q)

    def _add_jnp(self, Pp: PointE, Q: PointE) -> PointE:
        F = self.F
        shape = jnp.broadcast_shapes(Pp.x.shape, Q.x.shape)
        X1, Y1, Z1, T1 = (jnp.broadcast_to(v, shape) for v in Pp)
        X2, Y2, Z2, T2 = (jnp.broadcast_to(v, shape) for v in Q)
        # add-2008-hwcd-3 (a = -1): complete on the prime-order quotient
        A_, B_, C_, Dd = self._mulmany(
            [F.sub(Y1, X1), F.add(Y1, X1), T1, Z1],
            [F.sub(Y2, X2), F.add(Y2, X2), F.mul(self.D2, T2), F.add(Z2, Z2)])
        E_ = F.sub(B_, A_)
        Ff = F.sub(Dd, C_)
        G_ = F.add(Dd, C_)
        H_ = F.add(B_, A_)
        X3, Y3, T3, Z3 = self._mulmany([E_, G_, E_, Ff], [Ff, H_, H_, G_])
        return PointE(X3, Y3, Z3, T3)

    def double(self, Pp: PointE) -> PointE:
        return self.add(Pp, Pp)

    def neg(self, Pp: PointE) -> PointE:
        F = self.F
        return PointE(F.neg(Pp.x), Pp.y, Pp.z, F.neg(Pp.t))

    def select(self, mask, a: PointE, b: PointE) -> PointE:
        F = self.F
        return PointE(*(F.select(mask, x, y) for x, y in zip(a, b)))

    def eq(self, Pp: PointE, Q: PointE):
        """Ristretto equality (mod torsion): X1Y2==Y1X2 or X1X2==Y1Y2."""
        F = self.F
        x1y2, y1x2, x1x2, y1y2 = self._mulmany(
            [Pp.x, Pp.y, Pp.x, Pp.y], [Q.y, Q.x, Q.x, Q.y])
        return jnp.logical_or(F.eq(x1y2, y1x2), F.eq(x1x2, y1y2))

    # -- scalar mult / reductions (same shapes as the E2 module) --------

    def scalar_mul_bits(self, Pp: PointE, bits) -> PointE:
        bits = jnp.asarray(bits, jnp.uint32)
        zx = jnp.zeros_like(Pp.x)
        one = zx + self.F.R_dev
        acc0 = PointE(zx, one, one, jnp.zeros_like(Pp.t))

        from ..field.prime_field import _pallas_wanted
        batch = int(np.prod(jnp.broadcast_shapes(
            Pp.x.shape[:-1], bits.shape[:-1]), dtype=int))
        if _pallas_wanted() and batch >= 128:
            from .pallas_edwards import ed_ladder_step_pallas

            def body(carry, i):
                acc, base = carry
                bit = jnp.take(bits, i, axis=-1)
                return ed_ladder_step_pallas(self, acc, base, bit), None
        else:
            def body(carry, i):
                acc, base = carry
                bit = jnp.take(bits, i, axis=-1)
                acc = self.select(bit == 1, self.add(acc, base), acc)
                base = self.add(base, base)
                return (acc, base), None

        (acc, _), _ = jax.lax.scan(body, (acc0, Pp), jnp.arange(bits.shape[-1]))
        return acc

    def sum_points(self, Pp: PointE, axis: int = 0) -> PointE:
        if axis != 0:
            Pp = PointE(*(jnp.moveaxis(c, axis, 0) for c in Pp))
        n = Pp.x.shape[0]
        if n == 1:
            return PointE(*(c[0] for c in Pp))
        levels = int(np.ceil(np.log2(n)))
        zx = jnp.zeros_like(Pp.x)
        one = zx + self.F.R_dev
        pad = PointE(zx, one, one, jnp.zeros_like(Pp.t))
        strides = jnp.asarray([1 << i for i in range(levels)], jnp.int32)

        def body(acc, stride):
            padded = PointE(*(jnp.concatenate([c, q], axis=0)
                              for c, q in zip(acc, pad)))
            shifted = PointE(*(jax.lax.dynamic_slice_in_dim(c, stride, n, axis=0)
                               for c in padded))
            return self.add(acc, shifted), None

        acc, _ = jax.lax.scan(body, Pp, strides)
        return PointE(*(c[0] for c in acc))

    def msm_bits(self, Pp: PointE, bits) -> PointE:
        """sum_i bits_i * P_i over the leading batch axis."""
        return self.sum_points(self.scalar_mul_bits(Pp, bits), axis=0)

    # -- field square roots ---------------------------------------------

    def _sqrt_ratio_m1(self, u, v):
        """RFC 9496 SQRT_RATIO_M1: (was_square, +/-sqrt(u/v) abs'd)."""
        F = self.F
        v2 = F.square(v)
        v3 = F.mul(v2, v)
        v7 = F.mul(F.square(v3), v)
        r = F.mul(F.mul(u, v3), F.pow_bits(F.mul(u, v7), self._sqrt_exp_bits))
        check = F.mul(v, F.square(r))
        neg_u = F.neg(u)
        correct = F.eq(check, u)
        flipped = F.eq(check, neg_u)
        flipped_i = F.eq(check, F.mul(neg_u, jnp.broadcast_to(self.SQRT_M1c, u.shape)))
        r_prime = F.mul(r, jnp.broadcast_to(self.SQRT_M1c, u.shape))
        r = F.select(jnp.logical_or(flipped, flipped_i), r_prime, r)
        r = self._ct_abs(r)
        return jnp.logical_or(correct, flipped), r

    def _parity(self, a):
        """LSB of the canonical (non-Montgomery) value: 'is negative'."""
        canon = self.F.mul(a, jnp.broadcast_to(
            jnp.asarray(int_to_limbs(1)), a.shape))
        return (canon[..., 0] & 1) == 1

    def _ct_abs(self, a):
        return self.F.select(self._parity(a), self.F.neg(a), a)

    # -- ristretto encode / decode / one-way map ------------------------

    def encode(self, Pp: PointE) -> jnp.ndarray:
        """-> canonical 32-byte encodings as a uint32 limb array (..., 16)
        of the canonical s value (use limbs_to_bytes to get bytes)."""
        F = self.F
        x0, y0, z0, t0 = Pp
        u1 = F.mul(F.add(z0, y0), F.sub(z0, y0))
        u2 = F.mul(x0, y0)
        _, invsqrt = self._sqrt_ratio_m1(F.ones(u1.shape[:-1]),
                                         F.mul(u1, F.square(u2)))
        den1 = F.mul(invsqrt, u1)
        den2 = F.mul(invsqrt, u2)
        z_inv = F.mul(F.mul(den1, den2), t0)
        ix0 = F.mul(x0, jnp.broadcast_to(self.SQRT_M1c, x0.shape))
        iy0 = F.mul(y0, jnp.broadcast_to(self.SQRT_M1c, y0.shape))
        enchanted = F.mul(den1, jnp.broadcast_to(self.INVSQRT_A_MINUS_Dc, den1.shape))
        rotate = self._parity(F.mul(t0, z_inv))
        x = F.select(rotate, iy0, x0)
        y = F.select(rotate, ix0, y0)
        den_inv = F.select(rotate, enchanted, den2)
        y = F.select(self._parity(F.mul(x, z_inv)), F.neg(y), y)
        s = self._ct_abs(F.mul(den_inv, F.sub(z0, y)))
        # canonical limbs
        return F.mul(s, jnp.broadcast_to(jnp.asarray(int_to_limbs(1)), s.shape))

    def decode(self, s_canonical_limbs) -> Tuple[PointE, jnp.ndarray]:
        """Canonical-value limb array (..., 16) -> (points, valid_mask).
        Canonicity/range checks are the caller's job (host-side ints)."""
        F = self.F
        s = F.mul(s_canonical_limbs, jnp.broadcast_to(F.R2_dev, s_canonical_limbs.shape))  # to Montgomery
        one = F.ones(s.shape[:-1])
        ss = F.square(s)
        u1 = F.sub(one, ss)
        u2 = F.add(one, ss)
        u2_sqr = F.square(u2)
        du1sq = F.mul(jnp.broadcast_to(self.Dc, s.shape), F.square(u1))
        v = F.sub(F.neg(du1sq), u2_sqr)
        was_square, invsqrt = self._sqrt_ratio_m1(one, F.mul(v, u2_sqr))
        den_x = F.mul(invsqrt, u2)
        den_y = F.mul(F.mul(invsqrt, den_x), v)
        x = self._ct_abs(F.mul(F.add(s, s), den_x))
        y = F.mul(u1, den_y)
        t = F.mul(x, y)
        valid = jnp.logical_and(
            was_square,
            jnp.logical_and(jnp.logical_not(self._parity(t)),
                            jnp.logical_not(F.is_zero(y))))
        return PointE(x, y, F.ones(s.shape[:-1]), t), valid

    def elligator_map(self, r0) -> PointE:
        """RFC 9496 MAP: field element (Montgomery limbs) -> point."""
        F = self.F
        one = F.ones(r0.shape[:-1])
        r = F.mul(jnp.broadcast_to(self.SQRT_M1c, r0.shape), F.square(r0))
        u = F.mul(F.add(r, one), jnp.broadcast_to(self.ONE_MINUS_D_SQc, r0.shape))
        Dc = jnp.broadcast_to(self.Dc, r0.shape)
        v = F.mul(F.sub(F.neg(one), F.mul(r, Dc)), F.add(r, Dc))
        was_square, s = self._sqrt_ratio_m1(u, v)
        s_prime = F.neg(self._ct_abs(F.mul(s, r0)))
        s = F.select(was_square, s, s_prime)
        c = F.select(was_square, F.neg(one), r)
        N = F.sub(F.mul(F.mul(c, F.sub(r, one)),
                        jnp.broadcast_to(self.D_MINUS_ONE_SQc, r0.shape)), v)
        w0 = F.mul(F.add(s, s), v)
        w1 = F.mul(N, jnp.broadcast_to(self.SQRT_AD_MINUS_ONEc, r0.shape))
        w2 = F.sub(one, F.square(s))
        w3 = F.add(one, F.square(s))
        X, Y, Z, T = self._mulmany([w0, w2, w1, w0], [w3, w1, w3, w2])
        return PointE(X, Y, Z, T)

    # -- cached jitted entry points -------------------------------------

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
    def jscalar_mul_bits(self):
        return jax.jit(self.scalar_mul_bits)

    @functools.cached_property
    def jsum_points(self):
        return jax.jit(self.sum_points, static_argnames=("axis",))

    @functools.cached_property
    def jmsm_bits(self):
        return jax.jit(self.msm_bits)

    @functools.cached_property
    def jencode(self):
        return jax.jit(self.encode)

    @functools.cached_property
    def jdecode(self):
        return jax.jit(self.decode)

    @functools.cached_property
    def jelligator(self):
        return jax.jit(self.elligator_map)

    # -- host byte interfaces -------------------------------------------

    def encode_bytes(self, Pp: PointE) -> list:
        """-> list of 32-byte compressed encodings (row-major)."""
        limbs = np.asarray(self.jencode(Pp)).reshape(-1, 16)
        out = []
        for row in limbs:
            v = sum(int(row[i]) << (16 * i) for i in range(16))
            out.append(v.to_bytes(32, "little"))
        return out

    def decode_bytes(self, encs: list) -> PointE:
        """list of 32-byte strings -> points; raises on invalid."""
        vals = []
        for e in encs:
            v = int.from_bytes(e, "little")
            if v >= P or v % 2 == 1:
                raise ValueError("invalid ristretto encoding (non-canonical)")
            vals.append(v)
        arr = np.zeros((len(vals), 16), dtype=np.uint32)
        for i, v in enumerate(vals):
            arr[i] = int_to_limbs(v)
        pts, valid = self.jdecode(jnp.asarray(arr))
        if not bool(np.asarray(valid).all()):
            raise ValueError("invalid ristretto encoding (not a square)")
        return pts

    def from_uniform_bytes(self, chunks: list) -> PointE:
        """dalek RistrettoPoint::from_uniform_bytes: each chunk is 64 bytes;
        point = MAP(r0) + MAP(r1), r_i = low 255 bits of each half."""
        mask = (1 << 255) - 1
        r0s, r1s = [], []
        for ch in chunks:
            assert len(ch) == 64
            r0s.append(int.from_bytes(ch[:32], "little") & mask)
            r1s.append(int.from_bytes(ch[32:], "little") & mask)
        a = self.jelligator(self.F.to_mont(r0s))
        b = self.jelligator(self.F.to_mont(r1s))
        return self.jadd(a, b)


RISTRETTO = RistrettoGroup()
