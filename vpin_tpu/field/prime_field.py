"""Batched prime-field arithmetic on TPU via limb-decomposed JAX arrays.

TPU-native replacement for the reference's CPU bignum stacks:
  - Spartan's 4x64 Montgomery scalar field (reference:
    src/proof_generation/Spartan/src/scalar/ristretto255.rs:246-770), and
  - python-ecdsa's arbitrary-precision field math used by the encrypted
    inference layer (reference: src/convolution/Client.py:134-156).

Design (TPU-first, not a port):
  * A field element is 16 little-endian limbs of 16 bits each, held in a
    uint32 array of shape (..., 16).  16-bit limbs make every partial
    product fit a uint32 lane (TPUs have no native 64-bit multiply), so
    all hot loops are pure VPU element-wise ops over the batch axes.
  * Elements are kept in Montgomery form (R = 2^256) on device.
  * Montgomery multiplication uses the *separated big-multiply* form
      m = (a*b mod R) * N' mod R;  res = (a*b + m*N) / R
    three limb convolutions realized as batched outer products + a
    "skew reshape" anti-diagonal reduction — no per-limb recurrences.
  * Carry propagation is log-depth: one provisional pass plus a
    (generate, propagate) carry-lookahead via lax.associative_scan.
    No sequential chains, no while loops; graphs stay tiny, so both XLA
    compile time and TPU runtime behave.
  * Everything is shaped so jit/vmap/shard_map can map batches over a
    device mesh; no data-dependent control flow anywhere.

Instantiated moduli:
  FQ : l = 2^252 + 27742317777372353535851937790883648493
       (= curve25519 group order; base field of curve E2 *and* the
        Spartan/ristretto255 scalar field — the coincidence the whole
        vPIN construction rests on)
  FP : p = 2^255 - 19 (coordinate field of ristretto255 commitments)
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

LIMB_BITS = 16
N_LIMBS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
NUM_BITS = LIMB_BITS * N_LIMBS  # 256

# Pallas kernel dispatch: "1" forces it on (interpret mode off-TPU),
# "0" forces it off, "auto" (default) uses it on real TPU backends for
# batches big enough to fill the lanes.
_PALLAS_MODE = os.environ.get("VPIN_PALLAS", "auto")


def _pallas_wanted() -> bool:
    if _PALLAS_MODE == "0":
        return False
    if _PALLAS_MODE == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def int_to_limbs(x: int, n_limbs: int = N_LIMBS) -> np.ndarray:
    """Host: python int -> little-endian uint32 limb vector."""
    out = np.zeros((n_limbs,), dtype=np.uint32)
    for i in range(n_limbs):
        out[i] = (x >> (LIMB_BITS * i)) & LIMB_MASK
    return out


def limbs_to_int(limbs) -> int:
    """Host: limb vector -> python int."""
    limbs = np.asarray(limbs)
    return sum(int(limbs[i]) << (LIMB_BITS * i) for i in range(limbs.shape[-1]))


# ----------------------------------------------------------------------
# log-depth carry machinery
# ----------------------------------------------------------------------

def _carry_lookahead(s):
    """Resolve a limb vector with boolean carries: s (..., K) uint32 with
    every entry < 2^17.  Returns (strict digits, final carry in {0,1}).

    Hand-rolled Kogge-Stone prefix over the (generate, propagate) monoid —
    log2(K) shift/or/and levels, far fewer HLO ops than associative_scan."""
    K = s.shape[-1]
    d = s & LIMB_MASK
    G = (s >> LIMB_BITS).astype(jnp.uint32)            # carry generated (0/1)
    P = (d == LIMB_MASK).astype(jnp.uint32)            # carry propagates
    dshift = 1
    while dshift < K:
        z = jnp.zeros(s.shape[:-1] + (dshift,), jnp.uint32)
        Gs = jnp.concatenate([z, G[..., :-dshift]], axis=-1)
        Ps = jnp.concatenate([z, P[..., :-dshift]], axis=-1)
        G = G | (P & Gs)
        P = P & Ps
        dshift *= 2
    carry_in = jnp.concatenate(
        [jnp.zeros_like(G[..., :1]), G[..., :-1]], axis=-1)
    out = (d + carry_in) & LIMB_MASK
    return out, G[..., -1]


def _resolve(acc, carry_in=None):
    """Full carry resolution of a relaxed limb vector (entries < 2^26).
    Returns (strict digits (..., K), final carry)."""
    d = acc & LIMB_MASK
    c = acc >> LIMB_BITS                               # multi-bit carries
    if carry_in is not None:
        d = d.at[..., 0].add(carry_in)
    s = d.at[..., 1:].add(c[..., :-1])                 # still < 2^17 per limb
    out, fc = _carry_lookahead(s)
    return out, fc + c[..., -1]


def _skew_sum(t, n_rows, n_cols):
    """Anti-diagonal sums: t (..., n, m) -> (..., n+m-1) where
    out[k] = sum_{i+j=k} t[i, j], via the pad-flatten-reshape skew trick
    (one pad + reshape + reduce; no gathers)."""
    batch = t.shape[:-2]
    w = n_rows + n_cols - 1
    pad = jnp.zeros(batch + (n_rows, w + 1 - n_cols), t.dtype)
    flat = jnp.concatenate([t, pad], axis=-1).reshape(batch + (n_rows * (w + 1),))
    skew = flat[..., : n_rows * w].reshape(batch + (n_rows, w))
    return skew.sum(axis=-2)


def _mul_limbs(a, b, out_limbs=2 * N_LIMBS):
    """Relaxed schoolbook product of two strict limb vectors.
    Returns (..., out_limbs) uint32 with entries < 2^21."""
    prod = a[..., :, None] * b[..., None, :]           # (..., 16, 16) < 2^32
    lo = prod & LIMB_MASK
    hi = prod >> LIMB_BITS
    s_lo = _skew_sum(lo, N_LIMBS, N_LIMBS)             # (..., 31)
    s_hi = _skew_sum(hi, N_LIMBS, N_LIMBS)
    out = jnp.zeros(prod.shape[:-2] + (2 * N_LIMBS,), jnp.uint32)
    out = out.at[..., :31].add(s_lo)
    out = out.at[..., 1:32].add(s_hi)
    return out[..., :out_limbs]


class PrimeField:
    """A prime field with batched JAX limb arithmetic (Montgomery form)."""

    def __init__(self, modulus: int, name: str = "F"):
        self.modulus = modulus
        self.name = name
        self.num_bits = modulus.bit_length()
        R = 1 << NUM_BITS
        self.R = R % modulus
        self.R2 = (self.R * self.R) % modulus
        self.R3 = (self.R2 * self.R) % modulus
        self.nprime_int = (-pow(modulus, -1, R)) % R   # -N^{-1} mod 2^256
        # IMPORTANT: constants stay HOST numpy arrays.  jnp ops accept them
        # directly, and jit embeds them into the module straight from host
        # memory.  Eager device constants would be closed over by jitted
        # functions and embedded via a device->host fetch at LOWERING time
        # — on a remote-device backend (axon tunnel) that fetch costs
        # seconds to minutes.
        self.N_dev = int_to_limbs(modulus)
        self.NPRIME_dev = int_to_limbs(self.nprime_int)
        self.NCOMP_dev = int_to_limbs(R - modulus)
        self.R_dev = int_to_limbs(self.R)  # == one, Montgomery form
        self.R2_dev = int_to_limbs(self.R2)
        self._inv_exp_bits = tuple(int(b) for b in bin(modulus - 2)[2:])

    # ------------------------------------------------------------------
    # host <-> device conversion
    # ------------------------------------------------------------------

    def to_limb_array(self, ints) -> np.ndarray:
        """Host ints -> plain (non-Montgomery) limb array, vectorized."""
        arr = np.asarray(ints, dtype=object)
        flat = arr.reshape(-1)
        vals = np.array([int(v) % self.modulus for v in flat], dtype=object)
        out = np.zeros((flat.shape[0], N_LIMBS), dtype=np.uint32)
        for i in range(N_LIMBS):
            out[:, i] = ((vals >> (LIMB_BITS * i)) & LIMB_MASK).astype(np.uint32)
        return out.reshape(arr.shape + (N_LIMBS,))

    def to_mont(self, ints) -> jnp.ndarray:
        """Host ints (any nesting) -> device array in Montgomery form."""
        plain = jnp.asarray(self.to_limb_array(ints))
        return self._to_mont_jit(plain)

    @functools.cached_property
    def _to_mont_jit(self):
        return jax.jit(lambda x: self.mul(x, jnp.broadcast_to(self.R2_dev, x.shape)))

    @functools.cached_property
    def _from_mont_jit(self):
        one_plain = int_to_limbs(1)
        return jax.jit(lambda x: self.mul(x, jnp.broadcast_to(one_plain, x.shape)))

    def from_mont(self, limbs) -> np.ndarray:
        """Device Montgomery-form array -> numpy object array of ints."""
        canon = np.asarray(self._from_mont_jit(jnp.asarray(limbs)))
        flat = canon.reshape(-1, N_LIMBS).astype(object)
        acc = np.zeros((flat.shape[0],), dtype=object)
        for i in range(N_LIMBS):
            acc = acc + (flat[:, i] << (LIMB_BITS * i))
        return acc.reshape(canon.shape[:-1])

    def zeros(self, shape=()):
        return jnp.zeros(tuple(shape) + (N_LIMBS,), jnp.uint32)

    def ones(self, shape=()):
        return jnp.broadcast_to(self.R_dev, tuple(shape) + (N_LIMBS,))

    # ------------------------------------------------------------------
    # batched device ops: uint32 (..., 16) strict limbs, Montgomery form
    # ------------------------------------------------------------------

    def _cond_sub_n(self, s):
        """Reduce s in [0, 2N) to [0, N): add 2^256 - N; keep if carry out."""
        t, carry = _carry_lookahead(s + self.NCOMP_dev)
        return jnp.where((carry > 0)[..., None], t, s)

    def add(self, a, b):
        s, _ = _carry_lookahead(a + b)
        return self._cond_sub_n(s)

    def sub(self, a, b):
        # a + N + (2^256 - b) == a - b + N (mod 2^256); the value lies in
        # (0, 2N) < 2^256, so dropping the final carry is exact.
        t = a + self.N_dev + (jnp.uint32(LIMB_MASK) - b)
        t = t.at[..., 0].add(jnp.uint32(1))
        s, _ = _resolve(t)
        return self._cond_sub_n(s)

    def neg(self, a):
        return self.sub(self.zeros(a.shape[:-1]), a)

    def mul(self, a, b):
        """Montgomery product (a*b*R^{-1} mod N), log-depth throughout.
        Dispatches to the fused Pallas kernel on TPU (field/pallas_mont.py)
        when the batch is large enough to fill its lanes."""
        if _pallas_wanted():
            n = int(np.prod(jnp.broadcast_shapes(a.shape, b.shape)[:-1],
                            dtype=int))
            if n >= 256:
                from .pallas_mont import mont_mul_pallas
                return mont_mul_pallas(self, a, b)
        return self._mul_jnp(a, b)

    def _mul_jnp(self, a, b):
        P = _mul_limbs(a, b)                                   # relaxed, 32
        P_strict, _ = _resolve(P)                              # < N^2 < 2^512
        m_rel = _mul_limbs(P_strict[..., :N_LIMBS], self.NPRIME_dev,
                           out_limbs=N_LIMBS)
        m, _ = _resolve(m_rel)
        U = _mul_limbs(m, self.N_dev)                          # relaxed, 32
        S = P_strict + U                                       # < 2^22 per limb
        S_strict, _ = _resolve(S)
        # low half is 0 mod 2^256 by construction; its carry already flowed
        # into the high half during _resolve.
        return self._cond_sub_n(S_strict[..., N_LIMBS:])

    def square(self, a):
        return self.mul(a, a)

    @functools.lru_cache(maxsize=None)
    def _const_mont(self, k: int):
        return int_to_limbs((k % self.modulus) * self.R % self.modulus)

    def mont_limbs_np(self, v: int) -> np.ndarray:
        """Host int -> Montgomery-form limb vector as a HOST numpy array
        (safe to close over in jitted code: no device round trip)."""
        return int_to_limbs(int(v) % self.modulus * self.R % self.modulus)

    def mul_const(self, a, k: int):
        """Multiply by a host integer constant."""
        return self.mul(a, jnp.broadcast_to(self._const_mont(k), a.shape))

    def select(self, mask, a, b):
        return jnp.where(jnp.asarray(mask)[..., None], a, b)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def pow_bits(self, a, bits):
        """Fixed-exponent power, MSB-first bit tuple (host-static); the
        lax.scan keeps one square + one mul in the compiled graph."""
        bits_arr = jnp.asarray(list(bits), jnp.uint32)

        def body(x, bit):
            x = self.mul(x, x)
            xb = self.mul(x, a)
            return self.select(jnp.broadcast_to(bit == 1, x.shape[:-1]), xb, x), None

        x, _ = jax.lax.scan(body, self.ones(a.shape[:-1]), bits_arr)
        return x

    def inv(self, a):
        """Batched inverse via Fermat (a^(N-2)); inv(0) = 0 like dalek.
        Fermat is fully batch-parallel; Montgomery's trick would serialize
        over the batch, so Fermat wins on TPU."""
        return self.pow_bits(a, self._inv_exp_bits)

    batch_inv = inv

    #: elements per reduction chunk: larger single-pass reductions
    #: materialize (n, 16) HLO temps that TPU pads 8x (16 -> 128 lanes)
    SUM_CHUNK = 1 << 19

    def sum_reduce(self, a, axis: int = 0):
        """Log-depth field sum along a batch axis (shift-and-add with a
        fixed shape per level; one tiny lax.scan body).  Large reductions
        stream in SUM_CHUNK blocks — field addition is exact mod N, so
        any association yields identical canonical limbs."""
        if axis != 0:
            a = jnp.moveaxis(a, axis, 0)
        n = a.shape[0]
        if n == 1:
            return a[0]
        inner = int(np.prod(a.shape[1:-1], dtype=int))
        if n * max(inner, 1) > self.SUM_CHUNK and inner <= self.SUM_CHUNK:
            C = max(self.SUM_CHUNK // max(inner, 1), 2)
            rp = 1
            while rp * 2 <= C:
                rp *= 2
            if n > rp:
                k = -(-n // rp)
                pad = k * rp - n
                if pad:
                    a = jnp.concatenate(
                        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)],
                        axis=0)
                resh = a.reshape((k, rp) + a.shape[1:])

                def body(carry, x):
                    return self.add(carry, self.sum_reduce(x)), None

                acc, _ = jax.lax.scan(
                    body, self.zeros(a.shape[1:-1]), resh)
                return acc
        levels = int(np.ceil(np.log2(n)))
        pad = jnp.zeros_like(a)
        strides = jnp.asarray([1 << t for t in range(levels)], jnp.int32)

        def body(acc, stride):
            padded = jnp.concatenate([acc, pad], axis=0)
            shifted = jax.lax.dynamic_slice_in_dim(padded, stride, n, axis=0)
            return self.add(acc, shifted), None

        acc, _ = jax.lax.scan(body, a, strides)
        return acc[0]

    def dot(self, a, b, axis: int = 0):
        """Field inner product along an axis."""
        return self.sum_reduce(self.mul(a, b), axis=axis)

    def limbs_to_bits(self, a_plain, n_bits: int = 253):
        """Plain (non-Montgomery) limb array (..., 16) -> LSB-first bit
        array (..., n_bits) uint32, on device (feeds scalar-mult ladders)."""
        shifts = jnp.arange(LIMB_BITS, dtype=jnp.uint32)
        bits = (a_plain[..., :, None] >> shifts) & 1      # (..., 16, 16)
        return bits.reshape(a_plain.shape[:-1] + (NUM_BITS,))[..., :n_bits]

    # ------------------------------------------------------------------
    # host scalar helpers (exact Python ints; used by transcript etc.)
    # ------------------------------------------------------------------

    def from_bytes(self, b: bytes) -> int:
        v = int.from_bytes(b, "little")
        if v >= self.modulus:
            raise ValueError("non-canonical bytes")
        return v

    def from_bytes_mod_order(self, b: bytes) -> int:
        return int.from_bytes(b, "little") % self.modulus

    def from_bytes_wide(self, b: bytes) -> int:
        assert len(b) == 64
        return int.from_bytes(b, "little") % self.modulus

    def to_bytes(self, v: int) -> bytes:
        return int(v % self.modulus).to_bytes(32, "little")


# The two fields of the system.
L_MODULUS = 2**252 + 27742317777372353535851937790883648493
P_MODULUS = 2**255 - 19

FQ = PrimeField(L_MODULUS, name="Fl")   # Spartan scalar field == E2 base field
FP = PrimeField(P_MODULUS, name="Fp")   # ristretto255 coordinate field
