"""Batched prime-field arithmetic on TPU via limb-decomposed JAX arrays.

TPU-native replacement for the reference's CPU bignum stacks:
  - Spartan's 4x64 Montgomery scalar field (reference:
    src/proof_generation/Spartan/src/scalar/ristretto255.rs:246-770), and
  - python-ecdsa's arbitrary-precision field math used by the encrypted
    inference layer (reference: src/convolution/Client.py:134-156).

Design (TPU-first, not a port):
  * A field element is 16 little-endian limbs of 16 bits each, held in a
    uint32 array of shape (..., 16).  16-bit limbs make every partial
    product fit a uint32 lane (no u64/u128 needed — TPUs have no native
    64-bit integer multiply), so all hot loops are pure VPU element-wise
    ops over the batch axes.
  * Elements are kept in Montgomery form (R = 2^256) on device.
  * Montgomery multiplication uses the *separated big-multiply* form
      m = (a*b mod R) * N' mod R;  res = (a*b + m*N) / R
    instead of the CIOS per-limb recurrence: three limb convolutions plus
    a handful of carry scans.  Convolutions are embarrassingly parallel
    across the batch; carry scans are short unrolled chains of vector ops.
  * Everything is shaped so jit/vmap/shard_map can map batches over a
    device mesh; no data-dependent control flow anywhere.

Both needed moduli are instantiated at the bottom:
  FQ : l = 2^252 + 27742317777372353535851937790883648493
       (= curve25519 group order; base field of curve E2 *and* the
        Spartan/ristretto255 scalar field — the coincidence the whole
        vPIN construction rests on)
  FP : p = 2^255 - 19 (coordinate field of ristretto255 commitments)
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

LIMB_BITS = 16
N_LIMBS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
NUM_BITS = LIMB_BITS * N_LIMBS  # 256


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


def _propagate(acc, n_out, carry_in=None):
    """Carry-propagate a 'relaxed' limb array (uint32 values < 2^26) into
    strict base-2^16 digits.  Returns (strict (..., n_out) array, carry)."""
    c = carry_in if carry_in is not None else jnp.zeros(acc.shape[:-1], jnp.uint32)
    outs = []
    n_in = acc.shape[-1]
    for k in range(n_out):
        v = (acc[..., k] if k < n_in else jnp.zeros_like(c)) + c
        outs.append(v & LIMB_MASK)
        c = v >> LIMB_BITS
    return jnp.stack(outs, axis=-1), c


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
        # N' = -N^{-1} mod 2^256
        self.nprime_int = (-pow(modulus, -1, R)) % R
        # device constants
        self.N_dev = jnp.asarray(int_to_limbs(modulus))
        self.NPRIME_dev = jnp.asarray(int_to_limbs(self.nprime_int))
        # 2^256 - N, for the conditional-subtract-by-complement-add trick
        self.NCOMP_dev = jnp.asarray(int_to_limbs(R - modulus))
        self.R_dev = jnp.asarray(int_to_limbs(self.R))          # one, Montgomery form
        self.R2_dev = jnp.asarray(int_to_limbs(self.R2))
        self.ZERO_dev = jnp.zeros((N_LIMBS,), jnp.uint32)
        # inversion exponent (Fermat), MSB-first bit list (static)
        self._inv_exp_bits = [int(b) for b in bin(modulus - 2)[2:]]

    # ------------------------------------------------------------------
    # host <-> device conversion
    # ------------------------------------------------------------------

    def to_mont(self, ints) -> jnp.ndarray:
        """Host ints (any nesting) -> device array in Montgomery form."""
        arr = np.asarray(ints, dtype=object)
        flat = arr.reshape(-1)
        out = np.zeros((flat.shape[0], N_LIMBS), dtype=np.uint32)
        for i, v in enumerate(flat):
            out[i] = int_to_limbs((int(v) % self.modulus) * self.R % self.modulus)
        return jnp.asarray(out.reshape(arr.shape + (N_LIMBS,)))

    def from_mont(self, limbs) -> np.ndarray:
        """Device Montgomery-form array -> numpy object array of ints."""
        arr = np.asarray(limbs)
        flat = arr.reshape(-1, N_LIMBS)
        rinv = pow(self.R, -1, self.modulus)
        out = np.empty((flat.shape[0],), dtype=object)
        for i in range(flat.shape[0]):
            out[i] = limbs_to_int(flat[i]) * rinv % self.modulus
        return out.reshape(arr.shape[:-1])

    def zeros(self, shape=()):
        return jnp.zeros(tuple(shape) + (N_LIMBS,), jnp.uint32)

    def ones(self, shape=()):
        return jnp.broadcast_to(self.R_dev, tuple(shape) + (N_LIMBS,))

    # ------------------------------------------------------------------
    # batched device ops: all take/return uint32 (..., 16) strict limbs
    # ------------------------------------------------------------------

    def _cond_sub_n(self, s):
        """Reduce s in [0, 2N) to [0, N): add (2^256 - N); keep if carry out."""
        t = s + self.NCOMP_dev
        t, carry = _propagate(t, N_LIMBS)
        borrow = (carry > 0)[..., None]
        return jnp.where(borrow, t, s)

    def add(self, a, b):
        s, _ = _propagate(a + b, N_LIMBS)
        return self._cond_sub_n(s)

    def sub(self, a, b):
        # a + N + (2^256 - b) == a + N - b (mod 2^256); since a-b+N lies in
        # (0, 2N) and 2N < 2^256, dropping the final carry gives a+N-b exactly.
        outs = []
        c = jnp.ones(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]), jnp.uint32)
        for k in range(N_LIMBS):
            v = a[..., k] + self.N_dev[k] + (jnp.uint32(LIMB_MASK) - b[..., k]) + c
            outs.append(v & LIMB_MASK)
            c = v >> LIMB_BITS
        s = jnp.stack(outs, axis=-1)
        return self._cond_sub_n(s)

    def neg(self, a):
        return self.sub(self.zeros(a.shape[:-1]), a)

    @staticmethod
    def _mul_raw(a, b, n_out=2 * N_LIMBS, trunc=None):
        """Schoolbook limb convolution with lo/hi split accumulation.
        Returns relaxed limbs (uint32, each < 2^21)."""
        k_max = trunc if trunc is not None else n_out
        acc = jnp.zeros(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]) + (n_out,),
                        jnp.uint32)
        for i in range(N_LIMBS):
            if i >= k_max:
                break
            width = min(N_LIMBS, k_max - i)
            p = a[..., i:i + 1] * b[..., :width]
            lo = p & LIMB_MASK
            hi = p >> LIMB_BITS
            acc = acc.at[..., i:i + width].add(lo)
            hw = min(width, k_max - i - 1)
            if hw > 0:
                acc = acc.at[..., i + 1:i + 1 + hw].add(hi[..., :hw])
        return acc

    def mul(self, a, b):
        """Montgomery product: returns mont(a*b) = a*b*R^{-1} mod N."""
        P = self._mul_raw(a, b)                                   # relaxed, 32 limbs
        P_lo, c_lo = _propagate(P[..., :N_LIMBS], N_LIMBS)        # strict low half
        m_rel = self._mul_raw(P_lo, self.NPRIME_dev, n_out=N_LIMBS, trunc=N_LIMBS)
        m, _ = _propagate(m_rel, N_LIMBS)                         # strict m
        U = self._mul_raw(m, self.N_dev)                          # relaxed, 32 limbs
        # low half of (P_lo + U_lo) is == 0 mod 2^256; we need its carry-out
        _, c1 = _propagate(P_lo + U[..., :N_LIMBS], N_LIMBS)
        hi = P[..., N_LIMBS:] + U[..., N_LIMBS:]
        hi = hi.at[..., 0].add(c_lo)
        s, _ = _propagate(hi, N_LIMBS, carry_in=c1)
        return self._cond_sub_n(s)

    def square(self, a):
        return self.mul(a, a)

    @functools.lru_cache(maxsize=None)
    def _const_mont(self, k: int):
        """Cached device constant: mont(k) = k*R mod N, so mul(a, const)
        yields the plain product k*a in Montgomery form."""
        return jnp.asarray(int_to_limbs((k % self.modulus) * self.R % self.modulus))

    def mul_const(self, a, k: int):
        """Multiply by a host integer constant."""
        return self.mul(a, jnp.broadcast_to(self._const_mont(k), a.shape))

    def select(self, mask, a, b):
        """mask broadcastable bool (...,) -> where(mask, a, b)."""
        return jnp.where(jnp.asarray(mask)[..., None], a, b)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def pow_bits(self, a, bits):
        """Fixed-exponent power by MSB-first bit list (host-static).

        Uses lax.scan over the bit string so the compiled graph holds one
        square + one multiply regardless of exponent size."""
        bits_arr = jnp.asarray(list(bits), jnp.uint32)

        def body(x, bit):
            x = self.mul(x, x)
            xb = self.mul(x, a)
            x = self.select(jnp.broadcast_to(bit == 1, x.shape[:-1]), xb, x)
            return x, None

        x0 = self.ones(a.shape[:-1])
        x, _ = jax.lax.scan(body, x0, bits_arr)
        return x

    def inv(self, a):
        """Batched inverse via Fermat (a^(N-2)); inv(0) = 0 like dalek."""
        return self.pow_bits(a, self._inv_exp_bits)

    def batch_inv(self, a):
        """Inverse of a flat batch. Fermat is fully parallel; Montgomery's
        trick would serialize over the batch, so Fermat wins on TPU."""
        return self.inv(a)

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
