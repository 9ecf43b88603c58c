"""Shape-canonicalizing wrappers around the batched group ops.

XLA compiles one executable per input shape; a CNN protocol run touches
dozens of distinct batch shapes, which would mean dozens of multi-second
compiles.  These wrappers flatten every batch to 1-D and pad it to the
next power of two (with the identity point / zero bits), so the whole
framework shares O(log max_batch) compiled kernels per op — and they all
hit the persistent compilation cache across processes.

Works for any group object exposing:
  identity(shape), add, neg, eq, select, to_affine/encode-style ops,
  scalar_mul_bits, sum_points — i.e. both WeierstrassCurve (E2) and
  RistrettoGroup.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _pow2(n: int) -> int:
    m = 1
    while m < n:
        m *= 2
    return m


def _flatten_pad(group, P, n_pad):
    """Point batch (any shape) -> (n_pad,) flat, padded with identity."""
    cls = type(P)
    flat = cls(*(c.reshape(-1, 16) for c in P))
    n = flat[0].shape[0]
    if n == n_pad:
        return flat
    pad = group.identity((n_pad - n,))
    return cls(*(jnp.concatenate([a, b], axis=0) for a, b in zip(flat, pad)))


def _unflatten(P, shape, n):
    cls = type(P)
    return cls(*(c[:n].reshape(tuple(shape) + (16,)) for c in P))


class PaddedOps:
    """Mixin for group classes; every method is safe to call eagerly from
    orchestration code with arbitrary batch shapes."""

    def identity(self, shape=()):  # overridden (WeierstrassCurve aliases infinity)
        raise NotImplementedError

    def padd(self, P, Q):
        shape = jnp.broadcast_shapes(P[0].shape, Q[0].shape)[:-1]
        cls = type(P)
        Pb = cls(*(jnp.broadcast_to(c, shape + (16,)) for c in P))
        Qb = cls(*(jnp.broadcast_to(c, shape + (16,)) for c in Q))
        n = int(np.prod(shape, dtype=int))
        n_pad = _pow2(max(n, 1))
        out = self.jadd(_flatten_pad(self, Pb, n_pad), _flatten_pad(self, Qb, n_pad))
        return _unflatten(out, shape, n)

    def pneg(self, P):
        shape = P[0].shape[:-1]
        n = int(np.prod(shape, dtype=int))
        n_pad = _pow2(max(n, 1))
        out = self.jneg(_flatten_pad(self, P, n_pad))
        return _unflatten(out, shape, n)

    def peq(self, P, Q):
        shape = jnp.broadcast_shapes(P[0].shape, Q[0].shape)[:-1]
        cls = type(P)
        Pb = cls(*(jnp.broadcast_to(c, shape + (16,)) for c in P))
        Qb = cls(*(jnp.broadcast_to(c, shape + (16,)) for c in Q))
        n = int(np.prod(shape, dtype=int))
        n_pad = _pow2(max(n, 1))
        out = self.jeq(_flatten_pad(self, Pb, n_pad), _flatten_pad(self, Qb, n_pad))
        return np.asarray(out)[:n].reshape(shape)

    def pselect(self, mask, P, Q):
        mask = np.broadcast_to(np.asarray(mask), P[0].shape[:-1])
        shape = P[0].shape[:-1]
        n = int(np.prod(shape, dtype=int))
        n_pad = _pow2(max(n, 1))
        m = np.zeros((n_pad,), dtype=bool)
        m[:n] = mask.reshape(-1)
        out = self.jselect(jnp.asarray(m),
                           _flatten_pad(self, P, n_pad),
                           _flatten_pad(self, Q, n_pad))
        return _unflatten(out, shape, n)

    _BIT_BUCKETS = (8, 16, 32, 64, 128, 253)

    def pscalar_mul_bits(self, P, bits):
        """bits: numpy (..., n_bits) broadcastable to P's batch shape.
        The bit width is padded up to a small set of buckets so ladder
        kernels compile once per bucket, not once per exact width."""
        bits = np.asarray(bits)
        shape = jnp.broadcast_shapes(P[0].shape[:-1], bits.shape[:-1])
        cls = type(P)
        Pb = cls(*(jnp.broadcast_to(c, shape + (16,)) for c in P))
        n_bits = bits.shape[-1]
        nb_pad = next((b for b in self._BIT_BUCKETS if b >= n_bits),
                      max(n_bits, 256))
        bits_b = np.broadcast_to(bits, tuple(shape) + (n_bits,))
        n = int(np.prod(shape, dtype=int))
        n_pad = _pow2(max(n, 1))
        bits_flat = np.zeros((n_pad, nb_pad), dtype=np.uint32)
        bits_flat[:n, :n_bits] = bits_b.reshape(n, n_bits)
        out = self.jscalar_mul_bits(_flatten_pad(self, Pb, n_pad),
                                    jnp.asarray(bits_flat))
        return _unflatten(out, shape, n)

    def psum_points(self, P, axis=0):
        """Sum along one batch axis; pads both the reduction axis and the
        flattened remainder to powers of two."""
        cls = type(P)
        if axis != 0:
            P = cls(*(jnp.moveaxis(c, axis, 0) for c in P))
        shape = P[0].shape[:-1]
        k, rest = shape[0], shape[1:]
        r = int(np.prod(rest, dtype=int))
        k_pad, r_pad = _pow2(max(k, 1)), _pow2(max(r, 1))
        flat = cls(*(c.reshape(k, r, 16) for c in P))
        if r != r_pad:
            pad = self.identity((k, r_pad - r))
            flat = cls(*(jnp.concatenate([a, b], axis=1) for a, b in zip(flat, pad)))
        if k != k_pad:
            pad = self.identity((k_pad - k, r_pad))
            flat = cls(*(jnp.concatenate([a, b], axis=0) for a, b in zip(flat, pad)))
        out = self.jsum_points(flat, axis=0)                  # (r_pad,)
        return cls(*(c[:r].reshape(tuple(rest) + (16,)) for c in out))

    def pto_affine(self, P):
        shape = P[0].shape[:-1]
        n = int(np.prod(shape, dtype=int))
        n_pad = _pow2(max(n, 1))
        x, y, inf = self.jto_affine(_flatten_pad(self, P, n_pad))
        return (x[:n].reshape(tuple(shape) + (16,)),
                y[:n].reshape(tuple(shape) + (16,)),
                np.asarray(inf)[:n].reshape(shape))
