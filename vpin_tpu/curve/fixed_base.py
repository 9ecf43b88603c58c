"""Fixed-base scalar multiplication via windowed point tables.

For a FIXED base point P (the E2 generator G and each public key h —
every ElGamal encryption computes r*G, m*G, r*h; reference
src/convolution/Client.py:19-30), precompute

    T[w][d] = d * 2^(8w) * P     (32 windows x 256 digits, ~1.5 MB)

so s*P = sum_w T[w][digit_w(s)] — a pure gather plus a 5-level tree sum
per scalar, replacing the 253-round double-and-add ladder (~500 batched
group ops) with ~6.  The table build (~500 narrow ops) happens once per
base and is cached.

Works for any group exposing identity/add/select (E2 PointW and
ristretto PointE alike).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

N_WINDOWS = 32
N_DIGITS = 256


def scalars_to_digits(scalars) -> np.ndarray:
    """Host ints (any nesting) -> (..., 32) int32 base-256 digits."""
    arr = np.asarray(scalars, dtype=object)
    out = np.zeros(arr.shape + (N_WINDOWS,), dtype=np.int32)
    flat = arr.reshape(-1)
    oflat = out.reshape(-1, N_WINDOWS)
    for i, v in enumerate(flat):
        v = int(v)
        for w in range(N_WINDOWS):
            oflat[i, w] = (v >> (8 * w)) & 0xFF
    return out


class FixedBaseTable:
    """Windowed digit table for one base point."""

    def __init__(self, group, base):
        """base: a single point ((16,)-shaped coords)."""
        self.group = group
        cls = type(base)
        base_b = cls(*(c[None] for c in base))        # (1,)

        @jax.jit
        def build(P):
            ident = group.identity((1,))

            def chain(acc, _):
                nxt = group.add(acc, P)
                return nxt, acc

            _, row0 = jax.lax.scan(chain, ident, None, length=N_DIGITS)
            row0 = cls(*(c[:, 0] for c in row0))       # (256,)

            def dbl8(row, _):
                for _ in range(8):
                    row = group.add(row, row)
                return row, row

            _, rows = jax.lax.scan(dbl8, row0, None, length=N_WINDOWS - 1)
            full = cls(*(jnp.concatenate([a[None], b], axis=0)
                         for a, b in zip(row0, rows)))  # (32, 256)
            return full

        self.table = build(base_b)

    def mul(self, digits) -> object:
        """digits: (..., 32) int32 -> points of the batch shape.  The
        batch pads to a power of two (digit-0 rows sum to the identity)
        so kernels compile once per size bucket."""
        digits = np.asarray(digits)
        shape = digits.shape[:-1]
        n = int(np.prod(shape, dtype=int))
        n_pad = 1
        while n_pad < max(n, 1):
            n_pad *= 2
        flat = np.zeros((n_pad, N_WINDOWS), dtype=np.int32)
        flat[:n] = digits.reshape(-1, N_WINDOWS)
        out = _fixed_mul_kernel(self.group, n_pad)(self.table,
                                                   jnp.asarray(flat))
        return type(self.table)(*(c[:n].reshape(tuple(shape) + (16,))
                                  for c in out))

    def mul_ints(self, scalars):
        return self.mul(scalars_to_digits(scalars))


import functools


@functools.lru_cache(maxsize=64)
def _fixed_mul_kernel(group, n: int):
    def run(table, digits):
        cls = type(table)
        w = jnp.arange(N_WINDOWS)
        gathered = cls(*(c[w, digits] for c in table))   # (n, 32)
        pts = gathered
        k = N_WINDOWS
        while k > 1:
            half = k // 2
            lo = cls(*(c[:, :half] for c in pts))
            hi = cls(*(c[:, half:] for c in pts))
            pts = group.add(lo, hi)
            k = half
        return cls(*(c[:, 0] for c in pts))

    return jax.jit(run)
