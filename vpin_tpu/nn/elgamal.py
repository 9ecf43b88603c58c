"""Exponential ElGamal over curve E2, batched on TPU.

Behavioral parity with the reference (src/convolution/Client.py:19-30
encrypt; src/cnn_networks/Client.py:215-249 decrypt):
  Enc(m) = (c1, c2) = (r*G, m*G + r*h),  r random in [1, q-1]
  Dec    = dlog(c2 - x*c1) via baby-step/giant-step, trying both +M and -M
           to recover signed messages.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from ..curve.fixed_base import FixedBaseTable, scalars_to_digits
from ..curve.host_ec import E2_G_HOST, E2_ORDER, HostPoint
from ..curve.weierstrass import E2, PointW, scalars_to_bits
from .bsgs import BsgsTable


class CipherTensor(NamedTuple):
    """A batch of ElGamal ciphertexts: two point batches of equal shape."""
    c1: PointW
    c2: PointW

    @property
    def batch_shape(self):
        return self.c1.x.shape[:-1]


_G_TABLE: Optional[FixedBaseTable] = None


def _g_table() -> FixedBaseTable:
    global _G_TABLE
    if _G_TABLE is None:
        _G_TABLE = FixedBaseTable(E2, E2.generator())
    return _G_TABLE


@dataclass
class KeyPair:
    x: int                 # secret
    h_host: HostPoint      # public h = x*G
    h_dev: PointW          # broadcast-ready device copy (shape ())

    @staticmethod
    def generate(rng: Optional[random.Random] = None) -> "KeyPair":
        rng = rng or random.Random()
        x = rng.randrange(1, E2_ORDER - 1)
        h = x * E2_G_HOST
        h_dev = PointW(*(c[0] for c in E2.from_affine_host([h])))
        return KeyPair(x, h, h_dev)

    @property
    def h_table(self) -> FixedBaseTable:
        tbl = getattr(self, "_h_table", None)
        if tbl is None:
            tbl = FixedBaseTable(E2, self.h_dev)
            object.__setattr__(self, "_h_table", tbl)
        return tbl


def _fixed_base_mul(base: PointW, scalars, n_bits) -> PointW:
    arr = np.asarray(scalars, dtype=object)
    shape = arr.shape
    bits = scalars_to_bits(arr, n_bits)
    base_b = PointW(*(jnp.broadcast_to(c, shape + (16,)) for c in base))
    return E2.pscalar_mul_bits(base_b, bits)


def encrypt_batch(messages, key: KeyPair,
                  rng: Optional[random.Random] = None) -> CipherTensor:
    """Encrypt a host integer array (any shape).  The fixed bases G and h
    use cached windowed digit tables (curve/fixed_base.py): one gather +
    log2(32) adds per point instead of a 253-round ladder."""
    rng = rng or random.Random()
    arr = np.asarray(messages, dtype=object)
    flat = [int(v) for v in arr.reshape(-1)]
    n = len(flat)
    rs = [rng.randrange(1, E2_ORDER - 1) for _ in range(n)]
    r_digits = scalars_to_digits(np.asarray(rs, dtype=object).reshape(arr.shape))

    c1 = _g_table().mul(r_digits)
    rh = key.h_table.mul(r_digits)

    absm = [abs(v) for v in flat]
    mg = _g_table().mul(scalars_to_digits(
        np.asarray(absm, dtype=object).reshape(arr.shape)))
    neg = np.asarray([v < 0 for v in flat], dtype=bool).reshape(arr.shape)
    mg = E2.pselect(neg, E2.pneg(mg), mg)

    c2 = E2.padd(mg, rh)
    return CipherTensor(c1, c2)


def decrypt_batch(ct: CipherTensor, key: KeyPair, table: BsgsTable,
                  max_steps: Optional[int] = None) -> np.ndarray:
    """Decrypt to signed host integers via batched BSGS
    (reference: Client.py decrypt_c1_c2 + giant_step)."""
    shape = ct.batch_shape
    flatct = CipherTensor(
        PointW(*(c.reshape(-1, 16) for c in ct.c1)),
        PointW(*(c.reshape(-1, 16) for c in ct.c2)),
    )
    n = flatct.c1.x.shape[0]
    xbits = scalars_to_bits([key.x] * n, 253)
    s = E2.pscalar_mul_bits(flatct.c1, xbits)
    M = E2.padd(flatct.c2, E2.pneg(s))      # m*G
    vals = table.dlog_batch(M, max_steps=max_steps)
    return np.asarray(vals, dtype=object).reshape(shape)
