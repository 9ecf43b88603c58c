"""Baby-step/giant-step discrete log, TPU-batched.

The reference builds a 3.2M-entry dict of j*G -> j in ~50 minutes of
sequential python-ecdsa adds (src/Pre_computed_table/baby-step-giant-step.py)
and walks giant steps one ciphertext at a time (cnn_networks/Client.py
giant_step).  Here:

  * the baby table is built on device with a doubling-block construction:
    chunk t+1 = chunk t + (chunk_size * G), one batched complete-add plus
    one batched affine conversion per chunk — O(m / chunk) kernel launches;
  * lookups key a uint64 mix of (x, y) into a sorted numpy array
    (searchsorted), so a whole ciphertext batch probes at once;
  * giant steps run K strides at a time for the +M and -M chains jointly:
    each round is one batched add, one batched inversion, one vectorized
    lookup — elements that hit simply stop contributing.

All results are verified at the end with one batched scalar-mult check,
so hash-mix collisions cannot produce wrong plaintexts.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..curve.host_ec import E2_G_HOST, E2_ORDER
from ..curve.weierstrass import E2, PointW, scalars_to_bits

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)
_U64 = (1 << 64) - 1


def _mix_keys(xs, ys) -> np.ndarray:
    """Vectorized 64-bit key from affine coordinate integers."""
    xl = np.asarray([int(v) & _U64 for v in xs], dtype=np.uint64)
    yl = np.asarray([int(v) & _U64 for v in ys], dtype=np.uint64)
    return xl * _MIX1 ^ (yl * _MIX2)


class BsgsTable:
    """Sorted-key baby-step table for dlog of bounded-magnitude messages."""

    def __init__(self, m: int, keys_sorted: np.ndarray, perm: np.ndarray):
        self.m = m
        self.keys_sorted = keys_sorted
        self.perm = perm  # perm[i] = j such that keys_sorted[i] = key(j*G)

    # ------------------------------------------------------------------

    @staticmethod
    def build(m: int = 3_200_000, chunk: int = 1 << 18,
              cache_path: Optional[str] = None) -> "BsgsTable":
        if cache_path and os.path.exists(cache_path):
            with open(cache_path, "rb") as fh:
                data = pickle.load(fh)
            if data["m"] == m:
                return BsgsTable(m, data["keys"], data["perm"])

        chunk = min(chunk, m)
        add_j = E2.padd
        to_aff = E2.pto_affine

        # seed chunk: j*G for j in [1, chunk] by doubling blocks
        pts = PointW(*(c[None] for c in E2.generator()))       # [1*G]
        size = 1
        while size < chunk:
            step = min(size, chunk - size)
            stride = PointW(*(jnp.broadcast_to(c, (step, 16))
                              for c in E2.from_affine_host([size * E2_G_HOST])))
            nxt = add_j(PointW(*(c[:step] for c in pts)), stride)
            pts = PointW(*(jnp.concatenate([p, q], axis=0) for p, q in zip(pts, nxt)))
            size += step

        stride_pt = E2.from_affine_host([chunk * E2_G_HOST])
        stride_b = PointW(*(jnp.broadcast_to(c[0], (chunk, 16)) for c in stride_pt))

        keys_list, js_list = [], []
        j_base = 1
        cur = pts
        while j_base < m:
            count = min(chunk, m - j_base)
            x, y, _ = to_aff(PointW(*(c[:count] for c in cur)))
            xs = E2.F.from_mont(x)
            ys = E2.F.from_mont(y)
            keys_list.append(_mix_keys(xs, ys))
            js_list.append(np.arange(j_base, j_base + count, dtype=np.int64))
            j_base += count
            if j_base < m:
                cur = add_j(cur, stride_b)

        keys = np.concatenate(keys_list)
        js = np.concatenate(js_list)
        order = np.argsort(keys, kind="stable")
        table = BsgsTable(m, keys[order], js[order])
        if cache_path:
            os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
            with open(cache_path, "wb") as fh:
                pickle.dump({"m": m, "keys": table.keys_sorted,
                             "perm": table.perm}, fh)
        return table

    # ------------------------------------------------------------------

    def _lookup(self, xs, ys) -> np.ndarray:
        """-> j candidates (int64), -1 where no key match."""
        keys = _mix_keys(xs, ys)
        pos = np.searchsorted(self.keys_sorted, keys)
        pos = np.clip(pos, 0, len(self.keys_sorted) - 1)
        hit = self.keys_sorted[pos] == keys
        return np.where(hit, self.perm[pos], -1)

    def dlog_batch(self, M: PointW, max_steps: Optional[int] = None,
                   stride_k: int = 32) -> list:
        """Signed dlog of a flat batch of m*G points.  Walks both the +M
        and -M chains (reference dual-chain negative handling,
        cnn_networks/Client.py:228-231)."""
        n = M.x.shape[0]
        # default = m giant steps, the reference's cap (giant_step loops up
        # to m times, cnn_networks/Client.py:188-213); the early break
        # below keeps small values as cheap as a small cap would
        max_steps = max_steps if max_steps is not None else self.m
        # adaptive stride: a big max_steps with a tiny K means tens of
        # thousands of sequential device rounds; widen K (bounded by a
        # ~2^21-candidate memory budget) so deep searches stay device-fat
        # with few dispatches.  The early break keeps typical values fast.
        if max_steps > 64 * stride_k:
            stride_k = int(min(4096, max(stride_k, max_steps // 512),
                               max(32, (1 << 21) // max(n, 1))))
        # chains: axis 0 = [+M, -M]
        chains = PointW(*(jnp.stack([c, d], axis=0)
                          for c, d in zip(M, E2.pneg(M))))

        # stride candidates: -i*m*G for i in 0..K-1, and the round hop -K*m*G
        # (built by an incremental host add chain: K adds, not K full
        # scalar-mults — matters once K is in the thousands)
        K = stride_k
        step_pt = (-self.m) % E2_ORDER * E2_G_HOST
        neg_m_g = []
        acc = 0 * E2_G_HOST
        for _ in range(K):
            neg_m_g.append(acc)
            acc = acc + step_pt
        S = E2.from_affine_host(neg_m_g)                       # (K,)
        hop = PointW(*(c[0] for c in E2.from_affine_host(
            [(-(K * self.m)) % E2_ORDER * E2_G_HOST])))

        S_b = PointW(*(jnp.broadcast_to(c, (2, n, K, 16)) for c in S))
        add_cand = lambda g: E2.padd(PointW(*(c[:, :, None, :] for c in g)), S_b)
        to_aff = E2.pto_affine
        hop_add = lambda g: E2.padd(g, hop)

        found_val = np.full((2, n), -1, dtype=np.int64)
        rounds = (max_steps + K - 1) // K
        for r in range(rounds):
            cand = add_cand(chains)                            # (2, n, K)
            x, y, inf = to_aff(cand)
            xs = E2.F.from_mont(x).reshape(-1)
            ys = E2.F.from_mont(y).reshape(-1)
            infs = np.asarray(inf).reshape(2, n, K)
            js = self._lookup(xs, ys).reshape(2, n, K)
            # infinity candidate means M == (step*m)*G exactly (j contribution 0)
            hit = infs | (js >= 0)
            any_hit = hit.any(axis=-1)
            i_first = np.argmax(hit, axis=-1)
            step = r * K + i_first
            j_at = np.take_along_axis(js, i_first[..., None], axis=-1)[..., 0]
            inf_at = np.take_along_axis(infs, i_first[..., None], axis=-1)[..., 0]
            val = step.astype(np.int64) * self.m + np.where(inf_at, 0, j_at)
            update = any_hit & (found_val == -1)
            found_val = np.where(update, val, found_val)
            if np.all((found_val[0] != -1) | (found_val[1] != -1)):
                break
            chains = hop_add(chains)

        pos, neg = found_val[0], found_val[1]
        missing = (pos == -1) & (neg == -1)
        if missing.any():
            raise ValueError(f"dlog not found within {max_steps} giant steps "
                             f"for {int(missing.sum())} elements")
        use_pos = (pos != -1) & ((neg == -1) | (pos <= neg))
        results = [int(p) if up else -int(ng)
                   for p, ng, up in zip(pos, neg, use_pos)]

        # verification sweep: |v|*G must reproduce +/-M (guards key collisions)
        absvals = [abs(v) for v in results]
        nb = max(1, max((v.bit_length() for v in absvals), default=1))
        G = E2.generator()
        Gb = PointW(*(jnp.broadcast_to(c, (n, 16)) for c in G))
        vg = E2.pscalar_mul_bits(Gb, scalars_to_bits(absvals, nb))
        signs = np.asarray([v < 0 for v in results], dtype=bool)
        vg = E2.pselect(signs, E2.pneg(vg), vg)
        ok = np.asarray(E2.peq(vg, M))
        if not ok.all():
            raise ValueError("BSGS verification failed (hash collision?)")
        return results
