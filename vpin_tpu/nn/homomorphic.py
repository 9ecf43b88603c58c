"""Homomorphic CNN layers over ElGamal ciphertext halves, batched on TPU.

TPU-native redesign of the reference's per-pixel python-ecdsa loops:
  conv   : src/cnn_networks/Server.py:268-323 (myConv2d, type==1)
  rLC    : src/cnn_networks/Server.py:151-266 (rLCL/rLCR) — Freivalds check
  pool   : src/cnn_networks/Server.py:358-429 (myAvgPool2d)
  FC     : src/cnn_networks/Server.py:439-470 (FCLayer)

Points live as structure-of-arrays PointW batches; sliding windows become
static gathers; scalar point-mults run as batched branch-free ladders; sums
become log-depth tree reductions.  Only the protocol-relevant ops are
recorded into the WitnessTrace, with list ordering identical to the
reference's global lists so the exported JSON matches byte-for-byte given
the same keys/inputs.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..curve.weierstrass import E2, PointW, scalars_to_bits
from . import fixed_point
from .prf import pf_vector
from .trace import WitnessTrace


@jax.jit
def _prefix_scan_jit(first: PointW, rest: PointW):
    """Running point sums: returns (final, stacked intermediate sums)."""
    def body(acc, term):
        new = E2.add(acc, term)
        return new, new

    return jax.lax.scan(body, first, rest)


def _window_indices(H, W, f, padding, stride):
    """Static (M, f*f) gather indices into the padded (H+2p)x(W+2p) image.
    Row-major over output pixels, then row-major over the filter — the same
    iteration order as the reference's loops."""
    Hp, Wp = H + 2 * padding, W + 2 * padding
    OH = (Hp - f) // stride + 1
    OW = (Wp - f) // stride + 1
    idx = np.empty((OH * OW, f * f), dtype=np.int32)
    m = 0
    for i in range(OH):
        for j in range(OW):
            t = 0
            for ii in range(f):
                for jj in range(f):
                    idx[m, t] = (i * stride + ii) * Wp + (j * stride + jj)
                    t += 1
            m += 1
    return idx, OH, OW


def _pad_infinity(P: PointW, padding: int) -> PointW:
    """Surround an (H, W) point image with the identity point
    (reference pads with identityPoint, Server.py:278)."""
    if padding == 0:
        return P
    H, W = P.batch_shape
    inf_row = E2.infinity((padding, W + 2 * padding))
    inf_col = E2.infinity((H, padding))
    withcols = PointW(*(jnp.concatenate([inf_col[i], P[i], inf_col[i]], axis=1)
                        for i in range(3)))
    return PointW(*(jnp.concatenate([inf_row[i], withcols[i], inf_row[i]], axis=0)
                    for i in range(3)))


def _gather(P: PointW, idx) -> PointW:
    flat = PointW(*(c.reshape(-1, 16) for c in P))
    return PointW(*(c[idx] for c in flat))


def _signed_const_mul(P: PointW, weights: np.ndarray) -> PointW:
    """[w]P elementwise for a static integer weight array broadcastable to
    P's batch shape; negative weights via point negation."""
    w = np.asarray(weights, dtype=object)
    absw = np.vectorize(lambda v: abs(int(v)), otypes=[object])(w)
    n_bits = max(1, max(int(v).bit_length() for v in absw.reshape(-1)))
    bits = scalars_to_bits(absw, n_bits)
    out = E2.pscalar_mul_bits(P, bits)
    neg_mask = np.vectorize(lambda v: int(v) < 0, otypes=[bool])(w)
    if neg_mask.any():
        out = E2.pselect(neg_mask, E2.pneg(out), out)
    return out


class RLCCheckError(AssertionError):
    pass


class HomomorphicEngine:
    """Server-side encrypted-inference layers with rLC verification.

    Deferred equality checks: each conv/FC queues a device boolean; call
    flush_checks() to synchronize and assert (mirrors the reference's
    inline `assert result_left == result_right`, Server.py:321/:468,
    without forcing a host sync per layer).
    """

    def __init__(self, trace: Optional[WitnessTrace] = None,
                 prf_trunc_bytes: int = 14):
        self.trace = trace if trace is not None else WitnessTrace()
        self.prf_trunc_bytes = prf_trunc_bytes
        self.pending_checks = []

    # ------------------------------------------------------------------

    def _prefix_adds(self, terms: PointW):
        """Sequential running sums acc_t = sum(terms[0..t]) via lax.scan;
        returns (accs (n,...), final acc (...)).  Batch dims are flattened
        and padded to a power of two to bound compile-shape variety."""
        n = terms.x.shape[0]
        rest_shape = terms.x.shape[1:-1]
        b = int(np.prod(rest_shape, dtype=int))
        b_pad = 1
        while b_pad < max(b, 1):
            b_pad *= 2
        flat = PointW(*(c.reshape(n, b, 16) for c in terms))
        if b_pad != b:
            pad = E2.infinity((n, b_pad - b))
            flat = PointW(*(jnp.concatenate([x, q], axis=1)
                            for x, q in zip(flat, pad)))
        first = PointW(*(c[0] for c in flat))
        rest = PointW(*(c[1:] for c in flat))
        final, accs_rest = _prefix_scan_jit(first, rest)
        accs = PointW(*(jnp.concatenate([c[None], r], axis=0)
                        for c, r in zip(first, accs_rest)))
        accs = PointW(*(c[:, :b].reshape((n,) + rest_shape + (16,)) for c in accs))
        final = PointW(*(c[:b].reshape(rest_shape + (16,)) for c in final))
        return accs, final

    def _record_chain(self, terms: PointW):
        """Record the (n-1) running-sum additions of a term chain, in order;
        returns the final sum."""
        accs, final = self._prefix_adds(terms)
        left = PointW(*(c[:-1] for c in accs))
        right = PointW(*(c[1:] for c in terms))
        self.trace.record_adds(left, right)
        return final

    # ------------------------------------------------------------------

    def conv2d(self, P: PointW, filt: np.ndarray, key: bytes,
               padding: int = 0, stride: int = 1) -> PointW:
        """Homomorphic conv of one (H, W) ciphertext half by an integer
        filter, with the rLC verification emitting f^2 recorded mults and
        f^2-1 recorded adds (the witness-collapse trick of the paper)."""
        H, W = P.batch_shape
        filt = np.asarray(filt)
        f = filt.shape[0]
        idx, OH, OW = _window_indices(H, W, f, padding, stride)
        M, F2 = idx.shape

        win = _gather(_pad_infinity(P, padding), idx)          # (M, f^2)
        wflat = filt.reshape(-1)

        # unrecorded homomorphic conv output
        terms = _signed_const_mul(win, wflat[None, :])
        out = E2.psum_points(terms, axis=1)                    # (M,)

        # rLC left: sum_m rho_m * out_m
        rho = pf_vector(key, M, self.prf_trunc_bytes)
        rho_bits = scalars_to_bits(rho, 8 * self.prf_trunc_bytes)
        left = E2.psum_points(E2.pscalar_mul_bits(out, rho_bits), axis=0)

        # rLC right: combine windows first (unrecorded), then f^2 recorded
        # mults by the plain kernel weights + a recorded add chain.
        comb_terms = E2.pscalar_mul_bits(win, rho_bits[:, None, :])
        combined = E2.psum_points(comb_terms, axis=0)          # (f^2,)
        temp = _signed_const_mul(combined, wflat)
        self.trace.record_mults(combined, [int(v) for v in wflat])
        right = self._record_chain(temp)

        self.pending_checks.append(E2.peq(left, right))
        return PointW(*(c.reshape(OH, OW, 16) for c in out))

    def avgpool2d(self, P: PointW, kernel_size: int, stride: int) -> PointW:
        """Homomorphic average pool: recorded window-sum adds, then an
        unrecorded mult by fixed_point(1/k^2, 10 bits)
        (reference: Server.py:358-429)."""
        H, W = P.batch_shape
        k = kernel_size
        idx, OH, OW = _window_indices(H, W, k, 0, stride)
        win = _gather(P, idx)                                  # (M, k^2)
        # scan over window elements => transpose window axis to front
        winT = PointW(*(jnp.swapaxes(c, 0, 1) for c in win))   # (k^2, M)
        accs, final = self._prefix_adds(winT)
        # record in pixel-major order: (M, k^2-1)
        left = PointW(*(jnp.swapaxes(c[:-1], 0, 1) for c in accs))
        right = PointW(*(jnp.swapaxes(c[1:], 0, 1) for c in winT))
        self.trace.record_adds(left, right)
        scale = fixed_point.pool_reciprocal_fixed(k)
        out = _signed_const_mul(final, np.full((final.x.shape[0],), scale, dtype=object))
        return PointW(*(c.reshape(OH, OW, 16) for c in out))

    def fc(self, P: PointW, weights: np.ndarray, bias: PointW, key: bytes):
        """Homomorphic fully-connected layer on a (n_in,) ciphertext half.

        weights: (n_in, n_out) integer matrix; bias: (n_out,) encrypted
        points.  Records: n_out bias adds, then n_in rLC mults by the
        rho-combined weight columns (exact integers, reference's Decimal
        path Server.py:226-250), then n_in-1 rLC adds."""
        n_in, n_out = weights.shape
        assert P.x.shape[0] == n_in

        # C[j] = sum_k W[k, j] * P[k]   (unrecorded)
        Pb = PointW(*(jnp.broadcast_to(c[:, None, :], (n_in, n_out, 16)) for c in P))
        terms = _signed_const_mul(Pb, weights)
        C = E2.psum_points(terms, axis=0)                      # (n_out,)

        # bias adds (recorded)
        self.trace.record_adds(C, bias)
        out = E2.padd(C, bias)

        # rLC left over C
        rho = pf_vector(key, n_out, self.prf_trunc_bytes)
        rho_bits = scalars_to_bits(rho, 8 * self.prf_trunc_bytes)
        left = E2.psum_points(E2.pscalar_mul_bits(C, rho_bits), axis=0)

        # Combined column weights, exact integer arithmetic (reference
        # Decimal path, Server.py:226-250).  Signed fixed-point weights
        # make the combination signed; the reference would export the raw
        # signed/overflowing decimal string and panic its own u128 loader
        # (load_data.rs:21-23), so we record the sign-folded witness
        # (sign(s)*P, |s|) — homomorphically identical (s*P == |s|*(-P)
        # for s<0) and u128/n=128 gadget compatible.  If |s| still
        # overflows 128 bits (possible for wide FC layers), reduce mod the
        # E2 *group order* q (the scalar ring the points actually live in)
        # and let the prover pick the 253-bit mult gadget.
        s = [sum(int(rho[j]) * int(weights[kk, j]) for j in range(n_out))
             for kk in range(n_in)]
        from ..curve.host_ec import E2_ORDER
        s_rec = []
        neg = np.zeros((n_in,), dtype=bool)
        for i, v in enumerate(s):
            if abs(v) < (1 << 128):
                neg[i] = v < 0
                s_rec.append(abs(v))
            else:
                s_rec.append(v % E2_ORDER)
        P_eff = E2.pselect(neg, E2.pneg(P), P) if neg.any() else P
        n_bits = max(1, max(v.bit_length() for v in s_rec))
        temp = E2.pscalar_mul_bits(P_eff, scalars_to_bits(s_rec, n_bits))
        self.trace.record_mults(P_eff, s_rec)
        right = self._record_chain(temp)

        self.pending_checks.append(E2.peq(left, right))
        return out

    # ------------------------------------------------------------------

    def flush_checks(self):
        """Synchronize all queued rLC equality checks; raise on mismatch."""
        oks = [bool(np.asarray(c).all()) for c in self.pending_checks]
        self.pending_checks = []
        if not all(oks):
            bad = [i for i, ok in enumerate(oks) if not ok]
            raise RLCCheckError(f"rLC verification failed for checks {bad}")
        return True


def channel_sum(channels: list) -> PointW:
    """Elementwise point-sum of a list of (H, W) ciphertext halves
    (LeNet conv2/conv3 input aggregation, reference LeNet/Server.py:545-551;
    unrecorded)."""
    stacked = PointW(*(jnp.stack([c[i] for c in channels], axis=0)
                       for i in range(3)))
    return E2.psum_points(stacked, axis=0)
