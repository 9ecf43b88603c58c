"""Batched grand-product / dot-product circuits (SPARK's GKR-style layer).

TPU-native counterpart of Spartan's product_tree.rs: all same-shape
circuits are held STACKED as (K, len, 16) device arrays, so each tree
layer and each sumcheck round evaluation is one fused batched kernel
instead of K separate scalar loops.  Transcript behavior replicates
ProductCircuitEvalProofBatched::prove/verify and
SumcheckInstanceProof::prove_cubic_batched bit-for-bit.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..field.prime_field import FQ, L_MODULUS as L
from ..poly.dense import eq_evals, eq_evals_host, ints_to_dev


def _is_host(x) -> bool:
    return isinstance(x, np.ndarray) and x.dtype == object


def _layer_step_h(left, right):
    prod = left * right % L
    n = prod.shape[1] // 2
    return prod[:, :n], prod[:, n:]


def _round_evals_cubic_batched_h(A, B, C):
    n = A.shape[1] // 2
    halves = [(t[:, :n], t[:, n:]) for t in (A, B, C)]
    los = [lo for lo, _ in halves]
    e0 = (los[0] * los[1] % L * los[2]).sum(axis=1) % L
    b2 = [(2 * hi - lo) % L for lo, hi in halves]
    e2 = (b2[0] * b2[1] % L * b2[2]).sum(axis=1) % L
    b3 = [(v + hi - lo) % L for v, (lo, hi) in zip(b2, halves)]
    e3 = (b3[0] * b3[1] % L * b3[2]).sum(axis=1) % L
    return e0, e2, e3


def _bound_top_batched_h(Z, r: int):
    n = Z.shape[1] // 2
    lo, hi = Z[:, :n], Z[:, n:]
    return (lo + r * (hi - lo)) % L


def _ints_h(arr) -> List[int]:
    return [int(v) % L for v in np.asarray(arr).reshape(-1)]
from ..sumcheck.sumcheck import UniPoly
from ..transcript.merlin import Transcript
from ..utils.errors import verify_guard


@jax.jit
def _layer_step(left, right):
    """One product-tree layer: (K, 2n) values -> (K, n) left/right halves
    of the next layer (reference ProductCircuit::compute_layer)."""
    prod = FQ.mul(left, right)                 # (K, n)
    n = prod.shape[1] // 2
    return prod[:, :n], prod[:, n:]


@jax.jit
def _round_evals_cubic_batched(A, B, C):
    """Per-instance cubic round evals over stacked tables (K, len, 16);
    returns e0, e2, e3 each (K, 16)."""
    n = A.shape[1] // 2

    def comb(a, b, c):
        return FQ.mul(FQ.mul(a, b), c)

    halves = [(t[:, :n], t[:, n:]) for t in (A, B, C)]
    e0 = FQ.sum_reduce(comb(*(lo for lo, _ in halves)), axis=1)
    b2 = [FQ.sub(FQ.add(hi, hi), lo) for lo, hi in halves]
    e2 = FQ.sum_reduce(comb(*b2), axis=1)
    b3 = [FQ.add(v, FQ.sub(hi, lo)) for v, (lo, hi) in zip(b2, halves)]
    e3 = FQ.sum_reduce(comb(*b3), axis=1)
    return e0, e2, e3


@jax.jit
def _bound_top_batched(Z, r_dev):
    n = Z.shape[1] // 2
    lo, hi = Z[:, :n], Z[:, n:]
    return FQ.add(lo, FQ.mul(jnp.broadcast_to(r_dev, lo.shape), FQ.sub(hi, lo)))


def _ints(arr) -> List[int]:
    return [int(v) for v in FQ.from_mont(arr).reshape(-1)]


# fixed-shape masked round kernels: `half` is a runtime scalar so ONE
# compiled kernel serves every round of a layer (cf. sumcheck/sumcheck.py)
_COMPACT_FACTOR = 16


#: bound on K * chunk elements per fused round computation — big fused
#: (K, n, 16) HLO temps get 8x lane padding on TPU (see sumcheck.py)
_TREE_CHUNK_ELEMS = 1 << 18


def _tree_chunk(K: int, n_phys: int) -> int:
    C = max(_TREE_CHUNK_ELEMS // max(K, 1), 1)
    c = 1
    while c * 2 <= C:
        c *= 2
    return min(c, max(n_phys // 2, 1))


@functools.lru_cache(maxsize=None)
def _masked_round3_kernel(K: int, n_phys: int):
    def comb(a, b, c):
        return FQ.mul(FQ.mul(a, b), c)

    def evals(halves):
        e0 = FQ.sum_reduce(comb(*(lo for lo, _ in halves)), axis=1)
        b2 = [FQ.sub(FQ.add(hi, hi), lo) for lo, hi in halves]
        e2 = FQ.sum_reduce(comb(*b2), axis=1)
        b3 = [FQ.add(v, FQ.sub(hi, lo)) for v, (lo, hi) in zip(b2, halves)]
        e3 = FQ.sum_reduce(comb(*b3), axis=1)
        return e0, e2, e3

    C = _tree_chunk(K, n_phys)

    def run(half, A, B, Cc):
        if n_phys // 2 <= C:
            idx = jnp.arange(n_phys)
            m = (idx < half)[None, :, None]
            halves = [(jnp.where(m, t, jnp.uint32(0)),
                       jnp.where(m, jnp.roll(t, -half, axis=1),
                                 jnp.uint32(0))) for t in (A, B, Cc)]
            return evals(halves)

        k = (n_phys // 2) // C
        starts = jnp.arange(k) * C

        def body(carry, s):
            m = ((s + jnp.arange(C)) < half)[None, :, None]
            halves = [(jnp.where(m, jax.lax.dynamic_slice_in_dim(
                          t, s, C, axis=1), jnp.uint32(0)),
                       jnp.where(m, jax.lax.dynamic_slice_in_dim(
                          t, s + half, C, axis=1), jnp.uint32(0)))
                      for t in (A, B, Cc)]
            e = evals(halves)
            return tuple(FQ.add(x, y) for x, y in zip(carry, e)), None

        init = tuple(FQ.zeros((K,)) for _ in range(3))
        out, _ = jax.lax.scan(body, init, starts)
        return out

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _masked_bind3_kernel(K: int, n_phys: int):
    C = _tree_chunk(K, n_phys)

    def run(half, r_mont, A, B, Cc):
        if n_phys // 2 <= C:
            idx = jnp.arange(n_phys)
            m = (idx < half)[None, :, None]
            outs = []
            for t in (A, B, Cc):
                hi = jnp.roll(t, -half, axis=1)
                b = FQ.add(t, FQ.mul(jnp.broadcast_to(r_mont, t.shape),
                                     FQ.sub(hi, t)))
                outs.append(jnp.where(m, b, jnp.uint32(0)))
            return tuple(outs)

        k = (n_phys // 2) // C
        starts = jnp.arange(k) * C

        def body(_, s):
            m = ((s + jnp.arange(C)) < half)[None, :, None]
            outs = []
            for t in (A, B, Cc):
                lo = jax.lax.dynamic_slice_in_dim(t, s, C, axis=1)
                hi = jax.lax.dynamic_slice_in_dim(t, s + half, C, axis=1)
                b = FQ.add(lo, FQ.mul(jnp.broadcast_to(r_mont, lo.shape),
                                      FQ.sub(hi, lo)))
                outs.append(jnp.where(m, b, jnp.uint32(0)))
            return 0, tuple(outs)

        _, chunks = jax.lax.scan(body, 0, starts)   # each (k, K, C, 16)
        outs = []
        zero_top = jnp.zeros((K, n_phys - k * C, 16), jnp.uint32)
        for c in chunks:
            full = jnp.concatenate(
                [jnp.moveaxis(c, 0, 1).reshape(K, k * C, 16), zero_top],
                axis=1)
            outs.append(full)
        return tuple(outs)

    return jax.jit(run)


class _MaskedTriple:
    """(A, B, C) stacked tables bound via fixed-shape masked kernels."""

    def __init__(self, A, B, C):
        self.t = (A, B, C)
        self.live = A.shape[1]

    def round_evals(self):
        K, n_phys = self.t[0].shape[0], self.t[0].shape[1]
        return _masked_round3_kernel(K, n_phys)(
            jnp.int32(self.live // 2), *self.t)

    def bind(self, r_mont):
        K, n_phys = self.t[0].shape[0], self.t[0].shape[1]
        self.t = _masked_bind3_kernel(K, n_phys)(
            jnp.int32(self.live // 2), r_mont, *self.t)
        self.live //= 2
        if self.live >= 1 and self.live * _COMPACT_FACTOR <= n_phys:
            self.t = tuple(x[:, :self.live] for x in self.t)

    def heads(self):
        return [t[:, 0] for t in self.t]


#: above this many elements the stacked circuits recompute layers from
#: the leaves on demand instead of storing the whole layer stack — the
#: stack is 2x the leaves in HBM, and at LeNet-layer scale (12 circuits
#: x 2^21 leaves) that is the difference between fitting one chip or not.
#: Recompute is cheap: layer i costs ~2*K*n muls, trivial at device rates.
LOW_MEMORY_ELEMS = int(os.environ.get("VPIN_TREE_LOW_MEM", str(1 << 24)))


class BatchedProductCircuits:
    """K product circuits over equal-length inputs, layers stacked."""

    def __init__(self, inputs):
        """inputs: (K, n, 16) device array OR (K, n) host object array of
        hashed leaf values, n a power of two."""
        self.host = _is_host(inputs)
        K, n = inputs.shape[0], inputs.shape[1]
        self.K, self.n = K, n
        self.num_layers = n.bit_length() - 1
        self.low_memory = (not self.host) and K * n > LOW_MEMORY_ELEMS
        if self.low_memory:
            self.inputs = inputs
            self.left_layers = _LazyLayers(self, 0)
            self.right_layers = _LazyLayers(self, 1)
            return
        self.left_layers: List = []
        self.right_layers: List = []
        left, right = inputs[:, : n // 2], inputs[:, n // 2:]
        self.left_layers.append(left)
        self.right_layers.append(right)
        step = _layer_step_h if self.host else _layer_step
        for _ in range(self.num_layers - 1):
            left, right = step(self.left_layers[-1], self.right_layers[-1])
            self.left_layers.append(left)
            self.right_layers.append(right)

    def _layer(self, i: int):
        """(left, right) of layer i, recomputed from the leaves."""
        n = self.n
        left, right = self.inputs[:, : n // 2], self.inputs[:, n // 2:]
        for _ in range(i):
            left, right = _layer_step(left, right)
        return left, right

    def evaluate(self) -> List[int]:
        if self.low_memory:
            left, right = self._layer(self.num_layers - 1)
            return _ints(FQ.mul(left[:, 0], right[:, 0]))
        if self.host:
            return [int(l * r % L) for l, r in
                    zip(self.left_layers[-1][:, 0], self.right_layers[-1][:, 0])]
        prod = FQ.mul(self.left_layers[-1][:, 0], self.right_layers[-1][:, 0])
        return _ints(prod)


class _LazyLayers:
    """List-like view over recomputed layers (side=0 left, 1 right)."""

    def __init__(self, circ: "BatchedProductCircuits", side: int):
        self.circ = circ
        self.side = side

    def __len__(self):
        return self.circ.num_layers

    def __getitem__(self, i: int):
        return self.circ._layer(i)[self.side]


@dataclass
class BatchedDotProducts:
    """K2 dot-product circuits (left*right*weight summed), stacked."""
    left: object      # (K2, m, 16) device or (K2, m) host object array
    right: object
    weight: object

    def evaluate(self) -> List[int]:
        if _is_host(self.left):
            return [int(v) for v in
                    (self.left * self.right % L * self.weight).sum(axis=1) % L]
        s = FQ.sum_reduce(FQ.mul(FQ.mul(self.left, self.right), self.weight),
                          axis=1)
        return _ints(s)

    @property
    def k(self):
        return self.left.shape[0]


@dataclass
class LayerProofBatched:
    compressed_polys: List[List[int]]   # SumcheckInstanceProof rounds
    claims_prod_left: List[int]
    claims_prod_right: List[int]


@dataclass
class ProductCircuitEvalProofBatched:
    proof: List[LayerProofBatched]
    claims_dotp: Tuple[List[int], List[int], List[int]]

    @staticmethod
    def prove(prod: BatchedProductCircuits,
              dotp: Optional[BatchedDotProducts],
              transcript: Transcript):
        claims_dotp_final: Tuple[List[int], List[int], List[int]] = ([], [], [])
        proof_layers: List[LayerProofBatched] = []
        num_layers = len(prod.left_layers)
        claims_to_verify = prod.evaluate()
        rand: List[int] = []

        # mutable working copies of the stacked layer tables
        for layer_id in reversed(range(num_layers)):
            host = prod.host
            A = prod.left_layers[layer_id]
            B = prod.right_layers[layer_id]
            length = 2 * A.shape[1]
            if host:
                ch = eq_evals_host(rand)
                C_shared = np.empty((len(ch),), dtype=object)
                C_shared[:] = ch
            else:
                C_shared = eq_evals(rand)               # (len/2, 16)
            assert C_shared.shape[0] == length // 2
            num_rounds = (length // 2).bit_length() - 1

            seq_active = layer_id == 0 and dotp is not None and dotp.k > 0
            if seq_active:
                claims_to_verify = claims_to_verify + dotp.evaluate()
                seqA, seqB, seqC = dotp.left, dotp.right, dotp.weight

            coeffs = transcript.challenge_vector(b"rand_coeffs_next_layer",
                                                 len(claims_to_verify))
            e = sum(c * v for c, v in zip(coeffs, claims_to_verify)) % L

            polys: List[List[int]] = []
            r_prod: List[int] = []
            if host:
                Cb = np.broadcast_to(C_shared[None], A.shape)
            else:
                Cb = jnp.broadcast_to(C_shared[None], A.shape)
                trip = _MaskedTriple(A, B, Cb)
                seqt = (_MaskedTriple(seqA, seqB, seqC)
                        if seq_active else None)
            for _ in range(num_rounds):
                if host:
                    e0v, e2v, e3v = _round_evals_cubic_batched_h(A, B, Cb)
                    e0s, e2s, e3s = _ints_h(e0v), _ints_h(e2v), _ints_h(e3v)
                    if seq_active:
                        f0, f2, f3 = _round_evals_cubic_batched_h(
                            seqA, seqB, seqC)
                        e0s += _ints_h(f0)
                        e2s += _ints_h(f2)
                        e3s += _ints_h(f3)
                else:
                    e0v, e2v, e3v = trip.round_evals()
                    e0s, e2s, e3s = _ints(e0v), _ints(e2v), _ints(e3v)
                    if seq_active:
                        f0, f2, f3 = seqt.round_evals()
                        e0s += _ints(f0)
                        e2s += _ints(f2)
                        e3s += _ints(f3)
                ec0 = sum(c * v for c, v in zip(coeffs, e0s)) % L
                ec2 = sum(c * v for c, v in zip(coeffs, e2s)) % L
                ec3 = sum(c * v for c, v in zip(coeffs, e3s)) % L
                poly = UniPoly.from_evals([ec0, (e - ec0) % L, ec2, ec3])
                poly.append_to_transcript(b"poly", transcript)
                r_j = transcript.challenge_scalar(b"challenge_nextround")
                r_prod.append(r_j)
                if host:
                    A = _bound_top_batched_h(A, r_j)
                    B = _bound_top_batched_h(B, r_j)
                    Cb = _bound_top_batched_h(Cb, r_j)
                    if seq_active:
                        seqA = _bound_top_batched_h(seqA, r_j)
                        seqB = _bound_top_batched_h(seqB, r_j)
                        seqC = _bound_top_batched_h(seqC, r_j)
                else:
                    rdev = FQ.to_mont([r_j])[0]
                    trip.bind(rdev)
                    if seq_active:
                        seqt.bind(rdev)
                e = poly.evaluate(r_j)
                polys.append(poly.compress())

            if host:
                claims_prod_left = _ints_h(A[:, 0])
                claims_prod_right = _ints_h(B[:, 0])
            else:
                hA, hB, _ = trip.heads()
                claims_prod_left = _ints(hA)
                claims_prod_right = _ints(hB)
            for i in range(prod.K):
                transcript.append_scalar(b"claim_prod_left", claims_prod_left[i])
                transcript.append_scalar(b"claim_prod_right", claims_prod_right[i])

            if seq_active:
                if host:
                    cl = _ints_h(seqA[:, 0])
                    cr = _ints_h(seqB[:, 0])
                    cw = _ints_h(seqC[:, 0])
                else:
                    hl, hr, hw = seqt.heads()
                    cl = _ints(hl)
                    cr = _ints(hr)
                    cw = _ints(hw)
                for i in range(dotp.k):
                    transcript.append_scalar(b"claim_dotp_left", cl[i])
                    transcript.append_scalar(b"claim_dotp_right", cr[i])
                    transcript.append_scalar(b"claim_dotp_weight", cw[i])
                claims_dotp_final = (cl, cr, cw)

            r_layer = transcript.challenge_scalar(b"challenge_r_layer")
            claims_to_verify = [
                (claims_prod_left[i] + r_layer *
                 (claims_prod_right[i] - claims_prod_left[i])) % L
                for i in range(prod.K)]
            rand = [r_layer] + r_prod

            proof_layers.append(LayerProofBatched(
                polys, claims_prod_left, claims_prod_right))

        return (ProductCircuitEvalProofBatched(proof_layers, claims_dotp_final),
                rand)

    @verify_guard(failure=None)
    def verify(self, claims_prod_vec: List[int], claims_dotp_vec: List[int],
               length: int, transcript: Transcript):
        num_layers = length.bit_length() - 1
        rand: List[int] = []
        assert len(self.proof) == num_layers
        claims_to_verify = list(claims_prod_vec)
        claims_to_verify_dotp: List[int] = []
        for num_rounds, i in enumerate(range(num_layers)):
            if i == num_layers - 1:
                claims_to_verify = claims_to_verify + list(claims_dotp_vec)
            coeffs = transcript.challenge_vector(b"rand_coeffs_next_layer",
                                                 len(claims_to_verify))
            claim = sum(c * v for c, v in zip(coeffs, claims_to_verify)) % L

            # non-ZK sumcheck verify, degree 3
            e = claim
            r_prod: List[int] = []
            assert len(self.proof[i].compressed_polys) == num_rounds
            for comp in self.proof[i].compressed_polys:
                poly = UniPoly.decompress(comp, e)
                assert poly.degree == 3
                assert (poly.eval_at_zero() + poly.eval_at_one()) % L == e
                poly.append_to_transcript(b"poly", transcript)
                r_j = transcript.challenge_scalar(b"challenge_nextround")
                r_prod.append(r_j)
                e = poly.evaluate(r_j)
            claim_last = e

            cpl = self.proof[i].claims_prod_left
            cpr = self.proof[i].claims_prod_right
            assert len(cpl) == len(claims_prod_vec)
            for t in range(len(claims_prod_vec)):
                transcript.append_scalar(b"claim_prod_left", cpl[t])
                transcript.append_scalar(b"claim_prod_right", cpr[t])

            assert len(rand) == len(r_prod)
            eq = 1
            for a, b in zip(rand, r_prod):
                eq = eq * (a * b + (1 - a) * (1 - b)) % L
            claim_expected = sum(coeffs[t] * cpl[t] % L * cpr[t] % L * eq
                                 for t in range(len(claims_prod_vec))) % L

            if i == num_layers - 1:
                npi = len(claims_prod_vec)
                cdl, cdr, cdw = self.claims_dotp
                for t in range(len(cdl)):
                    transcript.append_scalar(b"claim_dotp_left", cdl[t])
                    transcript.append_scalar(b"claim_dotp_right", cdr[t])
                    transcript.append_scalar(b"claim_dotp_weight", cdw[t])
                    claim_expected = (claim_expected + coeffs[t + npi] *
                                      cdl[t] % L * cdr[t] % L * cdw[t]) % L

            if claim_expected % L != claim_last % L:
                raise AssertionError("product layer claim mismatch")

            r_layer = transcript.challenge_scalar(b"challenge_r_layer")
            claims_to_verify = [
                (cpl[t] + r_layer * (cpr[t] - cpl[t])) % L
                for t in range(len(cpl))]
            if i == num_layers - 1:
                cdl, cdr, cdw = self.claims_dotp
                for t in range(len(claims_dotp_vec) // 2):
                    claims_to_verify_dotp.append(
                        (cdl[2 * t] + r_layer * (cdl[2 * t + 1] - cdl[2 * t])) % L)
                    claims_to_verify_dotp.append(
                        (cdr[2 * t] + r_layer * (cdr[2 * t + 1] - cdr[2 * t])) % L)
                    claims_to_verify_dotp.append(
                        (cdw[2 * t] + r_layer * (cdw[2 * t + 1] - cdw[2 * t])) % L)
            rand = [r_layer] + r_prod
        return claims_to_verify, claims_to_verify_dotp, rand

    def size(self) -> int:
        s = 8
        for lp in self.proof:
            s += 8
            for comp in lp.compressed_polys:
                s += 8 + 32 * len(comp)
            s += 2 * (8 + 32 * len(lp.claims_prod_left))
        s += 3 * 8 + 32 * sum(len(x) for x in self.claims_dotp)
        return s
