"""Sumcheck provers/verifiers — ZK (used by the two R1CS sumchecks) and
non-ZK (used inside SPARK's product circuits).

Per-round evaluation sums run as fused batched device kernels over the
halved eval tables (one jit per table size, persistent-cached); the
per-round protocol logic (UniPoly interpolation, Pedersen commitment,
DotProductProof) is exact host arithmetic.  Mirrors
Spartan/src/sumcheck.rs and unipoly.rs bit-for-bit on the transcript.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field.prime_field import FQ, L_MODULUS as L
from ..poly.dense import DensePoly
from ..transcript.merlin import Transcript, RandomTape
from ..utils.errors import verify_guard
from ..curve.rpoint import RPoint, msm_host
from ..nizk.sigma import (
    DotProductProof, append_scalars_vector, commit1, commitN,
)
from ..utils.checkpoint import ROUNDS_PER_CHECKPOINT

_INV2 = pow(2, -1, L)
_INV6 = pow(6, -1, L)


# ----------------------------------------------------------------------
# UniPoly (reference: Spartan/src/unipoly.rs)
# ----------------------------------------------------------------------

class UniPoly:
    """Degree-2/3 univariate poly; coeffs low-to-high, host ints."""

    def __init__(self, coeffs: List[int]):
        self.coeffs = [c % L for c in coeffs]

    @staticmethod
    def from_evals(evals: Sequence[int]) -> "UniPoly":
        e = [x % L for x in evals]
        if len(e) == 3:
            c = e[0]
            a = _INV2 * (e[2] - e[1] - e[1] + c) % L
            b = (e[1] - c - a) % L
            return UniPoly([c, b, a])
        assert len(e) == 4
        d = e[0]
        a = _INV6 * (e[3] - 3 * e[2] + 3 * e[1] - e[0]) % L
        b = _INV2 * (2 * e[0] - 5 * e[1] + 4 * e[2] - e[3]) % L
        c = (e[1] - d - a - b) % L
        return UniPoly([d, c, b, a])

    @property
    def degree(self) -> int:
        return len(self.coeffs) - 1

    def eval_at_zero(self) -> int:
        return self.coeffs[0]

    def eval_at_one(self) -> int:
        return sum(self.coeffs) % L

    def evaluate(self, r: int) -> int:
        acc, power = self.coeffs[0], r
        for c in self.coeffs[1:]:
            acc = (acc + power * c) % L
            power = power * r % L
        return acc

    def compress(self) -> List[int]:
        """coeffs except the linear term (reference proof-size trick)."""
        return [self.coeffs[0]] + self.coeffs[2:]

    @staticmethod
    def decompress(compressed: Sequence[int], hint: int) -> "UniPoly":
        linear = (hint - 2 * compressed[0] - sum(compressed[1:])) % L
        return UniPoly([compressed[0], linear] + list(compressed[1:]))

    def append_to_transcript(self, label: bytes, t: Transcript) -> None:
        t.append_message(label, b"UniPoly_begin")
        for c in self.coeffs:
            t.append_scalar(b"coeff", c)
        t.append_message(label, b"UniPoly_end")

    def commit(self, gens, blind: int) -> RPoint:
        return commitN(self.coeffs, blind, gens)


# ----------------------------------------------------------------------
# device round kernels
# ----------------------------------------------------------------------

def _quad_partials(los, his):
    """Partial sums of the quad combinator over one table shard."""
    Al, Bl = los
    Ah, Bh = his
    e0 = FQ.sum_reduce(FQ.mul(Al, Bl))
    A2 = FQ.sub(FQ.add(Ah, Ah), Al)
    B2 = FQ.sub(FQ.add(Bh, Bh), Bl)
    e2 = FQ.sum_reduce(FQ.mul(A2, B2))
    return (e0, e2)


def _cubic_additive_partials(los, his):
    """comb(a,b,c,d) = a*(b*c - d) — phase-one outer combinator
    (reference r1csproof.rs:104-110)."""
    def comb(a, b, c, d):
        return FQ.mul(a, FQ.sub(FQ.mul(b, c), d))

    e0 = FQ.sum_reduce(comb(*los))
    b2 = [FQ.sub(FQ.add(hi, hi), lo) for lo, hi in zip(los, his)]
    e2 = FQ.sum_reduce(comb(*b2))
    b3 = [FQ.add(v, FQ.sub(hi, lo)) for v, lo, hi in zip(b2, los, his)]
    e3 = FQ.sum_reduce(comb(*b3))
    return (e0, e2, e3)


def _cubic_partials(los, his):
    """comb(a,b,c) = a*b*c (SPARK product-layer combinator)."""
    e0 = FQ.sum_reduce(FQ.mul(FQ.mul(los[0], los[1]), los[2]))
    b2 = [FQ.sub(FQ.add(hi, hi), lo) for lo, hi in zip(los, his)]
    e2 = FQ.sum_reduce(FQ.mul(FQ.mul(b2[0], b2[1]), b2[2]))
    b3 = [FQ.add(v, FQ.sub(hi, lo)) for v, lo, hi in zip(b2, los, his)]
    e3 = FQ.sum_reduce(FQ.mul(FQ.mul(b3[0], b3[1]), b3[2]))
    return (e0, e2, e3)


ROUND_CHUNK = 1 << 17   # elements per streamed chunk (bounds HBM peaks)


def _jit_rounds(partial_fn, n_tables):
    def run(*tables):
        n = tables[0].shape[0] // 2
        los = tuple(t[:n] for t in tables)
        his = tuple(t[n:] for t in tables)
        if n <= ROUND_CHUNK:
            return partial_fn(los, his)
        # stream the half-tables in chunks; partial sums combine mod l
        k = n // ROUND_CHUNK
        resh = tuple(t.reshape(k, ROUND_CHUNK, 16) for t in los + his)

        def body(carry, xs):
            evs = partial_fn(xs[:n_tables], xs[n_tables:])
            return tuple(FQ.add(c, e) for c, e in zip(carry, evs)), None

        n_evals = 2 if n_tables == 2 else 3
        init = tuple(FQ.zeros(()) for _ in range(n_evals))
        out, _ = jax.lax.scan(body, init, resh)
        return out
    return jax.jit(run)


_ROUND_JIT = {
    "quad": _jit_rounds(_quad_partials, 2),
    "cubic_additive": _jit_rounds(_cubic_additive_partials, 4),
    "cubic": _jit_rounds(_cubic_partials, 3),
}
_ROUND_PARTIALS = {
    "quad": _quad_partials,
    "cubic_additive": _cubic_additive_partials,
    "cubic": _cubic_partials,
}


def _round_evals(kind: str, *tables):
    """Round eval sums: sharded over the active mesh when one is set
    (parallel/ops.py), single-device jit otherwise — bit-identical."""
    from ..parallel.ops import sharded_round_evals
    out = sharded_round_evals(_ROUND_PARTIALS[kind], tables)
    if out is None:
        out = _ROUND_JIT[kind](*tables)
    return out


def _round_evals_host(kind: str, polys) -> List[int]:
    """Host-int round evals over small tables (bit-identical to the
    device kernels; everything is exact arithmetic mod l)."""
    tabs = [p.Zh for p in polys]
    n = len(tabs[0]) // 2
    los = [t[:n] for t in tabs]
    his = [t[n:] for t in tabs]
    if kind == "quad":
        Al, Bl = los
        Ah, Bh = his
        e0 = sum(a * b % L for a, b in zip(Al, Bl)) % L
        e2 = sum((2 * ah - al) * (2 * bh - bl) % L
                 for al, ah, bl, bh in zip(Al, Ah, Bl, Bh)) % L
        return [e0, e2]
    if kind == "cubic":
        e0 = e2 = e3 = 0
        for i in range(n):
            a, b, c = los[0][i], los[1][i], los[2][i]
            e0 += a * b % L * c
            a2, b2, c2 = (2 * h - l for l, h in
                          ((los[j][i], his[j][i]) for j in range(3)))
            e2 += a2 * b2 % L * c2
            a3, b3, c3 = (v + h - l for v, l, h in
                          ((x, los[j][i], his[j][i])
                           for j, x in enumerate((a2, b2, c2))))
            e3 += a3 * b3 % L * c3
        return [e0 % L, e2 % L, e3 % L]
    assert kind == "cubic_additive"
    e0 = e2 = e3 = 0
    for i in range(n):
        v0 = [los[j][i] for j in range(4)]
        e0 += v0[0] * (v0[1] * v0[2] - v0[3]) % L
        v2 = [2 * his[j][i] - los[j][i] for j in range(4)]
        e2 += v2[0] * (v2[1] * v2[2] - v2[3]) % L
        v3 = [v2[j] + his[j][i] - los[j][i] for j in range(4)]
        e3 += v3[0] * (v3[1] * v3[2] - v3[3]) % L
    return [e0 % L, e2 % L, e3 % L]


def _round_evals_quad(A, B):
    return _round_evals("quad", A, B)


def _round_evals_cubic_additive(A, B, C, D):
    return _round_evals("cubic_additive", A, B, C, D)


def _round_evals_cubic(A, B, C):
    return _round_evals("cubic", A, B, C)


_ROUND_JIT_DISPATCH = {
    "quad": _round_evals_quad,
    "cubic_additive": _round_evals_cubic_additive,
}


# ----------------------------------------------------------------------
# fixed-shape masked round kernels (single-device path)
#
# XLA compiles one executable per input shape; naively each sumcheck
# round halves the tables and forces a fresh compile.  Instead the
# tables keep a fixed physical length with the live prefix [0, 2*half)
# and zero-padding beyond; `half` is a runtime scalar, so ONE compiled
# kernel serves every round.  Tables compact 16x when the live region
# shrinks enough, bounding wasted lanes at ~7% while keeping the number
# of distinct shapes at ceil(rounds/4).
# ----------------------------------------------------------------------

_COMPACT_FACTOR = 16


@functools.lru_cache(maxsize=None)
def _masked_round_kernel(kind: str, n_phys: int, n_tables: int):
    partial_fn = _ROUND_PARTIALS[kind]
    n_evals = 2 if n_tables == 2 else 3
    C = min(ROUND_CHUNK, max(n_phys // 2, 1))

    def run(half, *tables):
        if n_phys // 2 <= C:
            idx = jnp.arange(n_phys)
            m = (idx < half)[:, None]
            los = tuple(jnp.where(m, t, jnp.uint32(0)) for t in tables)
            his = tuple(jnp.where(m, jnp.roll(t, -half, axis=0),
                                  jnp.uint32(0)) for t in tables)
            return jnp.stack(partial_fn(los, his), axis=0)

        # stream in C-sized chunks: big fused round computations otherwise
        # materialize (n_phys, 16) HLO temps that XLA pads 8x (16 -> 128
        # lanes), OOMing 2^20-class tables.  lo chunk = t[s : s+C], hi
        # chunk = t[s+half : s+half+C] (safe: s <= n_phys/2 - C and
        # half <= n_phys/2, so s+half+C <= n_phys); chunks beyond `half`
        # are fully masked and contribute zero.
        k = (n_phys // 2) // C
        starts = jnp.arange(k) * C

        def body(carry, s):
            m = ((s + jnp.arange(C)) < half)[:, None]
            los = tuple(jnp.where(
                m, jax.lax.dynamic_slice_in_dim(t, s, C, axis=0),
                jnp.uint32(0)) for t in tables)
            his = tuple(jnp.where(
                m, jax.lax.dynamic_slice_in_dim(t, s + half, C, axis=0),
                jnp.uint32(0)) for t in tables)
            evs = partial_fn(los, his)
            return tuple(FQ.add(c, e) for c, e in zip(carry, evs)), None

        init = tuple(FQ.zeros(()) for _ in range(n_evals))
        out, _ = jax.lax.scan(body, init, starts)
        return jnp.stack(out, axis=0)

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _masked_bind_kernel(n_phys: int, n_tables: int):
    C = min(ROUND_CHUNK, max(n_phys // 2, 1))

    def run(half, r_mont, *tables):
        if n_phys // 2 <= C:
            idx = jnp.arange(n_phys)
            m = (idx < half)[:, None]
            outs = []
            for t in tables:
                hi = jnp.roll(t, -half, axis=0)
                b = FQ.add(t, FQ.mul(jnp.broadcast_to(r_mont, t.shape),
                                     FQ.sub(hi, t)))
                outs.append(jnp.where(m, b, jnp.uint32(0)))
            return tuple(outs)

        # chunked bind (same temp-padding rationale as the round kernel);
        # the bound live region is [0, half) subset [0, n_phys/2), so the
        # top half of the output is always zero.
        k = (n_phys // 2) // C
        starts = jnp.arange(k) * C

        def body(_, s):
            m = ((s + jnp.arange(C)) < half)[:, None]
            outs = []
            for t in tables:
                lo = jax.lax.dynamic_slice_in_dim(t, s, C, axis=0)
                hi = jax.lax.dynamic_slice_in_dim(t, s + half, C, axis=0)
                b = FQ.add(lo, FQ.mul(jnp.broadcast_to(r_mont, lo.shape),
                                      FQ.sub(hi, lo)))
                outs.append(jnp.where(m, b, jnp.uint32(0)))
            return 0, tuple(outs)

        _, chunks = jax.lax.scan(body, 0, starts)   # each (k, C, 16)
        zero_top = jnp.zeros((n_phys - k * C, 16), jnp.uint32)
        return tuple(jnp.concatenate(
            [c.reshape(k * C, 16), zero_top], axis=0) for c in chunks)

    return jax.jit(run)


def _to_int(x) -> int:
    return int(FQ.from_mont(x))


# ----------------------------------------------------------------------
# non-ZK sumcheck (SumcheckInstanceProof)
# ----------------------------------------------------------------------

@dataclass
class SumcheckInstanceProof:
    compressed_polys: List[List[int]]

    @verify_guard(failure=None)
    def verify(self, claim: int, num_rounds: int, degree_bound: int,
               transcript: Transcript) -> Tuple[int, List[int]]:
        e = claim % L
        r: List[int] = []
        assert len(self.compressed_polys) == num_rounds
        for comp in self.compressed_polys:
            poly = UniPoly.decompress(comp, e)
            assert poly.degree == degree_bound
            assert (poly.eval_at_zero() + poly.eval_at_one()) % L == e
            poly.append_to_transcript(b"poly", transcript)
            r_i = transcript.challenge_scalar(b"challenge_nextround")
            r.append(r_i)
            e = poly.evaluate(r_i)
        return e, r

    @staticmethod
    def prove_cubic(claim: int, num_rounds: int,
                    poly_A: DensePoly, poly_B: DensePoly, poly_C: DensePoly,
                    transcript: Transcript):
        e = claim % L
        r: List[int] = []
        polys: List[List[int]] = []
        for _ in range(num_rounds):
            if poly_A.is_host:
                e0, e2, e3 = _round_evals_host(
                    "cubic", (poly_A, poly_B, poly_C))
            else:
                e0, e2, e3 = (_to_int(v) for v in
                              _round_evals_cubic(poly_A.Z, poly_B.Z, poly_C.Z))
            poly = UniPoly.from_evals([e0, (e - e0) % L, e2, e3])
            poly.append_to_transcript(b"poly", transcript)
            r_j = transcript.challenge_scalar(b"challenge_nextround")
            r.append(r_j)
            for p in (poly_A, poly_B, poly_C):
                p.bound_poly_var_top(r_j)
            e = poly.evaluate(r_j)
            polys.append(poly.compress())
        claims = [poly_A.index(0), poly_B.index(0), poly_C.index(0)]
        return SumcheckInstanceProof(polys), r, claims


# ----------------------------------------------------------------------
# ZK sumcheck (ZKSumcheckInstanceProof)
# ----------------------------------------------------------------------

@dataclass
class ZKSumcheckInstanceProof:
    comm_polys: List[bytes]
    comm_evals: List[bytes]
    proofs: List[DotProductProof]

    @verify_guard(failure=None)
    def verify(self, comm_claim: bytes, num_rounds: int, degree_bound: int,
               gens_1, gens_n, transcript: Transcript, acc=None):
        """Deferred batch verification: all proof points are decoded in
        ONE batched call; each round materializes only the combined-claim
        commitment the transcript needs (one fused device call) and
        defers its group equations into `acc`."""
        from ..batch_verify import VerifyAccumulator, combine_compress
        from ..curve.rpoint import decompress_many
        local = acc is None
        if local:
            acc = VerifyAccumulator()
        assert gens_n.n == degree_bound + 1
        assert len(self.comm_polys) == num_rounds
        assert len(self.comm_evals) == num_rounds
        assert len(self.proofs) == num_rounds

        # one batched decode of every claim/eval point this proof touches
        chain = [bytes(comm_claim)] + [bytes(b) for b in self.comm_evals]
        chain_pts = decompress_many(chain)

        r: List[int] = []
        for i in range(num_rounds):
            comm_poly = self.comm_polys[i]
            transcript.append_point(b"comm_poly", comm_poly)
            r_i = transcript.challenge_scalar(b"challenge_nextround")

            comm_claim_per_round = chain[i]
            comm_eval = self.comm_evals[i]
            transcript.append_point(b"comm_claim_per_round", comm_claim_per_round)
            transcript.append_point(b"comm_eval", comm_eval)
            w = transcript.challenge_vector(b"combine_two_claims_to_one", 2)

            comm_target = combine_compress(
                [chain_pts[i], chain_pts[i + 1]], w)

            a_sc = [1] * (degree_bound + 1)
            a_sc[0] = 2
            a_eval = [1]
            for _ in range(degree_bound):
                a_eval.append(a_eval[-1] * r_i % L)
            a = [(w[0] * a_sc[j] + w[1] * a_eval[j]) % L
                 for j in range(degree_bound + 1)]

            if not self.proofs[i].verify(gens_1, gens_n, transcript, a,
                                         comm_poly, comm_target, acc=acc):
                return None
            r.append(r_i)
        if local and not acc.check():
            return None
        return self.comm_evals[-1], r

    @staticmethod
    def _prove_rounds(claim, blind_claim, num_rounds, polys, kind,
                      gens_1, gens_n, transcript, tape,
                      ckpt=None, ckpt_key=""):
        """Shared round loop; kind in {'quad', 'cubic_additive'}.

        ckpt/ckpt_key: optional CheckpointStore — every
        ROUNDS_PER_CHECKPOINT rounds the sponge states + accumulated
        protocol artifacts are persisted; on resume the bound tables are
        rebuilt by replaying the recorded challenges (cheap elementwise
        binds; no table serialization)."""
        from ..parallel.mesh import get_mesh
        blinds_poly = tape.random_vector(b"blinds_poly", num_rounds)
        blinds_evals = tape.random_vector(b"blinds_evals", num_rounds)

        claim_per_round = claim % L
        comm_claim_per_round = commit1(claim_per_round, blind_claim, gens_1).compress()

        r: List[int] = []
        comm_polys: List[bytes] = []
        comm_evals: List[bytes] = []
        proofs: List[DotProductProof] = []

        host = polys[0].is_host
        # masked fixed-shape path: single device, no mesh (the mesh path
        # shards the per-size tables instead)
        masked = (not host) and get_mesh() is None
        tabs, n_phys, live = None, 0, 0
        if masked:
            tabs = tuple(p.Z for p in polys)
            n_phys = tabs[0].shape[0]
            live = n_phys

        def bind(r_j):
            nonlocal tabs, live, n_phys
            if masked:
                r_mont = FQ.to_mont([r_j])[0]
                tabs = _masked_bind_kernel(n_phys, len(tabs))(
                    jnp.int32(live // 2), r_mont, *tabs)
                live //= 2
                if live >= 1 and live * _COMPACT_FACTOR <= n_phys:
                    tabs = tuple(t[:live] for t in tabs)
                    n_phys = live
            else:
                for p in polys:
                    p.bound_poly_var_top(r_j)

        start_j = 0
        if ckpt is not None:
            snap = ckpt.load(ckpt_key)
            if snap is not None and snap["num_rounds"] == num_rounds:
                transcript.restore(snap["transcript"])
                tape.restore(snap["tape"])
                r = list(snap["r"])
                comm_polys = list(snap["comm_polys"])
                comm_evals = list(snap["comm_evals"])
                proofs = list(snap["proofs"])
                claim_per_round = snap["claim_per_round"]
                comm_claim_per_round = snap["comm_claim_per_round"]
                start_j = snap["j"]
                for r_j in r:              # replay binds to round start_j
                    bind(r_j)

        for j in range(start_j, num_rounds):
            if host:
                ev = _round_evals_host(kind, polys)
            elif masked:
                half = live // 2
                out = _masked_round_kernel(kind, n_phys, len(tabs))(
                    jnp.int32(half), *tabs)
                ev = [int(v) for v in FQ.from_mont(out)]
            else:
                ev = [_to_int(v) for v in _ROUND_JIT_DISPATCH[kind](
                    *(p.Z for p in polys))]
            if kind == "quad":
                e0, e2 = ev
                evals = [e0, (claim_per_round - e0) % L, e2]
            else:
                e0, e2, e3 = ev
                evals = [e0, (claim_per_round - e0) % L, e2, e3]
            poly = UniPoly.from_evals(evals)
            comm_poly = poly.commit(gens_n, blinds_poly[j]).compress()
            transcript.append_point(b"comm_poly", comm_poly)
            comm_polys.append(comm_poly)

            r_j = transcript.challenge_scalar(b"challenge_nextround")
            bind(r_j)

            eval_r = poly.evaluate(r_j)
            comm_eval = commit1(eval_r, blinds_evals[j], gens_1).compress()
            transcript.append_point(b"comm_claim_per_round", comm_claim_per_round)
            transcript.append_point(b"comm_eval", comm_eval)
            w = transcript.challenge_vector(b"combine_two_claims_to_one", 2)

            target = (w[0] * claim_per_round + w[1] * eval_r) % L
            blind_sc = blind_claim if j == 0 else blinds_evals[j - 1]
            blind = (w[0] * blind_sc + w[1] * blinds_evals[j]) % L

            a_sc = [1] * (poly.degree + 1)
            a_sc[0] = 2
            a_eval = [1]
            for _ in range(poly.degree):
                a_eval.append(a_eval[-1] * r_j % L)
            a = [(w[0] * a_sc[t] + w[1] * a_eval[t]) % L
                 for t in range(poly.degree + 1)]

            proof, _, _ = DotProductProof.prove(
                gens_1, gens_n, transcript, tape,
                poly.coeffs, blinds_poly[j], a, target, blind)

            proofs.append(proof)
            claim_per_round = eval_r
            comm_claim_per_round = comm_eval
            r.append(r_j)
            comm_evals.append(comm_eval)

            if ckpt is not None and ((j + 1) % ROUNDS_PER_CHECKPOINT == 0
                                     or j + 1 == num_rounds):
                ckpt.save(ckpt_key, {
                    "num_rounds": num_rounds, "j": j + 1,
                    "transcript": transcript.snapshot(),
                    "tape": tape.snapshot(),
                    "r": list(r), "comm_polys": list(comm_polys),
                    "comm_evals": list(comm_evals), "proofs": list(proofs),
                    "claim_per_round": claim_per_round,
                    "comm_claim_per_round": comm_claim_per_round,
                })

        if masked:
            claims = [int(v) for v in
                      FQ.from_mont(jnp.stack([t[0] for t in tabs]))]
        else:
            claims = [p.index(0) for p in polys]
        return (ZKSumcheckInstanceProof(comm_polys, comm_evals, proofs),
                r, claims, blinds_evals[num_rounds - 1])

    @staticmethod
    def prove_quad(claim, blind_claim, num_rounds, poly_A, poly_B,
                   gens_1, gens_n, transcript, tape,
                   ckpt=None, ckpt_key=""):
        return ZKSumcheckInstanceProof._prove_rounds(
            claim, blind_claim, num_rounds, [poly_A, poly_B], "quad",
            gens_1, gens_n, transcript, tape, ckpt=ckpt, ckpt_key=ckpt_key)

    @staticmethod
    def prove_cubic_with_additive_term(claim, blind_claim, num_rounds,
                                       poly_A, poly_B, poly_C, poly_D,
                                       gens_1, gens_n, transcript, tape,
                                       ckpt=None, ckpt_key=""):
        return ZKSumcheckInstanceProof._prove_rounds(
            claim, blind_claim, num_rounds, [poly_A, poly_B, poly_C, poly_D],
            "cubic_additive", gens_1, gens_n, transcript, tape,
            ckpt=ckpt, ckpt_key=ckpt_key)
