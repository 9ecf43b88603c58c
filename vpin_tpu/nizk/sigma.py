"""Sigma-protocol NIZKs over ristretto255 (Knowledge / Equality / Product /
DotProduct / DotProductLog) plus the Bulletproofs inner-product reduction.

Transcript labels and group equations replicate the reference exactly
(Spartan/src/nizk/mod.rs:17-584, nizk/bullet.rs:16-243); scalars are host
ints mod l, group ops run through the batched device kernels via RPoint.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

from ..field.prime_field import L_MODULUS as L
from ..curve.rpoint import RPoint, msm_host, compress_many, decompress_many
from ..transcript.merlin import Transcript, RandomTape
from ..utils.errors import verify_guard
from ..commit.pedersen import MultiCommitGens, commit_scalar, commit_vec_ints


def commit1(x: int, blind: int, gens: MultiCommitGens) -> RPoint:
    """x*G[0] + blind*h (gens.n == 1)."""
    return RPoint(commit_scalar(x, blind, gens))


def commitN(xs: Sequence[int], blind: int, gens: MultiCommitGens) -> RPoint:
    """<xs, G> + blind*h (gens.n == len(xs))."""
    return RPoint(commit_vec_ints(list(xs), blind, gens))


def append_scalars_vector(t: Transcript, label: bytes, v: Sequence[int]) -> None:
    """AppendToTranscript for [Scalar] (reference transcript.rs:57-66)."""
    t.append_message(label, b"begin_append_vector")
    for x in v:
        t.append_scalar(label, x)
    t.append_message(label, b"end_append_vector")


def dot_ints(a: Sequence[int], b: Sequence[int]) -> int:
    assert len(a) == len(b)
    return sum(x * y for x, y in zip(a, b)) % L


# ----------------------------------------------------------------------
# KnowledgeProof (nizk/mod.rs:17-76)
# ----------------------------------------------------------------------

@dataclass
class KnowledgeProof:
    alpha: bytes
    z1: int
    z2: int

    PROTOCOL = b"knowledge proof"

    @staticmethod
    def prove(gens_1, transcript, tape, x: int, r: int):
        transcript.append_protocol_name(KnowledgeProof.PROTOCOL)
        t1 = tape.random_scalar(b"t1")
        t2 = tape.random_scalar(b"t2")
        C = commit1(x, r, gens_1).compress()
        transcript.append_point(b"C", C)
        alpha = commit1(t1, t2, gens_1).compress()
        transcript.append_point(b"alpha", alpha)
        c = transcript.challenge_scalar(b"c")
        z1 = (x * c + t1) % L
        z2 = (r * c + t2) % L
        return KnowledgeProof(alpha, z1, z2), C

    @verify_guard(failure=False)
    def verify(self, gens_1, transcript, C: bytes) -> bool:
        transcript.append_protocol_name(KnowledgeProof.PROTOCOL)
        transcript.append_point(b"C", C)
        transcript.append_point(b"alpha", self.alpha)
        c = transcript.challenge_scalar(b"c")
        lhs = commit1(self.z1, self.z2, gens_1)
        rhs = RPoint.decompress(C).mul(c) + RPoint.decompress(self.alpha)
        return lhs.compress() == rhs.compress()


# ----------------------------------------------------------------------
# EqualityProof (nizk/mod.rs:80-146)
# ----------------------------------------------------------------------

@dataclass
class EqualityProof:
    alpha: bytes
    z: int

    PROTOCOL = b"equality proof"

    @staticmethod
    def prove(gens_1, transcript, tape, v1: int, s1: int, v2: int, s2: int):
        transcript.append_protocol_name(EqualityProof.PROTOCOL)
        r = tape.random_scalar(b"r")
        C1 = commit1(v1, s1, gens_1).compress()
        transcript.append_point(b"C1", C1)
        C2 = commit1(v2, s2, gens_1).compress()
        transcript.append_point(b"C2", C2)
        alpha = RPoint(gens_1.h).mul(r).compress()
        transcript.append_point(b"alpha", alpha)
        c = transcript.challenge_scalar(b"c")
        z = (c * (s1 - s2) + r) % L
        return EqualityProof(alpha, z), C1, C2

    @verify_guard(failure=False)
    def verify(self, gens_1, transcript, C1: bytes, C2: bytes) -> bool:
        transcript.append_protocol_name(EqualityProof.PROTOCOL)
        transcript.append_point(b"C1", C1)
        transcript.append_point(b"C2", C2)
        transcript.append_point(b"alpha", self.alpha)
        c = transcript.challenge_scalar(b"c")
        Cdiff = RPoint.decompress(C1) - RPoint.decompress(C2)
        rhs = Cdiff.mul(c) + RPoint.decompress(self.alpha)
        lhs = RPoint(gens_1.h).mul(self.z)
        return lhs.compress() == rhs.compress()


# ----------------------------------------------------------------------
# ProductProof (nizk/mod.rs:150-293)
# ----------------------------------------------------------------------

@dataclass
class ProductProof:
    alpha: bytes
    beta: bytes
    delta: bytes
    z: Tuple[int, int, int, int, int]

    PROTOCOL = b"product proof"

    @staticmethod
    def prove(gens_1, transcript, tape, x, rX, y, rY, zv, rZ):
        transcript.append_protocol_name(ProductProof.PROTOCOL)
        b1 = tape.random_scalar(b"b1")
        b2 = tape.random_scalar(b"b2")
        b3 = tape.random_scalar(b"b3")
        b4 = tape.random_scalar(b"b4")
        b5 = tape.random_scalar(b"b5")

        X = commit1(x, rX, gens_1).compress()
        transcript.append_point(b"X", X)
        Y = commit1(y, rY, gens_1).compress()
        transcript.append_point(b"Y", Y)
        Z = commit1(zv, rZ, gens_1).compress()
        transcript.append_point(b"Z", Z)
        alpha = commit1(b1, b2, gens_1).compress()
        transcript.append_point(b"alpha", alpha)
        beta = commit1(b3, b4, gens_1).compress()
        transcript.append_point(b"beta", beta)
        # delta = b3*X + b5*h
        Xp = RPoint.decompress(X)
        delta = (Xp.mul(b3) + RPoint(gens_1.h).mul(b5)).compress()
        transcript.append_point(b"delta", delta)
        c = transcript.challenge_scalar(b"c")
        z1 = (b1 + c * x) % L
        z2 = (b2 + c * rX) % L
        z3 = (b3 + c * y) % L
        z4 = (b4 + c * rY) % L
        z5 = (b5 + c * (rZ - rX * y)) % L
        return ProductProof(alpha, beta, delta, (z1, z2, z3, z4, z5)), X, Y, Z

    @verify_guard(failure=False)
    def verify(self, gens_1, transcript, X: bytes, Y: bytes, Z: bytes) -> bool:
        transcript.append_protocol_name(ProductProof.PROTOCOL)
        transcript.append_point(b"X", X)
        transcript.append_point(b"Y", Y)
        transcript.append_point(b"Z", Z)
        transcript.append_point(b"alpha", self.alpha)
        transcript.append_point(b"beta", self.beta)
        transcript.append_point(b"delta", self.delta)
        z1, z2, z3, z4, z5 = self.z
        c = transcript.challenge_scalar(b"c")

        def check(P: bytes, C: bytes, za: int, zb: int, gen_pt=None) -> bool:
            lhs = (RPoint.decompress(P) + RPoint.decompress(C).mul(c)).compress()
            if gen_pt is None:
                rhs = commit1(za, zb, gens_1).compress()
            else:
                rhs = (gen_pt.mul(za) + RPoint(gens_1.h).mul(zb)).compress()
            return lhs == rhs

        return (check(self.alpha, X, z1, z2)
                and check(self.beta, Y, z3, z4)
                and check(self.delta, Z, z3, z5,
                          gen_pt=RPoint.decompress(X)))


# ----------------------------------------------------------------------
# DotProductProof — linear size (nizk/mod.rs:297-409)
# ----------------------------------------------------------------------

@dataclass
class DotProductProof:
    delta: bytes
    beta: bytes
    z: List[int]
    z_delta: int
    z_beta: int

    PROTOCOL = b"dot product proof"

    @staticmethod
    def prove(gens_1, gens_n, transcript, tape,
              x_vec: Sequence[int], blind_x: int,
              a_vec: Sequence[int], y: int, blind_y: int):
        transcript.append_protocol_name(DotProductProof.PROTOCOL)
        n = len(x_vec)
        assert len(a_vec) == n and gens_n.n == n and gens_1.n == 1

        d_vec = tape.random_vector(b"d_vec", n)
        r_delta = tape.random_scalar(b"r_delta")
        r_beta = tape.random_scalar(b"r_beta")

        Cx = commitN(x_vec, blind_x, gens_n).compress()
        transcript.append_point(b"Cx", Cx)
        Cy = commit1(y, blind_y, gens_1).compress()
        transcript.append_point(b"Cy", Cy)
        append_scalars_vector(transcript, b"a", a_vec)

        delta = commitN(d_vec, r_delta, gens_n).compress()
        transcript.append_point(b"delta", delta)
        beta = commit1(dot_ints(a_vec, d_vec), r_beta, gens_1).compress()
        transcript.append_point(b"beta", beta)

        c = transcript.challenge_scalar(b"c")
        z = [(c * x_vec[i] + d_vec[i]) % L for i in range(n)]
        z_delta = (c * blind_x + r_delta) % L
        z_beta = (c * blind_y + r_beta) % L
        return DotProductProof(delta, beta, z, z_delta, z_beta), Cx, Cy

    @verify_guard(failure=False)
    def verify(self, gens_1, gens_n, transcript, a: Sequence[int],
               Cx: bytes, Cy: bytes) -> bool:
        assert gens_n.n == len(a) and gens_1.n == 1
        transcript.append_protocol_name(DotProductProof.PROTOCOL)
        transcript.append_point(b"Cx", Cx)
        transcript.append_point(b"Cy", Cy)
        append_scalars_vector(transcript, b"a", a)
        transcript.append_point(b"delta", self.delta)
        transcript.append_point(b"beta", self.beta)
        c = transcript.challenge_scalar(b"c")

        lhs1 = RPoint.decompress(Cx).mul(c) + RPoint.decompress(self.delta)
        rhs1 = commitN(self.z, self.z_delta, gens_n)
        ok = lhs1.compress() == rhs1.compress()
        lhs2 = RPoint.decompress(Cy).mul(c) + RPoint.decompress(self.beta)
        rhs2 = commit1(dot_ints(self.z, a), self.z_beta, gens_1)
        return ok and lhs2.compress() == rhs2.compress()


# ----------------------------------------------------------------------
# BulletReductionProof (nizk/bullet.rs)
# ----------------------------------------------------------------------

@dataclass
class BulletReductionProof:
    L_vec: List[bytes]
    R_vec: List[bytes]

    @staticmethod
    def prove(transcript, Q: RPoint, G_pts, H: RPoint,
              a_vec: Sequence[int], b_vec: Sequence[int], blind: int,
              blinds_vec: Sequence[Tuple[int, int]]):
        """G_pts: stacked PointE batch of the n generators.  The per-round
        L/R cross-terms are one-shot table MSMs; the generator fold
        u_inv*G_L + u*G_R runs as two batched scalar-mults (not n separate
        2-point MSMs).  Matches bullet.rs:32-132 on the transcript."""
        import numpy as np
        import jax.numpy as jnp
        from ..curve.ristretto import RISTRETTO, PointE
        from ..curve.weierstrass import scalars_to_bits
        from ..commit.pedersen import msm_points
        Rg = RISTRETTO

        a = [x % L for x in a_vec]
        b = [x % L for x in b_vec]
        n = G_pts.x.shape[0]
        assert n & (n - 1) == 0
        lg_n = n.bit_length() - 1
        assert len(blinds_vec) == 2 * lg_n

        L_out, R_out = [], []
        blind_fin = blind % L
        bi = iter(blinds_vec)
        G = G_pts

        def _with_QH(half):
            return PointE(*(jnp.concatenate([c, q[None], h[None]], axis=0)
                            for c, q, h in zip(half, Q.p, H.p)))

        while n != 1:
            n //= 2
            a_Lh, a_R = a[:n], a[n:]
            b_Lh, b_R = b[:n], b[n:]
            G_L = PointE(*(c[:n] for c in G))
            G_R = PointE(*(c[n:] for c in G))

            c_L = dot_ints(a_Lh, b_R)
            c_R = dot_ints(a_R, b_Lh)
            blind_L, blind_R = next(bi)

            Lp = RPoint(msm_points(a_Lh + [c_L, blind_L], _with_QH(G_R)))
            Rp = RPoint(msm_points(a_R + [c_R, blind_R], _with_QH(G_L)))
            Lc, Rc = Lp.compress(), Rp.compress()
            transcript.append_point(b"L", Lc)
            transcript.append_point(b"R", Rc)
            u = transcript.challenge_scalar(b"u")
            u_inv = pow(u, -1, L)

            a = [(a_Lh[i] * u + u_inv * a_R[i]) % L for i in range(n)]
            b = [(b_Lh[i] * u_inv + u * b_R[i]) % L for i in range(n)]
            bits = np.asarray(scalars_to_bits([u_inv, u], 253))
            G = Rg.padd(Rg.pscalar_mul_bits(G_L, bits[0]),
                        Rg.pscalar_mul_bits(G_R, bits[1]))

            blind_fin = (blind_fin + blind_L * u * u + blind_R * u_inv * u_inv) % L
            L_out.append(Lc)
            R_out.append(Rc)

        g_fin = RPoint(PointE(*(c[0] for c in G)))
        Gamma_hat = msm_host([a[0], a[0] * b[0] % L, blind_fin], [g_fin, Q, H])
        return (BulletReductionProof(L_out, R_out), Gamma_hat,
                a[0], b[0], g_fin, blind_fin)

    def verification_scalars(self, n: int, transcript):
        lg_n = len(self.L_vec)
        assert n == (1 << lg_n)
        challenges = []
        for Lc, Rc in zip(self.L_vec, self.R_vec):
            transcript.append_point(b"L", Lc)
            transcript.append_point(b"R", Rc)
            challenges.append(transcript.challenge_scalar(b"u"))
        challenges_inv = [pow(u, -1, L) for u in challenges]
        allinv = 1
        for ui in challenges_inv:
            allinv = allinv * ui % L
        u_sq = [u * u % L for u in challenges]
        u_inv_sq = [u * u % L for u in challenges_inv]
        s = [allinv]
        for i in range(1, n):
            lg_i = i.bit_length() - 1
            k = 1 << lg_i
            s.append(s[i - k] * u_sq[(lg_n - 1) - lg_i] % L)
        return u_sq, u_inv_sq, s

    @verify_guard(failure=None)
    def verify(self, n: int, a: Sequence[int], transcript,
               Gamma: RPoint, gens_n: MultiCommitGens):
        """The s-vector MSM over the (fixed) generators rides the cached
        digit table (reference bullet.rs:191-225 one-big-MSM trick)."""
        import jax.numpy as jnp
        from ..curve.msm import host_digits
        u_sq, u_inv_sq, s = self.verification_scalars(n, transcript)
        Ls = decompress_many(self.L_vec)
        Rs = decompress_many(self.R_vec)
        G_hat = RPoint(gens_n.G_msm.msm(jnp.asarray(host_digits(s))))
        a_hat = dot_ints(a, s)
        Gamma_hat = msm_host(u_sq + u_inv_sq + [1], Ls + Rs + [Gamma])
        return G_hat, Gamma_hat, a_hat


# ----------------------------------------------------------------------
# DotProductProofLog (nizk/mod.rs:429-584)
# ----------------------------------------------------------------------

@dataclass
class DotProductProofLog:
    bullet: BulletReductionProof
    delta: bytes
    beta: bytes
    z1: int
    z2: int

    PROTOCOL = b"dot product proof (log)"

    @staticmethod
    def prove(gens, transcript, tape,
              x_vec: Sequence[int], blind_x: int,
              a_vec: Sequence[int], y: int, blind_y: int):
        """gens: DotProductProofGens (has .n, .gens_n, .gens_1)."""
        transcript.append_protocol_name(DotProductProofLog.PROTOCOL)
        n = len(x_vec)
        assert len(a_vec) == n and gens.n == n
        lg_n = n.bit_length() - 1

        d = tape.random_scalar(b"d")
        r_delta = tape.random_scalar(b"r_delta")
        r_beta = tape.random_scalar(b"r_delta")
        v1 = tape.random_vector(b"blinds_vec_1", 2 * lg_n)
        v2 = tape.random_vector(b"blinds_vec_2", 2 * lg_n)
        blinds_vec = list(zip(v1, v2))

        Cx = commitN(x_vec, blind_x, gens.gens_n).compress()
        transcript.append_point(b"Cx", Cx)
        Cy = commit1(y, blind_y, gens.gens_1).compress()
        transcript.append_point(b"Cy", Cy)
        append_scalars_vector(transcript, b"a", a_vec)

        r = transcript.challenge_scalar(b"r")
        gens_1_scaled_G = RPoint(PointE_first(gens.gens_1.G)).mul(r)
        h = RPoint(gens.gens_1.h)

        blind_Gamma = (blind_x + r * blind_y) % L
        bullet, Gamma_hat, x_hat, a_hat, g_hat, rhat_Gamma = \
            BulletReductionProof.prove(transcript, gens_1_scaled_G,
                                       gens.gens_n.G, h,
                                       x_vec, a_vec, blind_Gamma, blinds_vec)
        y_hat = x_hat * a_hat % L

        delta = (g_hat.mul(d) + h.mul(r_delta)).compress()
        transcript.append_point(b"delta", delta)
        beta = (gens_1_scaled_G.mul(d) + h.mul(r_beta)).compress()
        transcript.append_point(b"beta", beta)

        c = transcript.challenge_scalar(b"c")
        z1 = (d + c * y_hat) % L
        z2 = (a_hat * (c * rhat_Gamma + r_beta) + r_delta) % L
        return DotProductProofLog(bullet, delta, beta, z1, z2), Cx, Cy

    @verify_guard(failure=False)
    def verify(self, n: int, gens, transcript, a: Sequence[int],
               Cx: bytes, Cy: bytes) -> bool:
        assert gens.n == n and len(a) == n
        transcript.append_protocol_name(DotProductProofLog.PROTOCOL)
        transcript.append_point(b"Cx", Cx)
        transcript.append_point(b"Cy", Cy)
        append_scalars_vector(transcript, b"a", a)

        r = transcript.challenge_scalar(b"r")
        gens_1_scaled_G = RPoint(PointE_first(gens.gens_1.G)).mul(r)
        h = RPoint(gens.gens_1.h)
        Gamma = RPoint.decompress(Cx) + RPoint.decompress(Cy).mul(r)

        g_hat, Gamma_hat, a_hat = self.bullet.verify(
            n, a, transcript, Gamma, gens.gens_n)
        transcript.append_point(b"delta", self.delta)
        transcript.append_point(b"beta", self.beta)
        c = transcript.challenge_scalar(b"c")

        beta_p = RPoint.decompress(self.beta)
        delta_p = RPoint.decompress(self.delta)
        lhs = ((Gamma_hat.mul(c) + beta_p).mul(a_hat) + delta_p).compress()
        rhs = ((g_hat + gens_1_scaled_G.mul(a_hat)).mul(self.z1)
               + h.mul(self.z2)).compress()
        return lhs == rhs


def PointE_first(G):
    from ..curve.ristretto import PointE
    return PointE(*(c[0] for c in G))


def gens_G_list(gens_n: MultiCommitGens) -> List[RPoint]:
    from ..curve.ristretto import PointE
    return [RPoint(PointE(*(c[i] for c in gens_n.G))) for i in range(gens_n.n)]


class DotProductProofGens:
    """reference: nizk/mod.rs DotProductProofGens::new."""

    def __init__(self, n: int, label: bytes):
        self.n = n
        full = MultiCommitGens.new(n + 1, label)
        self.gens_n, self.gens_1 = full.split_at(n)
