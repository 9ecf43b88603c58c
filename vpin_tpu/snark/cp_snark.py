"""Commit-and-prove Spartan SNARK driver (the vPIN L2 flow).

Replicates vPIN_proof_generation/src/proof_point_add.rs:23-113 +
commit_test.rs my_lib_prove/my_lib_verify:
  1. commit vars_para and vars_input separately with one RandomTape;
  2. combine commitments homomorphically (C = C_para + C_input);
  3. sat proof over the combined commitment (CP transcript semantics);
  4. append Ar/Br/Cr claims; R1CS eval proof (SPARK) over the matrix
     commitment.

The eval proof is optional while operating in "transparent" mode, where
the verifier evaluates the (public) R1CS matrices itself — proof_size
accounting then covers the sat proof only.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from ..field.prime_field import L_MODULUS as L
from ..poly.dense import DensePoly, ints_to_dev
from ..transcript.merlin import Transcript, RandomTape
from ..utils.errors import verify_guard
from ..curve.rpoint import decompress_many
from .r1cs import R1CSInstance
from .r1csproof import (
    PolyCommitment, R1CSGens, R1CSProof, combined_commit, poly_commit,
    r1cs_prove_cp, r1cs_verify_cp,
)

SNARK_PROTOCOL = b"Spartan SNARK proof"


def snark_encode(inst: R1CSInstance, gens: "SNARKGens"):
    """SNARK::encode: commit to the R1CS matrices (reference lib.rs:340-358).
    Returns (SparseMatPolyCommitment, dense decommitment)."""
    from ..spark.sparse_mlpoly import multi_commit
    from ..utils.timer import span
    num_poly_vars_x = inst.num_cons.bit_length() - 1
    num_poly_vars_y = (2 * inst.num_vars).bit_length() - 1
    with span("SNARK::encode"):
        return multi_commit([inst.A, inst.B, inst.C], num_poly_vars_x,
                            num_poly_vars_y, gens.gens_r1cs_eval)


def _ceil_log2(n: int) -> int:
    assert n > 0
    return (n - 1).bit_length() if n > 1 else 0


class SNARKGens:
    """reference: lib.rs:295-327."""

    def __init__(self, num_cons: int, num_vars: int, num_inputs: int,
                 num_nz_entries: int):
        num_vars_padded = max(num_vars, num_inputs + 1)
        if num_vars_padded & (num_vars_padded - 1):
            num_vars_padded = 1 << num_vars_padded.bit_length()
        self.num_vars_padded = num_vars_padded
        self.num_cons = num_cons
        self.gens_r1cs_sat = R1CSGens(b"gens_r1cs_sat", num_cons, num_vars_padded)
        self.num_nz_entries = num_nz_entries
        self._gens_r1cs_eval = None

    @property
    def gens_r1cs_eval(self):
        if self._gens_r1cs_eval is None:
            from ..spark.sparse_mlpoly import SparseMatPolyCommitmentGens
            # reference R1CSCommitmentGens::new (r1csinstance.rs:33-49)
            num_poly_vars_x = _ceil_log2(max(self.num_cons, 2))
            num_poly_vars_y = _ceil_log2(2 * self.num_vars_padded)
            self._gens_r1cs_eval = SparseMatPolyCommitmentGens(
                b"gens_r1cs_eval", num_poly_vars_x, num_poly_vars_y,
                self.num_nz_entries, batch_size=3)
        return self._gens_r1cs_eval


@dataclass
class CPSnarkProof:
    r1cs_sat_proof: R1CSProof
    inst_evals: Tuple[int, int, int]
    r1cs_eval_proof: Optional[object] = None

    def size(self) -> int:
        """Real serialized byte count (reference measures proof size as
        bincode::serialize(...).len(), proof_point_add.rs:96-98)."""
        from ..utils.bincode import serialize_snark
        return len(serialize_snark(self))


def pad_assignment(vals, n: int):
    """Zero-pad a host int list OR a Montgomery device array to length n."""
    import jax.numpy as jnp
    from ..field.prime_field import FQ
    if isinstance(vals, jnp.ndarray):
        assert vals.shape[0] <= n
        if vals.shape[0] == n:
            return vals
        return jnp.concatenate([vals, FQ.zeros((n - vals.shape[0],))], axis=0)
    assert len(vals) <= n
    return list(vals) + [0] * (n - len(vals))


def _assignment_poly(vals, n: int) -> DensePoly:
    import jax.numpy as jnp
    padded = pad_assignment(vals, n)
    if isinstance(padded, jnp.ndarray):
        return DensePoly(padded)
    return DensePoly.from_ints(padded)


def _sparse_entries(vals, max_frac=1 / 64):
    """[(index, value)] when vals is sparse enough for the sparse Hyrax
    path, else None.  Accepts host int lists and Montgomery device
    arrays (the gadget builders emit either)."""
    import numpy as np
    import jax.numpy as jnp
    from ..field.prime_field import FQ
    if isinstance(vals, jnp.ndarray):
        mask = np.asarray(jnp.any(vals != 0, axis=-1))
        idx = np.nonzero(mask)[0]
        if len(idx) > max(1, int(len(mask) * max_frac)):
            return None
        if len(idx) == 0:
            return []
        vs = [int(v) for v in FQ.from_mont(vals[jnp.asarray(idx)])]
        return list(zip(idx.tolist(), vs))
    idx = [i for i, v in enumerate(vals) if int(v) % L]
    if len(idx) > max(1, int(len(vals) * max_frac)):
        return None
    return [(i, int(vals[i]) % L) for i in idx]


def _hyrax_commit_sparse(n: int, entries, gens_pc, tape):
    """Hyrax row commitments of a sparse assignment: row i commits as
    blind_i*h + sum of its few value*G terms — host point arithmetic,
    O(L + nnz) scalar-mults instead of a dense 2^ell MSM.  Blind draws
    match poly_commit exactly (same tape labels/order), so the resulting
    bytes equal the dense path's."""
    from ..poly.dense import factored_lens
    from ..curve import host_ristretto as _hr
    ell = n.bit_length() - 1
    lnv, rnv = factored_lens(ell)
    L_size, R_size = 1 << lnv, 1 << rnv
    blinds = tape.random_vector(b"poly_blinds", L_size)
    gens_n = gens_pc.gens.gens_n
    per_row = {}
    for i, v in entries:
        per_row.setdefault(i // R_size, []).append((i % R_size, v))
    rows = []
    for r in range(L_size):
        scalars = [blinds[r]]
        pts = [gens_n.hh]
        for c, v in per_row.get(r, ()):
            scalars.append(v)
            pts.append(gens_n.Gh[c])
        rows.append(_hr.msm(scalars, pts).encode())
    return PolyCommitment(rows), blinds


def cp_commit_witness(vars_para, vars_input,
                      full_vars, gens: SNARKGens,
                      tape_seed: Optional[int] = None, ckpt=None):
    """Commit the two witness shares and the combined witness
    (reference: proof_point_add.rs:44-78).

    With a CheckpointStore and a deterministic tape_seed the Hyrax row
    MSMs are skipped on resume: blinds replay from the seeded tape and
    the committed row bytes load from the store."""
    from ..poly.dense import factored_lens
    n = gens.num_vars_padded
    tape1 = RandomTape(bytes([2]), seed=tape_seed)

    cached = ckpt.load("witness_commit") if ckpt is not None else None
    if cached is not None:
        assert tape_seed is not None, "checkpoint resume needs tape_seed"
        L_size = 1 << factored_lens(n.bit_length() - 1)[0]
        blind_para = tape1.random_vector(b"poly_blinds", L_size)
        blind_input = tape1.random_vector(b"poly_blinds", L_size)
        blind_vars = [(a + b) % L for a, b in zip(blind_para, blind_input)]
        poly_vars = _assignment_poly(full_vars, n)
        return (poly_vars, PolyCommitment(cached["vars"]), blind_vars,
                PolyCommitment(cached["para"]), PolyCommitment(cached["input"]))

    gens_pc = gens.gens_r1cs_sat.gens_pc
    sparse_para = _sparse_entries(vars_para)
    if sparse_para is not None:
        # vars_para is the scalars-only share: all-zero for point-add,
        # one entry per mult for point-mult (reference point_mult.rs:517)
        # — a dense 2^20-wide Hyrax MSM per row would be ~100% zeros.
        # Sparse path: row commit = blind_i*h + sum of the few a*G terms.
        comm_para, blind_para = _hyrax_commit_sparse(
            n, sparse_para, gens_pc, tape1)
    else:
        poly_para = _assignment_poly(vars_para, n)
        comm_para, blind_para = poly_commit(poly_para, gens_pc, tape1)
    poly_input = _assignment_poly(vars_input, n)
    comm_input, blind_input = poly_commit(poly_input, gens_pc, tape1)

    # combined commitment: the prover needs C(w) with blinds
    # blind_para+blind_input; by the Pedersen homomorphism that is
    # EXACTLY C_para[i] + C_input[i] row-wise (what the reference asserts
    # after recommitting, proof_point_add.rs:69-78) — so derive it with
    # L host point-adds instead of a third full Hyrax MSM pass.
    poly_vars = _assignment_poly(full_vars, n)
    blind_vars = [(a + b) % L for a, b in zip(blind_para, blind_input)]
    from ..curve import host_ristretto as _hr
    pa = [_hr.decode(bytes(b)) for b in comm_para.C]
    pi = [_hr.decode(bytes(b)) for b in comm_input.C]
    comm_vars = PolyCommitment([(a + b).encode() for a, b in zip(pa, pi)])

    if ckpt is not None:
        ckpt.save("witness_commit", {"para": list(comm_para.C),
                                     "input": list(comm_input.C),
                                     "vars": list(comm_vars.C)})
    return (poly_vars, comm_vars, blind_vars, comm_para, comm_input)


def cp_snark_prove(inst: R1CSInstance, full_vars: List[int], inputs: List[int],
                   gens: SNARKGens, transcript: Transcript,
                   poly_vars: DensePoly, comm_vars: PolyCommitment,
                   blind_vars: List[int], decomm=None,
                   tape_seed: Optional[int] = None,
                   with_eval_proof: bool = False, ckpt=None) -> CPSnarkProof:
    """my_lib_prove (commit_test.rs:59-133)."""
    from ..utils.timer import Timer, span
    t_all = Timer("SNARK::prove")
    tape = RandomTape(b"proof", seed=tape_seed)
    transcript.append_protocol_name(SNARK_PROTOCOL)

    post_sat = ckpt.load("post_sat") if ckpt is not None else None
    if post_sat is not None:
        assert tape_seed is not None, "checkpoint resume needs tape_seed"
        transcript.restore(post_sat["transcript"])
        tape.restore(post_sat["tape"])
        sat_proof = post_sat["sat_proof"]
        rx, ry = post_sat["rx"], post_sat["ry"]
        Ar, Br, Cr = post_sat["evals"]
    else:
        n = gens.num_vars_padded
        padded_vars = pad_assignment(full_vars, n)
        with span("R1CSProof::prove"):
            sat_proof, rx, ry = r1cs_prove_cp(
                inst, padded_vars, inputs, gens.gens_r1cs_sat, transcript,
                tape, poly_vars, comm_vars, blind_vars, ckpt=ckpt)

        with span("eval_sparse_polys"):
            Ar, Br, Cr = inst.evaluate(rx, ry)
        transcript.append_scalar(b"Ar_claim", Ar)
        transcript.append_scalar(b"Br_claim", Br)
        transcript.append_scalar(b"Cr_claim", Cr)
        if ckpt is not None:
            ckpt.save("post_sat", {
                "transcript": transcript.snapshot(), "tape": tape.snapshot(),
                "sat_proof": sat_proof, "rx": rx, "ry": ry,
                "evals": (Ar, Br, Cr)})

    eval_proof = None
    if with_eval_proof:
        from ..spark.sparse_mlpoly import R1CSEvalProof
        with span("R1CSEvalProof::prove"):
            eval_proof = R1CSEvalProof.prove(
                decomm, rx, ry, (Ar, Br, Cr), gens.gens_r1cs_eval,
                transcript, tape)

    t_all.stop()
    return CPSnarkProof(sat_proof, (Ar, Br, Cr), eval_proof)


@verify_guard(failure=False)
def cp_snark_verify(proof: CPSnarkProof, inst: R1CSInstance, inputs: List[int],
                    transcript: Transcript, gens: SNARKGens,
                    comm_para: PolyCommitment, comm_input: PolyCommitment,
                    comm=None) -> bool:
    """my_lib_verify (commit_test.rs:498-544).  In transparent mode
    (comm None) the verifier evaluates the public matrices directly.
    All group equations defer into one batched final check, and the
    whole verifier runs host-side (utils.hostonly): no XLA compiles or
    device round-trips, matching the reference's CPU verifier split."""
    from ..batch_verify import VerifyAccumulator
    from ..utils.hostonly import host_verify
    with host_verify():
        return _cp_snark_verify_host(proof, inst, inputs, transcript, gens,
                                     comm_para, comm_input, comm)


def _cp_snark_verify_host(proof, inst, inputs, transcript, gens,
                          comm_para, comm_input, comm):
    from ..batch_verify import VerifyAccumulator
    acc = VerifyAccumulator()
    transcript.append_protocol_name(SNARK_PROTOCOL)

    res = r1cs_verify_cp(
        proof.r1cs_sat_proof, gens.num_vars_padded, inst.num_cons,
        inputs, proof.inst_evals, transcript, gens.gens_r1cs_sat,
        comm_para, comm_input, acc=acc)
    if res is None:
        return False
    rx, ry = res

    Ar, Br, Cr = proof.inst_evals
    transcript.append_scalar(b"Ar_claim", Ar)
    transcript.append_scalar(b"Br_claim", Br)
    transcript.append_scalar(b"Cr_claim", Cr)

    if proof.r1cs_eval_proof is not None:
        if not proof.r1cs_eval_proof.verify(
                comm, rx, ry, proof.inst_evals, gens.gens_r1cs_eval,
                transcript, acc=acc):
            return False
    else:
        # transparent mode: recompute evaluations from the public instance
        got = inst.evaluate(rx, ry)
        if tuple(x % L for x in got) != tuple(x % L for x in proof.inst_evals):
            return False
    return acc.check()
