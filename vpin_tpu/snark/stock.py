"""Stock (non-commit-and-prove) Spartan SNARK + synthetic R1CS.

reference: Spartan/src/lib.rs:360-487 (SNARK::prove/verify — appends the
R1CS matrix commitment under label "comm", uses stock R1CSProof which
appends `input` and commits the witness itself) and
r1csinstance.rs:160-238 (produce_synthetic_r1cs, used by the reference's
tests, benches and the 2^10..2^20 profiler sweep).
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import List, Optional, Tuple

from ..field.prime_field import L_MODULUS as L
from ..transcript.merlin import Transcript, RandomTape
from ..utils.errors import verify_guard
from .r1cs import R1CSInstance
from .r1csproof import R1CSProof, r1cs_prove_stock, r1cs_verify_stock
from .cp_snark import SNARKGens, SNARK_PROTOCOL, snark_encode


def produce_synthetic_r1cs(num_cons: int, num_vars: int, num_inputs: int,
                           seed: Optional[int] = None
                           ) -> Tuple[R1CSInstance, List[int], List[int]]:
    """Random satisfiable R1CS (reference r1csinstance.rs:160-238)."""
    assert num_cons & (num_cons - 1) == 0
    assert num_vars & (num_vars - 1) == 0
    assert num_inputs < num_vars
    rng = random.Random(seed)

    size_z = num_vars + num_inputs + 1
    Z = [rng.randrange(L) for _ in range(size_z)]
    Z[num_vars] = 1

    A, B, C = [], [], []
    for i in range(num_cons):
        a_idx = i % size_z
        b_idx = (i + 2) % size_z
        A.append((i, a_idx, 1))
        B.append((i, b_idx, 1))
        ab = Z[a_idx] * Z[b_idx] % L
        c_idx = (i + 3) % size_z
        c_val = Z[c_idx]
        if c_val == 0:
            C.append((i, num_vars, ab))
        else:
            C.append((i, c_idx, ab * pow(c_val, -1, L) % L))

    inst = R1CSInstance(num_cons, num_vars, num_inputs, A, B, C)
    vars_ints = Z[:num_vars]
    inputs = Z[num_vars + 1:]
    assert inst.is_sat(vars_ints, inputs)
    return inst, vars_ints, inputs


@dataclass
class SNARK:
    """Stock SNARK (lib.rs SNARK struct)."""
    r1cs_sat_proof: R1CSProof
    inst_evals: Tuple[int, int, int]
    r1cs_eval_proof: object

    def size(self) -> int:
        from ..utils.bincode import Writer, ser_r1cs_sat_proof, \
            ser_sparse_eval_proof
        w = Writer()
        ser_r1cs_sat_proof(w, self.r1cs_sat_proof)
        for v in self.inst_evals:
            w.scalar(v)
        ser_sparse_eval_proof(w, self.r1cs_eval_proof.proof)
        return len(w.bytes())

    @staticmethod
    def prove(inst: R1CSInstance, comm, decomm, vars_ints: List[int],
              inputs: List[int], gens: SNARKGens, transcript: Transcript,
              tape_seed: Optional[int] = None) -> "SNARK":
        from ..spark.sparse_mlpoly import R1CSEvalProof
        tape = RandomTape(b"proof", seed=tape_seed)
        transcript.append_protocol_name(SNARK_PROTOCOL)
        comm.append_to_transcript(b"comm", transcript)

        padded = list(vars_ints) + [0] * (inst.num_vars - len(vars_ints))
        sat_proof, rx, ry = r1cs_prove_stock(
            inst, padded, inputs, gens.gens_r1cs_sat, transcript, tape)

        Ar, Br, Cr = inst.evaluate(rx, ry)
        transcript.append_scalar(b"Ar_claim", Ar)
        transcript.append_scalar(b"Br_claim", Br)
        transcript.append_scalar(b"Cr_claim", Cr)

        eval_proof = R1CSEvalProof.prove(
            decomm, rx, ry, (Ar, Br, Cr), gens.gens_r1cs_eval,
            transcript, tape)
        return SNARK(sat_proof, (Ar, Br, Cr), eval_proof)

    @verify_guard(failure=False)
    def verify(self, comm, inst: R1CSInstance, inputs: List[int],
               transcript: Transcript, gens: SNARKGens) -> bool:
        from ..utils.hostonly import host_verify
        with host_verify():
            return self._verify_host(comm, inst, inputs, transcript, gens)

    def _verify_host(self, comm, inst, inputs, transcript, gens) -> bool:
        from ..batch_verify import VerifyAccumulator
        acc = VerifyAccumulator()
        transcript.append_protocol_name(SNARK_PROTOCOL)
        comm.append_to_transcript(b"comm", transcript)

        res = r1cs_verify_stock(
            self.r1cs_sat_proof, gens.num_vars_padded, inst.num_cons,
            inputs, self.inst_evals, transcript, gens.gens_r1cs_sat, acc=acc)
        if res is None:
            return False
        rx, ry = res

        Ar, Br, Cr = self.inst_evals
        transcript.append_scalar(b"Ar_claim", Ar)
        transcript.append_scalar(b"Br_claim", Br)
        transcript.append_scalar(b"Cr_claim", Cr)
        if not self.r1cs_eval_proof.verify(
                comm, rx, ry, self.inst_evals, gens.gens_r1cs_eval,
                transcript, acc=acc):
            return False
        return acc.check()


def snark_prove_synthetic(num_cons: int, num_vars: int, num_inputs: int,
                          seed: int = 0, tape_seed: Optional[int] = None):
    """End-to-end stock SNARK on a synthetic instance; returns
    (proof, verify_ok, sizes) — the reference profiler flow
    (Spartan/profiler/snark.rs)."""
    inst, vars_ints, inputs = produce_synthetic_r1cs(
        num_cons, num_vars, num_inputs, seed)
    gens = SNARKGens(inst.num_cons, inst.num_vars, inst.num_inputs,
                     max(m.nnz for m in (inst.A, inst.B, inst.C)))
    comm, decomm = snark_encode(inst, gens)
    pt = Transcript(b"snark_example")
    proof = SNARK.prove(inst, comm, decomm, vars_ints, inputs, gens, pt,
                        tape_seed=tape_seed)
    vt = Transcript(b"snark_example")
    ok = proof.verify(comm, inst, inputs, vt, gens)
    return proof, ok, proof.size()
