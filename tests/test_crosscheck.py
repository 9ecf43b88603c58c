"""Crosscheck proxy suite (see crosscheck/README.md).

No Rust toolchain exists in this environment, so direct acceptance by
the reference verifier cannot be executed here.  These tests pin the
strongest available substitutes, now for THREE fixtures (point-add
transparent, point-add WITH the SPARK eval proof, point-mult n=128):

  1. golden challenge streams — prover AND verifier must reproduce the
     recorded Fiat-Shamir challenge bytes exactly (any transcript/layout
     drift fails);
  2. the serialized proof bytes are pinned (deterministic tape);
  3. STRUCTURED proof fuzzing — every serialized field (scalar, point,
     length prefix) is mutated individually and must be cleanly rejected
     (False or a clean decode error through verify_guard, never a crash);
     plus truncated / overlong buffers.
"""

import json
import os
import sys

import pytest

from vpin_tpu.transcript.merlin import Transcript
from vpin_tpu.snark import (
    SNARKGens, cp_commit_witness, cp_snark_prove, cp_snark_verify,
    snark_encode,
)
from vpin_tpu.utils.bincode import (
    TrackedWriter, deserialize_snark, ser_r1cs_sat_proof,
    ser_sparse_eval_proof, serialize_snark,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "crosscheck",
                          "golden")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "crosscheck"))

pytestmark = pytest.mark.slow

FIXTURE_FILES = {
    "add_transparent": "point_add_cp_challenges.json",
    "add_full_snark": "point_add_cp_full_snark_challenges.json",
    "mult_transparent": "point_mult_cp_challenges.json",
    "mult_full_snark": "point_mult_cp_full_snark_challenges.json",
}


def _tracked_serialize(proof):
    w = TrackedWriter()
    ser_r1cs_sat_proof(w, proof.r1cs_sat_proof)
    for v in proof.inst_evals:
        w.scalar(v)
    if proof.r1cs_eval_proof is not None:
        ser_sparse_eval_proof(w, proof.r1cs_eval_proof.proof)
    return w.bytes(), w.fields


@pytest.fixture(scope="module", params=list(FIXTURE_FILES))
def case(request):
    """(name, golden dict, env) where env re-creates the proving context."""
    name = request.param
    with open(os.path.join(GOLDEN_DIR, FIXTURE_FILES[name])) as fh:
        golden = json.load(fh)

    if name == "mult_full_snark":
        # the 2-mult SPARK pipeline (16k-nnz shapes) is generated and
        # replayed in host-int mode: bit-identical bytes (host/device
        # equivalence is covered by test_spark), minutes faster on the
        # CPU test mesh
        import vpin_tpu.poly.dense as _pd
        request.addfinalizer(
            lambda old=_pd.HOST_POLY_MAX:
            setattr(_pd, "HOST_POLY_MAX", old))
        _pd.HOST_POLY_MAX = 1 << 20

    from gen_golden import build_fixture, build_mult_fixture
    gadget = build_mult_fixture() if name.startswith("mult") \
        else build_fixture()
    inst, vp, vi, vf, inputs, nc, nv, ni, nnz = gadget
    gens = SNARKGens(nc, nv, ni, nnz)
    full = name.endswith("full_snark")
    comm = decomm = None
    if full:
        comm, decomm = snark_encode(inst, gens)
    pv, cv, bv, cpc, cic = cp_commit_witness(vp, vi, vf, gens, tape_seed=11)

    plog = []
    pt = Transcript(b"snark_example", log=plog)
    proof = cp_snark_prove(inst, vf, inputs, gens, pt, pv, cv, bv,
                           decomm=decomm, tape_seed=11, with_eval_proof=full)
    vlog = []
    vt = Transcript(b"snark_example", log=vlog)
    ok = cp_snark_verify(proof, inst, inputs, vt, gens, cpc, cic, comm=comm)

    def verify(p):
        t = Transcript(b"snark_example")
        return cp_snark_verify(p, inst, inputs, t, gens, cpc, cic, comm=comm)

    return dict(name=name, golden=golden, proof=proof, plog=plog, vlog=vlog,
                ok=ok, verify=verify)


def test_prover_challenge_stream_matches_golden(case):
    assert [list(x) for x in case["plog"]] == \
           [list(x) for x in case["golden"]["prover_challenges"]]


def test_verifier_challenge_stream_matches_golden(case):
    assert case["ok"]
    assert [list(x) for x in case["vlog"]] == \
           [list(x) for x in case["golden"]["verifier_challenges"]]


def test_proof_bytes_match_golden(case):
    assert serialize_snark(case["proof"]).hex() == case["golden"]["proof_hex"]


def test_serialization_roundtrip(case):
    blob = bytes.fromhex(case["golden"]["proof_hex"])
    rt = deserialize_snark(blob)
    assert serialize_snark(rt) == blob
    assert case["verify"](rt)


def test_structured_field_fuzzing(case):
    """Mutate every serialized field individually; each mutation must be
    cleanly rejected.  The leading comm_vars block is NOT read by CP
    verification (the verifier recombines comm_para+comm_input instead —
    reference my_lib_verify, commit_test.rs:355-361), so mutations there
    are legitimately accepted and skipped here."""
    blob, fields = _tracked_serialize(case["proof"])
    assert blob.hex() == case["golden"]["proof_hex"]

    proof0 = deserialize_snark(blob)
    skip = 8 + 32 * len(proof0.r1cs_sat_proof.comm_vars.C)

    # bound the suite's wall time: ~40 mutations per fixture, spread
    # uniformly over the field list (every field KIND and proof section
    # still gets hit; a full sweep is VPIN_FUZZ_ALL=1)
    stride = 1 if os.environ.get("VPIN_FUZZ_ALL") == "1" else \
        max(1, len(fields) // 40)
    tested = rejected = 0
    for kind, start, end in fields[::stride]:
        if start < skip:
            continue
        tested += 1
        mutated = bytearray(blob)
        mutated[start] ^= 0x01
        try:
            bad = deserialize_snark(bytes(mutated))
        except Exception:
            rejected += 1          # failed to decode == clean rejection
            continue
        assert case["verify"](bad) is False, \
            f"tampered {kind} at byte {start} accepted ({case['name']})"
        rejected += 1
    assert tested > 20 and rejected == tested


def test_truncated_and_overlong_buffers(case):
    blob = bytes.fromhex(case["golden"]["proof_hex"])
    for cut in (0, 1, 7, 8, len(blob) // 2, len(blob) - 1):
        with pytest.raises(Exception):
            deserialize_snark(blob[:cut])
    with pytest.raises(Exception):
        deserialize_snark(blob + b"\x00")
    # a length prefix inflated to claim more items than the buffer holds
    mutated = bytearray(blob)
    mutated[0] = 0xFF              # comm_vars vec length low byte
    with pytest.raises(Exception):
        deserialize_snark(bytes(mutated))


def test_structural_mutations_rejected(case):
    blob = bytes.fromhex(case["golden"]["proof_hex"])
    mut = deserialize_snark(blob)
    mut.r1cs_sat_proof.sc_proof_phase1.comm_polys.pop()
    assert case["verify"](mut) is False

    mut2 = deserialize_snark(blob)
    mut2.r1cs_sat_proof.sc_proof_phase2.proofs[0].z = []
    assert case["verify"](mut2) is False
