"""Host-only verification: the verifier must never touch the device.

The reference verifier is a single-core CPU routine (SNARK::verify,
driven from proof_point_add.rs:96-111); our split mirrors it via
utils.hostonly.host_verify(), entered by every top-level verify entry
point.  These tests prove the property mechanically: after proving,
every device-MSM entry point is patched to raise and all size
heuristics are forced toward the device branch, then a full-SNARK
verify (sat proof + SPARK eval proof) must still pass — i.e. the whole
verifier ran host-side.
"""

import random

import pytest

import vpin_tpu.batch_verify as bv
import vpin_tpu.curve.msm as msm_mod
import vpin_tpu.curve.rpoint as rpoint_mod
import vpin_tpu.snark.r1csproof as r1cs_mod
from vpin_tpu.transcript.merlin import Transcript


def _block_device(monkeypatch):
    def _boom(*a, **k):  # pragma: no cover - triggering it is the failure
        raise AssertionError("device MSM reached from host-only verify")

    monkeypatch.setattr(msm_mod, "msm_oneshot", _boom)
    monkeypatch.setattr(msm_mod, "build_table", _boom)
    # Push every size heuristic toward the device branch so only the
    # host_only() override can keep the verifier on the host.
    monkeypatch.setattr(rpoint_mod, "HOST_MSM_MAX", -1)
    monkeypatch.setattr(bv, "HOST_MSM_MAX", -1)
    monkeypatch.setattr(r1cs_mod, "_DEV_FOLD_MIN", 0)


def test_stock_snark_verify_is_host_only(monkeypatch):
    import vpin_tpu.poly.dense as dense_mod
    monkeypatch.setattr(dense_mod, "HOST_POLY_MAX", 1 << 30)

    from vpin_tpu.snark import SNARKGens
    from vpin_tpu.snark.stock import SNARK, produce_synthetic_r1cs, snark_encode

    n = 64
    inst, vars_ints, inputs = produce_synthetic_r1cs(n, n, 4, seed=2)
    gens = SNARKGens(inst.num_cons, inst.num_vars, inst.num_inputs,
                     max(m.nnz for m in (inst.A, inst.B, inst.C)))
    comm, decomm = snark_encode(inst, gens)
    pt = Transcript(b"snark_example")
    proof = SNARK.prove(inst, comm, decomm, vars_ints, inputs, gens, pt,
                        tape_seed=7)

    _block_device(monkeypatch)

    vt = Transcript(b"snark_example")
    assert proof.verify(comm, inst, inputs, vt, gens)

    # and a corrupted proof must still be REJECTED host-side
    bad = SNARK(proof.r1cs_sat_proof,
                ((proof.inst_evals[0] + 1) % (1 << 252),
                 proof.inst_evals[1], proof.inst_evals[2]),
                proof.r1cs_eval_proof)
    vt2 = Transcript(b"snark_example")
    assert bad.verify(comm, inst, inputs, vt2, gens) is False


def test_nizk_verify_is_host_only(monkeypatch):
    import vpin_tpu.poly.dense as dense_mod
    monkeypatch.setattr(dense_mod, "HOST_POLY_MAX", 1 << 30)

    from vpin_tpu.snark.nizk_api import NIZK, NIZKGens
    from vpin_tpu.snark.stock import produce_synthetic_r1cs

    n = 32
    inst, vars_ints, inputs = produce_synthetic_r1cs(n, n, 4, seed=3)
    gens = NIZKGens(inst.num_cons, inst.num_vars, inst.num_inputs)
    pt = Transcript(b"nizk_example")
    proof = NIZK.prove(inst, vars_ints, inputs, gens, pt, tape_seed=9)

    _block_device(monkeypatch)

    vt = Transcript(b"nizk_example")
    assert proof.verify(inst, inputs, vt, gens)
