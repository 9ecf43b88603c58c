"""Stock Spartan SNARK + synthetic R1CS parity tests
(reference: Spartan/src/lib.rs:611-775 test pyramid)."""

import pytest

from vpin_tpu.snark import (
    NIZK, NIZKGens, R1CSInstance, SNARKGens, produce_synthetic_r1cs,
    snark_prove_synthetic,
)
from vpin_tpu.transcript.merlin import Transcript


def test_synthetic_r1cs_satisfiable():
    inst, vars_ints, inputs = produce_synthetic_r1cs(64, 64, 10, seed=3)
    assert inst.num_cons == 64 and inst.num_vars == 64
    assert len(inputs) == 10
    assert inst.is_sat(vars_ints, inputs)
    # perturbing the witness breaks satisfiability
    bad = list(vars_ints)
    bad[0] = (bad[0] + 1) % (2**252)
    assert not inst.is_sat(bad, inputs)


def test_instance_rejects_invalid_index():
    # reference Instance::new returns Err(InvalidIndexError)
    # (lib.rs:619-668) for out-of-range row/col
    with pytest.raises(AssertionError):
        R1CSInstance(4, 4, 0, [(99, 0, 1)], [(0, 0, 1)], [(0, 0, 1)])
    with pytest.raises(AssertionError):
        R1CSInstance(4, 4, 0, [(0, 99, 1)], [(0, 0, 1)], [(0, 0, 1)])


@pytest.mark.slow
def test_stock_snark_synthetic_roundtrip():
    proof, ok, size = snark_prove_synthetic(64, 64, 10, seed=1, tape_seed=2)
    assert ok
    assert size > 0
    # tampered claimed evaluation must fail
    proof.inst_evals = ((proof.inst_evals[0] + 1) % (2**252),
                        proof.inst_evals[1], proof.inst_evals[2])
    inst, vars_ints, inputs = produce_synthetic_r1cs(64, 64, 10, seed=1)
    gens = SNARKGens(inst.num_cons, inst.num_vars, inst.num_inputs,
                     max(m.nnz for m in (inst.A, inst.B, inst.C)))
    from vpin_tpu.snark import snark_encode
    comm, _ = snark_encode(inst, gens)
    vt = Transcript(b"snark_example")
    assert proof.verify(comm, inst, inputs, vt, gens) is False


@pytest.mark.slow
def test_nizk_synthetic_roundtrip():
    inst, vars_ints, inputs = produce_synthetic_r1cs(32, 32, 5, seed=4)
    gens = NIZKGens(inst.num_cons, inst.num_vars, inst.num_inputs)
    pt = Transcript(b"nizk_example")
    proof = NIZK.prove(inst, vars_ints, inputs, gens, pt, tape_seed=9)
    vt = Transcript(b"nizk_example")
    assert proof.verify(inst, inputs, vt, gens)
