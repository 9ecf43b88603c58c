"""End-to-end CP-SNARK tests: gadget construction, satisfiability, and
prove/verify over the point-add and point-mult circuits."""

import random

import pytest

from vpin_tpu.curve.host_ec import E2_G_HOST, E2_ORDER, host_infinity
from vpin_tpu.transcript.merlin import Transcript
from vpin_tpu.gadgets.point_addition import point_addition_gadget
from vpin_tpu.gadgets.point_mult import point_mult_gadget
from vpin_tpu.snark import (
    SNARKGens, cp_commit_witness, cp_snark_prove, cp_snark_verify,
)

RNG = random.Random(99)


def _add_trace(n):
    """Synthesize a recorded add trace: P_i + R_i with an infinity case."""
    px, py, rx, ry, rz = [], [], [], [], []
    for t in range(n):
        P = RNG.randrange(1, E2_ORDER) * E2_G_HOST
        if t == 1:
            R = host_infinity()
            rz.append(1)
            rx.append(0)
            ry.append(0)
        else:
            R = RNG.randrange(1, E2_ORDER) * E2_G_HOST
            rz.append(0)
            rx.append(R.x)
            ry.append(R.y)
        px.append(P.x)
        py.append(P.y)
    return px, py, rx, ry, rz


def test_point_add_gadget_sat():
    inst, vp, vi, vf, inputs, nc, nv, ni, nnz = point_addition_gadget(*_add_trace(4))
    assert nc == 40 and nv == 61 and ni == 0
    assert inst.is_sat(vf, inputs)
    # tampering breaks satisfiability
    bad = list(vf)
    bad[0] = (bad[0] + 1) % E2_ORDER
    assert not inst.is_sat(bad, inputs)


def test_point_mult_gadget_sat_small_n():
    n = 8
    pts = [RNG.randrange(1, E2_ORDER) * E2_G_HOST for _ in range(3)]
    weights = [0, 1, 201]
    inst, vp, vi, vf, inputs, nc, nv, ni, nnz = point_mult_gadget(
        weights, [p.x for p in pts], [p.y for p in pts], n=n)
    assert nc == (27 * n + 8) * 3 and ni == 1
    # the circuit output (Qx, Qy) must equal the true scalar multiple
    onv = 27 * n + 10
    for j, (w, P) in enumerate(zip(weights, pts)):
        qx = vf[10 * n + 6 + onv * j]
        qy = vf[10 * n + 7 + onv * j]
        want = w * P
        if want.inf:
            # B stays at the (0, 0, z=1) infinity encoding
            assert qx == 0 and qy == 0
        else:
            assert qx == want.x and qy == want.y


@pytest.mark.slow
def test_cp_snark_point_add_end_to_end():
    trace = _add_trace(4)
    inst, vars_para, vars_input, vars_full, inputs, nc, nv, ni, nnz = \
        point_addition_gadget(*trace)

    gens = SNARKGens(nc, nv, ni, nnz)
    poly_vars, comm_vars, blind_vars, comm_para, comm_input = \
        cp_commit_witness(vars_para, vars_input, vars_full, gens, tape_seed=7)

    pt = Transcript(b"snark_example")
    proof = cp_snark_prove(inst, vars_full, inputs, gens, pt,
                           poly_vars, comm_vars, blind_vars, tape_seed=11)
    assert proof.size() > 0

    vt = Transcript(b"snark_example")
    assert cp_snark_verify(proof, inst, inputs, vt, gens, comm_para, comm_input)

    # a wrong claimed evaluation must fail verification
    bad = proof
    bad_evals = ((proof.inst_evals[0] + 1) % E2_ORDER,) + proof.inst_evals[1:]
    bad.inst_evals = bad_evals
    vt2 = Transcript(b"snark_example")
    assert not cp_snark_verify(bad, inst, inputs, vt2, gens,
                               comm_para, comm_input)


@pytest.mark.slow
def test_point_mult_253bit_fallback():
    """FC rLC-combined scalars can exceed 2^128; prove_point_mult must
    fall back to the full-width 253-bit double-and-add circuit
    (proof_runner.py n_bits escalation; the reference u128 loader would
    panic here, load_data.rs:21-23)."""
    import contextlib
    import io

    from vpin_tpu.curve.host_ec import E2_G_HOST, E2_ORDER
    from vpin_tpu.runner.proof_runner import prove_point_mult

    rng = random.Random(61)
    w_wide = rng.randrange(1 << 200, 1 << 220)      # > 2^128
    w_small = rng.randrange(1, 1 << 100)
    ws, px, py = [], [], []
    for w in (w_wide, w_small):
        P = rng.randrange(1, E2_ORDER) * E2_G_HOST
        ws.append(w)
        px.append(P.x)
        py.append(P.y)
    with contextlib.redirect_stdout(io.StringIO()) as buf:
        st = prove_point_mult(ws, px, py, tape_seed=13, full_snark=False)
    assert st.size_bytes > 0        # prove_point_mult asserts verification
