"""Regenerate the golden challenge-stream vectors under crosscheck/golden/.

Run after any INTENTIONAL transcript change (there should be none — the
stream is wire format):  python crosscheck/gen_golden.py
"""

import json
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def build_fixture():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from vpin_tpu.curve.host_ec import E2_G_HOST, E2_ORDER
    from vpin_tpu.gadgets.point_addition import point_addition_gadget

    rng = random.Random(2024)
    px, py, rx, ry, rz = [], [], [], [], []
    for t in range(2):
        P = rng.randrange(1, E2_ORDER) * E2_G_HOST
        if t == 1:
            rz.append(1)
            rx.append(0)
            ry.append(0)
        else:
            R = rng.randrange(1, E2_ORDER) * E2_G_HOST
            rz.append(0)
            rx.append(R.x)
            ry.append(R.y)
        px.append(P.x)
        py.append(P.y)
    return point_addition_gadget(px, py, rx, ry, rz)


def challenge_streams():
    from vpin_tpu.transcript.merlin import Transcript
    from vpin_tpu.snark import (
        SNARKGens, cp_commit_witness, cp_snark_prove, cp_snark_verify,
    )

    inst, vp, vi, vf, inputs, nc, nv, ni, nnz = build_fixture()
    gens = SNARKGens(nc, nv, ni, nnz)
    poly_vars, comm_vars, blind_vars, comm_para, comm_input = \
        cp_commit_witness(vp, vi, vf, gens, tape_seed=11)

    prover_log = []
    pt = Transcript(b"snark_example", log=prover_log)
    proof = cp_snark_prove(inst, vf, inputs, gens, pt, poly_vars, comm_vars,
                           blind_vars, tape_seed=11, with_eval_proof=False)

    verifier_log = []
    vt = Transcript(b"snark_example", log=verifier_log)
    assert cp_snark_verify(proof, inst, inputs, vt, gens,
                           comm_para, comm_input)

    from vpin_tpu.utils.bincode import serialize_snark
    return {
        "fixture": "point_add_cp_2adds_seed2024_tape11_transparent",
        "prover_challenges": prover_log,
        "verifier_challenges": verifier_log,
        "proof_hex": serialize_snark(proof).hex(),
    }


def challenge_streams_full_snark():
    """Point-add CP-SNARK WITH the SPARK eval proof: pins the entire
    eval-proof transcript (derefs commit, product layer, hash layer —
    reference sparse_mlpoly.rs:699-1572), the weakest-covered component."""
    from vpin_tpu.transcript.merlin import Transcript
    from vpin_tpu.snark import (
        SNARKGens, cp_commit_witness, cp_snark_prove, cp_snark_verify,
        snark_encode,
    )

    inst, vp, vi, vf, inputs, nc, nv, ni, nnz = build_fixture()
    gens = SNARKGens(nc, nv, ni, nnz)
    comm, decomm = snark_encode(inst, gens)
    poly_vars, comm_vars, blind_vars, comm_para, comm_input = \
        cp_commit_witness(vp, vi, vf, gens, tape_seed=11)

    prover_log = []
    pt = Transcript(b"snark_example", log=prover_log)
    proof = cp_snark_prove(inst, vf, inputs, gens, pt, poly_vars, comm_vars,
                           blind_vars, decomm=decomm, tape_seed=11,
                           with_eval_proof=True)

    verifier_log = []
    vt = Transcript(b"snark_example", log=verifier_log)
    assert cp_snark_verify(proof, inst, inputs, vt, gens,
                           comm_para, comm_input, comm=comm)

    from vpin_tpu.utils.bincode import serialize_snark
    return {
        "fixture": "point_add_cp_2adds_seed2024_tape11_full_snark",
        "prover_challenges": prover_log,
        "verifier_challenges": verifier_log,
        "proof_hex": serialize_snark(proof).hex(),
    }


def build_mult_fixture(n_mults: int = 2, n_bits: int = 128):
    """Point-mult gadget witness: Q = a*P at the reference's n=128 bit
    width (load_data.rs:62), the dominant workload circuit (27n+8 = 3464
    constraints per mult, point_mult.rs:61-62)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from vpin_tpu.curve.host_ec import E2_G_HOST, E2_ORDER
    from vpin_tpu.gadgets.point_mult import point_mult_gadget

    rng = random.Random(2025)
    ws, px, py = [], [], []
    for _ in range(n_mults):
        ws.append(rng.randrange(1, 1 << n_bits))
        P = rng.randrange(1, E2_ORDER) * E2_G_HOST
        px.append(P.x)
        py.append(P.y)
    return point_mult_gadget(ws, px, py, n=n_bits)


def challenge_streams_mult():
    """Point-mult CP-SNARK (transparent): pins the 27n+8 circuit's sat
    transcript and proof bytes at the real n=128 width."""
    from vpin_tpu.transcript.merlin import Transcript
    from vpin_tpu.snark import (
        SNARKGens, cp_commit_witness, cp_snark_prove, cp_snark_verify,
    )

    inst, vp, vi, vf, inputs, nc, nv, ni, nnz = build_mult_fixture()
    gens = SNARKGens(nc, nv, ni, nnz)
    poly_vars, comm_vars, blind_vars, comm_para, comm_input = \
        cp_commit_witness(vp, vi, vf, gens, tape_seed=11)

    prover_log = []
    pt = Transcript(b"snark_example", log=prover_log)
    proof = cp_snark_prove(inst, vf, inputs, gens, pt, poly_vars, comm_vars,
                           blind_vars, tape_seed=11, with_eval_proof=False)

    verifier_log = []
    vt = Transcript(b"snark_example", log=verifier_log)
    assert cp_snark_verify(proof, inst, inputs, vt, gens,
                           comm_para, comm_input)

    from vpin_tpu.utils.bincode import serialize_snark
    return {
        "fixture": "point_mult_cp_2mults_n128_seed2025_tape11_transparent",
        "prover_challenges": prover_log,
        "verifier_challenges": verifier_log,
        "proof_hex": serialize_snark(proof).hex(),
    }


def challenge_streams_mult_full_snark():
    """Point-mult CP-SNARK WITH the SPARK eval proof — the dominant
    real-run transcript (every reference run proves the 27n+8 circuit
    through main.rs:14-46 with the full eval proof).  Pins the
    mult+SPARK challenge stream and proof bytes at n=128."""
    from vpin_tpu.transcript.merlin import Transcript
    from vpin_tpu.snark import (
        SNARKGens, cp_commit_witness, cp_snark_prove, cp_snark_verify,
        snark_encode,
    )

    inst, vp, vi, vf, inputs, nc, nv, ni, nnz = build_mult_fixture()
    gens = SNARKGens(nc, nv, ni, nnz)
    comm, decomm = snark_encode(inst, gens)
    poly_vars, comm_vars, blind_vars, comm_para, comm_input = \
        cp_commit_witness(vp, vi, vf, gens, tape_seed=11)

    prover_log = []
    pt = Transcript(b"snark_example", log=prover_log)
    proof = cp_snark_prove(inst, vf, inputs, gens, pt, poly_vars, comm_vars,
                           blind_vars, decomm=decomm, tape_seed=11,
                           with_eval_proof=True)

    verifier_log = []
    vt = Transcript(b"snark_example", log=verifier_log)
    assert cp_snark_verify(proof, inst, inputs, vt, gens,
                           comm_para, comm_input, comm=comm)

    from vpin_tpu.utils.bincode import serialize_snark
    return {
        "fixture": "point_mult_cp_2mults_n128_seed2025_tape11_full_snark",
        "prover_challenges": prover_log,
        "verifier_challenges": verifier_log,
        "proof_hex": serialize_snark(proof).hex(),
    }


FIXTURES = {
    "point_add_cp_challenges.json": challenge_streams,
    "point_add_cp_full_snark_challenges.json": challenge_streams_full_snark,
    "point_mult_cp_challenges.json": challenge_streams_mult,
    "point_mult_cp_full_snark_challenges.json": challenge_streams_mult_full_snark,
}


if __name__ == "__main__":
    for fname, fn in FIXTURES.items():
        out = fn()
        dst = os.path.join(os.path.dirname(__file__), "golden", fname)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(dst, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"wrote {dst}: {len(out['prover_challenges'])} prover / "
              f"{len(out['verifier_challenges'])} verifier challenges, "
              f"proof {len(out['proof_hex']) // 2} B")
