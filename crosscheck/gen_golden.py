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


if __name__ == "__main__":
    out = challenge_streams()
    dst = os.path.join(os.path.dirname(__file__), "golden",
                       "point_add_cp_challenges.json")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {dst}: {len(out['prover_challenges'])} prover / "
          f"{len(out['verifier_challenges'])} verifier challenges, "
          f"proof {len(out['proof_hex']) // 2} B")
