"""NIZK (non-preprocessing Spartan) prove/verify + instance digest."""

import random

import pytest

from vpin_tpu.curve.host_ec import E2_G_HOST, E2_ORDER
from vpin_tpu.transcript.merlin import Transcript
from vpin_tpu.gadgets.point_addition import point_addition_gadget
from vpin_tpu.snark import NIZK, NIZKGens, instance_digest

RNG = random.Random(17)


def _gadget(n):
    px, py, rx, ry, rz = [], [], [], [], []
    for _ in range(n):
        P = RNG.randrange(1, E2_ORDER) * E2_G_HOST
        R = RNG.randrange(1, E2_ORDER) * E2_G_HOST
        px.append(P.x)
        py.append(P.y)
        rx.append(R.x)
        ry.append(R.y)
        rz.append(0)
    return point_addition_gadget(px, py, rx, ry, rz)


@pytest.mark.slow
def test_nizk_prove_verify():
    inst, _, _, vars_full, inputs, nc, nv, ni, _ = _gadget(2)
    gens = NIZKGens(nc, nv, ni)
    pt = Transcript(b"nizk_example")
    proof = NIZK.prove(inst, vars_full, inputs, gens, pt, tape_seed=3)
    vt = Transcript(b"nizk_example")
    assert proof.verify(inst, inputs, vt, gens)

    # tampering with claimed r fails
    proof.r = ([x for x in proof.r[0]], [(proof.r[1][0] + 1) % E2_ORDER]
               + proof.r[1][1:])
    vt2 = Transcript(b"nizk_example")
    ok = False
    try:
        ok = proof.verify(inst, inputs, vt2, gens)
    except Exception:
        ok = False
    assert not ok


def test_instance_digest_stable():
    # the digest covers the R1CS matrices only (reference:
    # Spartan/src/r1csinstance.rs:154-158) — the point-add gadget's A/B/C
    # depend only on the number of additions, not the witness values, so
    # same-size gadgets from different points must digest identically.
    inst, *_ = _gadget(2)
    inst2, *_ = _gadget(2)
    inst3, *_ = _gadget(4)
    d1 = instance_digest(inst)
    assert isinstance(d1, bytes) and len(d1) > 0
    assert d1 == instance_digest(inst)          # deterministic
    assert d1 == instance_digest(inst2)         # witness-independent
    assert d1 != instance_digest(inst3)         # size-dependent


@pytest.mark.slow
def test_bullet_device_path_n512():
    """DotProductProofLog at n=512 exercises the foldless device bullet
    prover (coefficient-tracked cached-table MSMs); the verifier fully
    recomputes from the L/R bytes, so acceptance pins correctness."""
    from vpin_tpu.nizk.sigma import (
        DotProductProofLog, dot_product_proof_gens,
    )
    from vpin_tpu.transcript.merlin import RandomTape
    from vpin_tpu.field.prime_field import L_MODULUS as L

    n = 512
    gens = dot_product_proof_gens(n, b"test_bullet_dev")
    x = [RNG.randrange(L) for _ in range(n)]
    a = [RNG.randrange(L) for _ in range(n)]
    y = sum(xi * ai for xi, ai in zip(x, a)) % L
    bx, by = RNG.randrange(L), RNG.randrange(L)

    pt = Transcript(b"bullet_dev_test")
    tape = RandomTape(b"proof", seed=7)
    proof, Cx, Cy = DotProductProofLog.prove(gens, pt, tape, x, bx, a, y, by)

    vt = Transcript(b"bullet_dev_test")
    assert proof.verify(n, gens, vt, a, Cx, Cy)

    # tampered L breaks it
    bad = DotProductProofLog(proof.bullet, proof.delta, proof.beta,
                             proof.z1, proof.z2)
    bad.bullet.L_vec[0] = bytes(32)
    vt2 = Transcript(b"bullet_dev_test")
    assert bad.verify(n, gens, vt2, a, Cx, Cy) is False
