"""SPARK (sparse-poly commitment / R1CS eval proof) tests, mirroring the
reference's sparse_mlpoly unit test plus the full CP-SNARK integration."""

import random

import pytest

from vpin_tpu.field.prime_field import L_MODULUS as L
from vpin_tpu.poly.dense import eq_evals
from vpin_tpu.transcript.merlin import Transcript, RandomTape
from vpin_tpu.snark.r1cs import SparseMat
from vpin_tpu.spark import (
    SparseMatPolyCommitmentGens, SparseMatPolyEvalProof, multi_commit,
)

RNG = random.Random(3)


def _rand_sparse(num_rows, num_cols, nnz):
    entries = []
    for _ in range(nnz):
        entries.append((RNG.randrange(num_rows), RNG.randrange(num_cols),
                        RNG.randrange(L)))
    return SparseMat(entries, num_rows, num_cols)


def _evaluate(mat, rx, ry):
    eq_rx = eq_evals(rx)
    eq_ry = eq_evals(ry)
    return mat.evaluate(eq_rx, eq_ry)


@pytest.mark.slow
def test_sparse_poly_commit_eval_roundtrip():
    # analogous to reference sparse_mlpoly.rs check_sparse_polyeval_proof
    # (256x256 matrix there; smaller here for CPU test budget)
    num_vars_x, num_vars_y = 4, 5
    num_rows, num_cols = 1 << num_vars_x, 1 << num_vars_y
    nnz = 16
    mats = [_rand_sparse(num_rows, num_cols, nnz) for _ in range(3)]

    gens = SparseMatPolyCommitmentGens(b"gens_sparse_ops", num_vars_x,
                                       num_vars_y, nnz, batch_size=3)
    comm, dense = multi_commit(mats, num_vars_x, num_vars_y, gens)

    rx = [RNG.randrange(L) for _ in range(num_vars_x)]
    ry = [RNG.randrange(L) for _ in range(num_vars_y)]
    evals = [_evaluate(m, rx, ry) for m in mats]

    pt = Transcript(b"example")
    proof = SparseMatPolyEvalProof.prove(dense, rx, ry, evals, gens, pt,
                                         RandomTape(b"proof", seed=1))
    assert proof.size() > 0

    vt = Transcript(b"example")
    assert proof.verify(comm, rx, ry, evals, gens, vt)

    # wrong evaluation must be rejected — cleanly (False) or by a clean
    # decode/consistency error, never accepted
    bad = [(evals[0] + 1) % L] + evals[1:]
    vt2 = Transcript(b"example")
    try:
        ok = proof.verify(comm, rx, ry, bad, gens, vt2)
    except Exception:
        ok = False
    assert ok is False


@pytest.mark.slow
def test_cp_snark_with_eval_proof():
    from vpin_tpu.curve.host_ec import E2_G_HOST, E2_ORDER, host_infinity
    from vpin_tpu.gadgets.point_addition import point_addition_gadget
    from vpin_tpu.snark import (
        SNARKGens, cp_commit_witness, cp_snark_prove, cp_snark_verify,
    )
    from vpin_tpu.snark.cp_snark import snark_encode

    px, py, rx_, ry_, rz = [], [], [], [], []
    for t in range(4):
        P = RNG.randrange(1, E2_ORDER) * E2_G_HOST
        R = RNG.randrange(1, E2_ORDER) * E2_G_HOST
        px.append(P.x)
        py.append(P.y)
        rx_.append(R.x)
        ry_.append(R.y)
        rz.append(0)

    inst, vars_para, vars_input, vars_full, inputs, nc, nv, ni, nnz = \
        point_addition_gadget(px, py, rx_, ry_, rz)

    gens = SNARKGens(nc, nv, ni, nnz)
    comm, decomm = snark_encode(inst, gens)

    poly_vars, comm_vars, blind_vars, comm_para, comm_input = \
        cp_commit_witness(vars_para, vars_input, vars_full, gens, tape_seed=5)

    pt = Transcript(b"snark_example")
    proof = cp_snark_prove(inst, vars_full, inputs, gens, pt,
                           poly_vars, comm_vars, blind_vars, decomm=decomm,
                           tape_seed=6, with_eval_proof=True)
    assert proof.r1cs_eval_proof is not None
    assert proof.size() > proof.r1cs_sat_proof.size()

    vt = Transcript(b"snark_example")
    assert cp_snark_verify(proof, inst, inputs, vt, gens,
                           comm_para, comm_input, comm=comm)
