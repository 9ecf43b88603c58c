"""Sharded prover kernels (parallel/ops.py) — direct coverage.

Each shard_map'd kernel must be bit-identical to its single-device
fallback (the partial combines are exact modular sums, not float psums),
and the full sharded CP-SNARK must produce byte-identical proofs to the
single-host prover under the same deterministic tape.

Reference behaviors being replaced: rayon row-parallel Hyrax commits
(Spartan/src/dense_mlpoly.rs:160-175) and the 8-process point-sum
(src/cnn_networks/Server.py:170-208).
"""

import random

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vpin_tpu.field.prime_field import FQ, L_MODULUS as L
from vpin_tpu.parallel import use_mesh
from vpin_tpu.parallel.mesh import default_mesh

RNG = random.Random(17)


def _mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return default_mesh(8)


def _rand_table(n):
    return FQ.to_mont([RNG.randrange(L) for _ in range(n)])


def test_sharded_round_evals_match_single_device():
    from vpin_tpu.parallel.ops import sharded_round_evals
    from vpin_tpu.sumcheck.sumcheck import _ROUND_JIT, _ROUND_PARTIALS

    n = 128  # n2 = 64, divisible by 8
    for kind, n_tables in (("quad", 2), ("cubic", 3), ("cubic_additive", 4)):
        tables = tuple(_rand_table(n) for _ in range(n_tables))
        with use_mesh(_mesh8()):
            got = sharded_round_evals(_ROUND_PARTIALS[kind], tables)
        assert got is not None, f"{kind}: mesh kernel did not engage"
        want = _ROUND_JIT[kind](*tables)
        for g, w in zip(got, want):
            assert int(FQ.from_mont(g)) == int(FQ.from_mont(w)), kind


def test_sharded_bound_top_matches_single_device():
    from vpin_tpu.parallel.ops import sharded_bound_top
    from vpin_tpu.poly.dense import _bound_top

    Z = _rand_table(64)
    r = FQ.to_mont([RNG.randrange(L)])[0]
    with use_mesh(_mesh8()):
        got = sharded_bound_top(Z, r)
    assert got is not None
    want = _bound_top(Z, FQ.to_mont([int(FQ.from_mont(r))]))
    assert [int(v) for v in FQ.from_mont(got)] == \
           [int(v) for v in FQ.from_mont(want)]


def test_sharded_msm_digits_matches_single_device():
    from vpin_tpu.curve.ristretto import RISTRETTO as R
    from vpin_tpu.curve.msm import host_digits, msm_digits, build_table
    from vpin_tpu.commit.pedersen import MultiCommitGens

    rows, n = 8, 4
    gens = MultiCommitGens.new(n, b"test_parallel_msm")
    table = build_table(R, gens.G, n)
    digits = jnp.asarray(np.stack(
        [host_digits([RNG.randrange(L) for _ in range(n)])
         for _ in range(rows)]))
    want = R.encode_bytes(msm_digits(R, table, digits))
    with use_mesh(_mesh8()):
        from vpin_tpu.parallel.ops import sharded_msm_digits
        got = sharded_msm_digits(R, table, digits)
    assert got is not None, "mesh MSM kernel did not engage"
    assert R.encode_bytes(got) == want


def test_sharded_regular_reduce_matches():
    from vpin_tpu.parallel.ops import sharded_regular_reduce

    nseg, k, nz = 16, 4, 32
    vals = FQ.to_mont([RNG.randrange(L) for _ in range(nseg * k)]
                      ).reshape(nseg, k, 16)
    idx = jnp.asarray(np.array([[RNG.randrange(nz) for _ in range(k)]
                                for _ in range(nseg)], dtype=np.int32))
    z = _rand_table(nz)
    with use_mesh(_mesh8()):
        got = sharded_regular_reduce(vals, idx, z, nseg)
    assert got is not None
    vals_h = np.asarray(FQ.from_mont(vals.reshape(nseg * k, 16))).reshape(nseg, k)
    z_h = [int(v) for v in FQ.from_mont(z)]
    idx_h = np.asarray(idx)
    want = [sum(int(vals_h[s, j]) * z_h[idx_h[s, j]] for j in range(k)) % L
            for s in range(nseg)]
    assert [int(v) for v in FQ.from_mont(got)] == want


@pytest.mark.slow
def test_mesh_cp_snark_bytes_equal_single_host():
    """Full point-add CP-SNARK on the 8-device mesh: proof bytes must
    equal the single-host proof under the same deterministic tape
    (the claim README makes; also what dryrun_multichip asserts)."""
    from vpin_tpu.gadgets.point_addition import point_addition_gadget
    from vpin_tpu.snark import SNARKGens
    from vpin_tpu.utils.bincode import serialize_snark
    from vpin_tpu.curve.host_ec import E2_G_HOST, E2_ORDER
    import __graft_entry__ as g

    rng = random.Random(23)
    px, py, rx, ry, rz = [], [], [], [], []
    for _ in range(4):
        P1 = rng.randrange(1, E2_ORDER) * E2_G_HOST
        R1 = rng.randrange(1, E2_ORDER) * E2_G_HOST
        px.append(P1.x); py.append(P1.y)
        rx.append(R1.x); ry.append(R1.y); rz.append(0)

    gadget = point_addition_gadget(px, py, rx, ry, rz)
    nc, nv, ni, nnz = gadget[5], gadget[6], gadget[7], gadget[8]
    gens = SNARKGens(nc, nv, ni, nnz)
    proof_host, ok_host = g._prove_once(gadget, gens, tape_seed=11)
    assert ok_host

    with use_mesh(_mesh8()):
        gadget_dev = point_addition_gadget(px, py, rx, ry, rz, device=True)
        proof_mesh, ok_mesh = g._prove_once(gadget_dev, gens, tape_seed=11)
    assert ok_mesh
    assert serialize_snark(proof_mesh) == serialize_snark(proof_host)


@pytest.mark.slow
def test_mesh_cp_snark_mult_circuit_bytes_equal_single_host():
    """The DOMINANT circuit sharded: a full-width (n=128) point-mult
    CP-SNARK on the 8-device mesh, byte-equal to single-host (what
    dryrun_multichip now exercises)."""
    from vpin_tpu.gadgets.point_mult import point_mult_gadget
    from vpin_tpu.snark import SNARKGens
    from vpin_tpu.utils.bincode import serialize_snark
    from vpin_tpu.curve.host_ec import E2_G_HOST, E2_ORDER
    import __graft_entry__ as g

    rng = random.Random(29)
    ws, px, py = [], [], []
    for _ in range(1):
        ws.append(rng.randrange(1, 1 << 128))
        P1 = rng.randrange(1, E2_ORDER) * E2_G_HOST
        px.append(P1.x); py.append(P1.y)

    gadget = point_mult_gadget(ws, px, py, device=True)
    nc, nv, ni, nnz = gadget[5], gadget[6], gadget[7], gadget[8]
    gens = SNARKGens(nc, nv, ni, nnz)
    proof_host, ok_host = g._prove_once(gadget, gens, tape_seed=13)
    assert ok_host

    with use_mesh(_mesh8()):
        gadget_dev = point_mult_gadget(ws, px, py, device=True)
        proof_mesh, ok_mesh = g._prove_once(gadget_dev, gens, tape_seed=13)
    assert ok_mesh
    assert serialize_snark(proof_mesh) == serialize_snark(proof_host)
