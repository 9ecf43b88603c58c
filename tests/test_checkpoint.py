"""Intra-proof checkpoint/resume (utils/checkpoint.py).

The demanded behavior (SURVEY.md section 5): kill a proof mid-sumcheck
and resume to a proof that verifies — and, with a deterministic tape,
is byte-identical to the uninterrupted proof.
"""

import random

import pytest

from vpin_tpu.curve.host_ec import E2_G_HOST, E2_ORDER
from vpin_tpu.runner.proof_runner import prove_point_add, prove_point_mult
from vpin_tpu.utils.bincode import serialize_snark
from vpin_tpu.utils.checkpoint import CheckpointStore


def _add_trace(n, seed=31):
    rng = random.Random(seed)
    px, py, rx, ry, rz = [], [], [], [], []
    for _ in range(n):
        P = rng.randrange(1, E2_ORDER) * E2_G_HOST
        R = rng.randrange(1, E2_ORDER) * E2_G_HOST
        px.append(P.x); py.append(P.y)
        rx.append(R.x); ry.append(R.y); rz.append(0)
    return px, py, rx, ry, rz


class _KillAfter(CheckpointStore):
    """Store that simulates a mid-proof kill: dies (KeyboardInterrupt,
    like SIGINT) right after the k-th checkpoint write lands on disk."""

    def __init__(self, dir_path, meta, kill_after):
        super().__init__(dir_path, meta)
        self.kill_after = kill_after
        self.writes = 0

    def save(self, key, obj):
        super().save(key, obj)
        self.writes += 1
        if self.writes >= self.kill_after:
            raise KeyboardInterrupt("simulated kill mid-proof")


def test_kill_mid_sumcheck_and_resume_byte_identical(tmp_path):
    trace = _add_trace(16)          # 160 cons -> 8 sc1 + 9 sc2 rounds

    # ground truth: uninterrupted proof, same tape
    import io, contextlib
    with contextlib.redirect_stdout(io.StringIO()):
        st_ref = prove_point_add(*trace, tape_seed=21, full_snark=False)

    d = str(tmp_path / "ck")
    from vpin_tpu.runner import proof_runner as pr
    meta = {"kind": "point_add", "count": 16, "tape_seed": 21, "n_bits": 0,
            "witness": pr._witness_digest(*trace)}
    killer = _KillAfter(d, meta, kill_after=2)   # dies inside sc1/sc2
    from vpin_tpu.gadgets.point_addition import point_addition_gadget
    gadget = point_addition_gadget(*trace)
    with pytest.raises(KeyboardInterrupt):
        pr._prove_gadget(gadget, 21, True, full_snark=False, ckpt=killer)
    assert killer.writes == 2      # at least one mid-sumcheck snapshot hit disk

    # resume from the same directory with a plain store
    with contextlib.redirect_stdout(io.StringIO()):
        st_res = prove_point_add(*trace, tape_seed=21, full_snark=False,
                                 ckpt_dir=d)
    assert st_res.size_bytes == st_ref.size_bytes

    # byte-identical proofs: prove both ways explicitly
    proof_ref, *_ = pr._prove_gadget(gadget, 21, True, full_snark=False)
    proof_res, *_ = pr._prove_gadget(gadget, 21, True, full_snark=False,
                                     ckpt=CheckpointStore(d, meta))
    assert serialize_snark(proof_res) == serialize_snark(proof_ref)


def test_resume_after_sat_proof_skips_to_eval(tmp_path):
    """A completed sat phase persists; a rerun loads post_sat and still
    produces the identical proof."""
    trace = _add_trace(4, seed=33)
    from vpin_tpu.runner import proof_runner as pr
    from vpin_tpu.gadgets.point_addition import point_addition_gadget
    gadget = point_addition_gadget(*trace)
    meta = {"kind": "point_add", "count": 4, "tape_seed": 5, "n_bits": 0,
            "witness": pr._witness_digest(*trace)}

    d = str(tmp_path / "ck2")
    proof1, *_ = pr._prove_gadget(gadget, 5, True, full_snark=False,
                                  ckpt=CheckpointStore(d, meta))
    store = CheckpointStore(d, meta)
    assert store.load("post_sat") is not None
    proof2, *_ = pr._prove_gadget(gadget, 5, True, full_snark=False,
                                  ckpt=store)
    assert serialize_snark(proof2) == serialize_snark(proof1)


def test_meta_mismatch_rejected(tmp_path):
    d = str(tmp_path / "ck3")
    CheckpointStore(d, meta={"kind": "point_add", "count": 4,
                             "tape_seed": 5, "n_bits": 0})
    with pytest.raises(ValueError):
        CheckpointStore(d, meta={"kind": "point_add", "count": 8,
                                 "tape_seed": 5, "n_bits": 0})


def test_witness_mismatch_rejected(tmp_path):
    """Same shape, different witness: the resume must be refused (a stale
    dir would otherwise silently serve the previous run's commitments)."""
    d = str(tmp_path / "ck4")
    from vpin_tpu.runner import proof_runner as pr
    t1, t2 = _add_trace(4, seed=1), _add_trace(4, seed=2)
    base = {"kind": "point_add", "count": 4, "tape_seed": 5, "n_bits": 0}
    CheckpointStore(d, meta={**base, "witness": pr._witness_digest(*t1)})
    with pytest.raises(ValueError):
        CheckpointStore(d, meta={**base, "witness": pr._witness_digest(*t2)})


@pytest.mark.slow
def test_mult_checkpoint_resume(tmp_path):
    """Point-mult (the LeNet-dominant gadget): kill mid-proof, resume,
    verify."""
    rng = random.Random(41)
    ws, px, py = [], [], []
    for _ in range(2):
        ws.append(rng.randrange(1, 1 << 128))
        P = rng.randrange(1, E2_ORDER) * E2_G_HOST
        px.append(P.x); py.append(P.y)

    d = str(tmp_path / "ckm")
    from vpin_tpu.runner import proof_runner as pr
    meta = {"kind": "point_mult", "count": 2, "tape_seed": 9, "n_bits": 128,
            "witness": pr._witness_digest(ws, px, py)}
    killer = _KillAfter(d, meta, kill_after=3)
    from vpin_tpu.gadgets.point_mult import point_mult_gadget
    gadget = point_mult_gadget(ws, px, py, n=128)
    with pytest.raises(KeyboardInterrupt):
        pr._prove_gadget(gadget, 9, True, full_snark=False, ckpt=killer)

    import io, contextlib
    with contextlib.redirect_stdout(io.StringIO()):
        st = prove_point_mult(ws, px, py, tape_seed=9, full_snark=False,
                              ckpt_dir=d)
    assert st.size_bytes > 0       # prove_point_mult asserts verification
