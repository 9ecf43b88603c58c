"""Executable CNN / LeNet workload tests at reduced scale.

Exercises the full encrypted-inference pipelines of nn/models.py end to
end (encrypt -> conv -> client interactions via BSGS -> pool -> FC ->
decrypt), including the signed-FC-weight rLC combination (sign-folded
witness recording) that the reference's own u128 export would crash on
(reference: src/cnn_networks/Server.py:226-250, load_data.rs:21-23).
"""

import random

import numpy as np
import pytest

from vpin_tpu.nn import BsgsTable, KeyPair
from vpin_tpu.nn.models import (
    load_pretrained_weights, run_cnn_workload, run_lenet_workload,
)

pytestmark = pytest.mark.slow


def test_pretrained_weight_loader():
    """Reference Pre_trained_model/ .npy weights load with the right
    shapes when available; missing files fall back to None."""
    for v, (fc1_in, fc1_out, _, _) in {"A": (64, 16, 4, 4),
                                       "E": (256, 64, 2, 2)}.items():
        w = load_pretrained_weights(v)
        if w is None:
            pytest.skip("reference Pre_trained_model not present")
        assert w["weight_fc1"].shape == (fc1_in, fc1_out)
        assert w["weight_fc2"].shape == (fc1_out, 10)
    assert load_pretrained_weights("A", base_dir="/nonexistent") is None

RNG = np.random.RandomState(11)


@pytest.fixture(scope="module")
def table():
    # m = 2^20 keeps giant-step counts small for the post-pool shift-26
    # decrypts (values up to ~2^32); built on device in chunks.
    return BsgsTable.build(m=1 << 20, chunk=1 << 16)


@pytest.fixture(scope="module")
def keypair():
    return KeyPair.generate(random.Random(5))


def _tiny_weights(n_in, n_hidden, n_out=10, seed=3, scale=1e-3):
    """Signed weights, small enough that FC outputs stay BSGS-decodable."""
    rng = np.random.RandomState(seed)
    return {
        "weight_fc1": rng.uniform(-scale, scale, (n_in, n_hidden)).astype(np.float32),
        "bias_fc1": rng.uniform(-scale, scale, (n_hidden,)).astype(np.float32),
        "weight_fc2": rng.uniform(-scale, scale, (n_hidden, n_out)).astype(np.float32),
        "bias_fc2": rng.uniform(-scale, scale, (n_out,)).astype(np.float32),
    }


def test_cnn_workload_reduced(table, keypair):
    """CNN version A pipeline on an 8x8 image (pool 4x4 -> 4 FC inputs)."""
    img = RNG.rand(8, 8)
    weights = _tiny_weights(4, 6)
    res = run_cnn_workload("A", img, keypair, table, weights=weights,
                           rng=random.Random(2), max_steps=100_000)
    # conv: 9 mults + 8 adds per half; pool(4,4) on 8x8: 4 windows x 15 adds;
    # FC1 4->6: 6 bias adds + 4 mults + 3 chain adds; FC2 6->10: 10 + 6 + 5.
    assert res.num_mults == 2 * (9 + 4 + 6)
    assert res.num_adds == 2 * (8 + 60 + 6 + 3 + 10 + 5)
    assert res.logits.shape == (10,)
    # signed weights => some rLC-combined scalars were negative; the
    # recorded witness must stay u128-compatible
    assert all(0 <= int(s) < (1 << 128) or int(s) < (1 << 253)
               for s in res.trace.mult_scalars)


def test_lenet_workload_reduced(table, keypair):
    """LeNet-5 geometry (32x32) with (1, 1, 2) kernels per conv stage."""
    img = RNG.rand(32, 32)
    weights = _tiny_weights(2, 3)
    res = run_lenet_workload(img, keypair, table, weights=weights,
                             rng=random.Random(4), num_kernels=(1, 1, 2),
                             max_steps=100_000)
    # L1: 1 kernel x 2 halves x 25; L3: same; L5: 2 kernels x 2 x 25;
    # L6: 2 mults x 2 halves; L7: 3 mults x 2 halves.
    assert res.num_mults == 50 + 50 + 100 + 4 + 6
    assert res.logits.shape == (10,)
    sl = res.layer_slices
    assert set(sl) == {f"L{i}" for i in range(1, 8)}
    assert sl["L2"][0][0] == sl["L2"][0][1]  # pool layers record no mults
    assert sl["L4"][0][0] == sl["L4"][0][1]
    assert sl["L5"][0][1] - sl["L5"][0][0] == 100
    assert sl["L7"][0][1] == res.num_mults
