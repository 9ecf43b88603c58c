"""Real reference inputs through the encrypted pipeline.

Uses the reference's shipped MNIST image
(src/convolution/image_mnist_32_32.npy) and pretrained CNN weights
(src/cnn_networks/Pre_trained_model/*.npy, MODEL_PATHS at
Server.py:34-60) — the data every reference run consumes — instead of
synthetic stand-ins.  Skips cleanly when the reference tree is absent.
"""

import random

import numpy as np
import pytest

from vpin_tpu.nn import BsgsTable, KeyPair
from vpin_tpu.nn.models import (
    CNN_CONFIGS, load_pretrained_weights, load_reference_image,
    run_conv_workload, run_cnn_workload,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def real_image():
    img = load_reference_image(32)
    if img is None:
        pytest.skip("reference image_mnist_32_32.npy not present")
    return img


def test_reference_image_shape_and_range(real_image):
    assert real_image.shape == (32, 32)
    assert np.isfinite(real_image).all()


def test_conv3_real_image_witness_counts(real_image):
    """E3 single-conv on the real image: the rLC collapse must emit
    exactly f^2 mults + f^2-1 adds per ciphertext half
    (reference convolution/Server.py rLCR)."""
    key = KeyPair.generate(random.Random(7))
    res = run_conv_workload(real_image, 3, key, random.Random(8))
    assert res.num_mults == 2 * 9
    assert res.num_adds == 2 * 8


def test_cnn_a_pretrained_real_image_logits(real_image):
    """CNN-A with the reference's pretrained weights on the real 32x32
    MNIST image: the encrypted pipeline must produce finite, stable
    logits and the reference's witness counts (conv 9 mults/half,
    pool(4,4) on 32x32 -> 64 windows x 15 adds, FC1 64->16,
    FC2 16->10)."""
    weights = load_pretrained_weights("A")
    if weights is None:
        pytest.skip("reference Pre_trained_model not present")
    fc1_in, fc1_out, k, s = CNN_CONFIGS["A"]
    assert weights["weight_fc1"].shape == (fc1_in, fc1_out)

    key = KeyPair.generate(random.Random(9))
    # m = 2^21 covers the shift-26 decode range of the real activations
    table = BsgsTable.build(m=1 << 21, chunk=1 << 16)
    res = run_cnn_workload("A", real_image, key, table, weights=weights,
                           rng=random.Random(10), max_steps=3_000_000)
    assert res.logits.shape == (10,)
    assert np.isfinite(np.asarray(res.logits, dtype=np.float64)).all()
    # witness counts: per half — conv 9+8, pool 64*15 adds,
    # FC1: 16 bias adds + 64 mults + 63 chain adds,
    # FC2: 10 bias adds + 16 mults + 15 chain adds
    assert res.num_mults == 2 * (9 + fc1_in + fc1_out)
    assert res.num_adds == 2 * (8 + 64 * 15 + fc1_out + (fc1_in - 1)
                                + 10 + (fc1_out - 1))

    # determinism: same seeds -> same logits (stability)
    res2 = run_cnn_workload("A", real_image, key, table, weights=weights,
                            rng=random.Random(10), max_steps=3_000_000)
    assert np.array_equal(np.asarray(res.logits), np.asarray(res2.logits))
