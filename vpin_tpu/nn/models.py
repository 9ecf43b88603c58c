"""The vPIN model zoo as in-process encrypted-inference pipelines.

Workload parity (protocol constants from the reference):
  * single conv layer   — filters 3/5/7, inputs 32..256, PRF trunc 16 B
                          (src/convolution/Server.py:452-469, :86)
  * CNN A-E             — conv3x3(pad1) -> ReLU -> avgpool -> FC1 -> ReLU
                          (shift) -> FC2, PRF trunc 14 B
                          (src/cnn_networks/Server.py:34-76, :724-772)
  * LeNet-5             — 5x5 convs with the classic sparse connection
                          table, PRF trunc 13 B (src/LeNet/Server.py)

Client steps (decrypt via BSGS, ReLU, fixed-point shifting) follow the
reference client's float32 semantics exactly (cnn_networks/Client.py
:273-276, :308-321; LeNet/Client.py:322-368).
"""

from __future__ import annotations

import random
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from ..curve.weierstrass import PointW
from . import fixed_point
from .bsgs import BsgsTable
from .elgamal import CipherTensor, KeyPair, decrypt_batch, encrypt_batch
from .homomorphic import HomomorphicEngine, channel_sum
from .prf import fresh_key
from .trace import WitnessTrace

CONV_FILTERS = {
    3: np.array([[1, 0, 1], [2, 0, 2], [1, 0, 1]]),
    5: np.array([[1, 0, 0, 0, 1], [0, 0, 0, 0, 0], [2, 0, 0, 0, 2],
                 [0, 0, 0, 0, 0], [1, 0, 0, 0, 1]]),
    7: np.array([[1, 0, 0, 2, 0, 0, 1]] + [[0] * 7] * 5
                + [[1, 0, 0, 2, 0, 0, 1]]),
}

LENET_FILTER = np.array([[2, 0, 0, 0, 0], [0, 2, 0, 0, 0], [0, 0, 1, 0, 0],
                         [0, 0, 0, 2, 0], [0, 0, 0, 0, 2]])

LENET_CONNECTION_TABLE = [
    [1, 1, 1, 0, 0, 0], [0, 1, 1, 1, 0, 0], [0, 0, 1, 1, 1, 0],
    [0, 0, 0, 1, 1, 1], [1, 0, 0, 0, 1, 1], [1, 1, 0, 0, 0, 1],
    [1, 1, 1, 1, 0, 0], [0, 1, 1, 1, 1, 0], [0, 0, 1, 1, 1, 1],
    [1, 0, 0, 1, 1, 1], [1, 1, 0, 0, 1, 1], [1, 1, 1, 0, 0, 1],
    [1, 1, 0, 1, 1, 0], [0, 1, 1, 0, 1, 1], [1, 0, 1, 1, 0, 1],
    [1, 1, 1, 1, 1, 1],
]

# CNN A-E: (fc1_in, fc1_out, pool_kernel, pool_stride)
CNN_CONFIGS = {
    "A": (64, 16, 4, 4),
    "B": (64, 32, 4, 4),
    "C": (256, 16, 2, 2),
    "D": (256, 32, 2, 2),
    "E": (256, 64, 2, 2),
}


@dataclass
class WorkloadResult:
    trace: WitnessTrace
    logits: Optional[np.ndarray] = None
    timings: Dict[str, float] = field(default_factory=dict)
    layer_slices: Optional[Dict[str, tuple]] = None
    engine: Optional[HomomorphicEngine] = None
    #: True while rLC equality checks are still queued on ``engine``
    #: (run with defer_checks=True); call flush_checks() to settle them.
    checks_pending: bool = False

    def flush_checks(self):
        if self.checks_pending:
            self.engine.flush_checks()
            self.checks_pending = False

    @property
    def num_mults(self):
        if self.checks_pending:
            import warnings
            warnings.warn("WorkloadResult: rLC equality checks were "
                          "deferred and never flushed — call "
                          "flush_checks() to verify the trace",
                          stacklevel=2)
        return self.trace.num_mults

    @property
    def num_adds(self):
        return self.trace.num_adds


def load_reference_image(size: int, base_dir: str = None) -> Optional[np.ndarray]:
    """Load the reference's MNIST input image for a given size
    (src/convolution/image_mnist_<size>_<size>.npy, used by
    convolution/Client.py:296-304); None when unavailable."""
    import os
    base_dir = base_dir or os.environ.get("VPIN_REFERENCE", "/root/reference")
    path = os.path.join(base_dir, "src", "convolution",
                        f"image_mnist_{size}_{size}.npy")
    try:
        img = np.load(path)
    except (OSError, ValueError):
        return None
    return np.asarray(img, dtype=np.float32).reshape(size, size)


def make_random_weights(fc1_in: int, fc1_out: int, fc2_out: int = 10,
                        seed: int = 0) -> Dict[str, np.ndarray]:
    """Stand-in pretrained weights (same shapes/dtype scale as the .npy
    files under Pre_trained_model/)."""
    rng = np.random.RandomState(seed)
    return {
        "weight_fc1": rng.uniform(-0.5, 0.5, (fc1_in, fc1_out)).astype(np.float32),
        "bias_fc1": rng.uniform(-0.5, 0.5, (fc1_out,)).astype(np.float32),
        "weight_fc2": rng.uniform(-0.5, 0.5, (fc1_out, fc2_out)).astype(np.float32),
        "bias_fc2": rng.uniform(-0.5, 0.5, (fc2_out,)).astype(np.float32),
    }


def load_pretrained_weights(version: str = None, lenet: bool = False,
                            base_dir: str = None) -> Optional[Dict]:
    """Load the reference's pretrained .npy weights at runtime
    (reference MODEL_PATHS, src/cnn_networks/Server.py:34-60 and
    LeNet/Server.py:867-870).  base_dir defaults to $VPIN_REFERENCE;
    returns None when the files are unavailable (callers fall back to
    random weights)."""
    import os
    base_dir = base_dir or os.environ.get("VPIN_REFERENCE", "/root/reference")
    if lenet:
        d = os.path.join(base_dir, "src", "LeNet", "Pre_trained_model")
        names = {"weight_fc1": "weight_fc1_120_84.npy",
                 "bias_fc1": "bias_fc1_84.npy",
                 "weight_fc2": "weight_fc2_84_10.npy",
                 "bias_fc2": "bias_fc2_10.npy"}
    else:
        fc1_in, fc1_out, _, _ = CNN_CONFIGS[version]
        d = os.path.join(base_dir, "src", "cnn_networks", "Pre_trained_model")
        names = {"weight_fc1": f"weight_fc1_{fc1_in}_{fc1_out}.npy",
                 "bias_fc1": f"bias_fc1_{fc1_out}.npy",
                 "weight_fc2": f"weight_fc2_{fc1_out}_10.npy",
                 "bias_fc2": "bias_fc2_10.npy"}
    try:
        return {k: np.load(os.path.join(d, v)) for k, v in names.items()}
    except (OSError, ValueError):
        return None


def _interact(ct: CipherTensor, key: KeyPair, table: BsgsTable,
              relu: bool, shift_bits: Optional[int],
              rng: random.Random, max_steps=None) -> CipherTensor:
    """One client round-trip: decrypt, ReLU and/or shift, re-encrypt."""
    vals = decrypt_batch(ct, key, table, max_steps=max_steps)
    out = np.asarray(vals.tolist(), dtype=np.int64)
    if relu:
        out = np.maximum(0, out)
    if shift_bits is not None:
        out = fixed_point.shift(out, shift_bits)
    return encrypt_batch(out, key, rng)


def run_conv_workload(image: np.ndarray, filter_size: int, key: KeyPair,
                      rng: Optional[random.Random] = None,
                      padding: int = 1, stride: int = 1,
                      defer_checks: bool = False) -> WorkloadResult:
    """Single conv layer (reference src/convolution; no decryption phase —
    the client sends the image and exits).

    defer_checks=True waits for the device computation (block_until_ready,
    no device->host transfer) but leaves the rLC equality fetches queued on
    ``result.engine`` — call ``result.engine.flush_checks()`` later.  On
    remote-tunnel backends the FIRST device->host fetch of a process can
    cost minutes; this lets callers overlap it with other work."""
    rng = rng or random.Random()
    t0 = time.time()
    scaled = fixed_point.min_max_scaling(image)
    fixed = fixed_point.encode(scaled)
    ct = encrypt_batch(fixed, key, rng)
    t1 = time.time()

    eng = HomomorphicEngine(prf_trunc_bytes=16)
    filt = CONV_FILTERS[filter_size]
    for half in ct:
        eng.conv2d(half, filt, key=fresh_key(), padding=padding, stride=stride)
    if defer_checks:
        import jax
        jax.block_until_ready([c for c in eng.pending_checks])
    else:
        eng.flush_checks()
    t2 = time.time()
    res = WorkloadResult(eng.trace, timings={"encrypt": t1 - t0,
                                             "inference": t2 - t1})
    res.engine = eng
    res.checks_pending = bool(defer_checks)
    return res


def run_cnn_workload(version: str, image: np.ndarray, key: KeyPair,
                     table: BsgsTable, weights: Optional[Dict] = None,
                     rng: Optional[random.Random] = None,
                     max_steps=None) -> WorkloadResult:
    """CNN A-E (reference src/cnn_networks/Server.py inferenceCNN)."""
    rng = rng or random.Random()
    fc1_in, fc1_out, k, s = CNN_CONFIGS[version]
    weights = (weights or load_pretrained_weights(version)
               or make_random_weights(fc1_in, fc1_out))
    t0 = time.time()

    scaled = fixed_point.min_max_scaling(image)
    ct = encrypt_batch(fixed_point.encode(scaled), key, rng)

    eng = HomomorphicEngine(prf_trunc_bytes=14)
    filt = CONV_FILTERS[3]

    conv = CipherTensor(*(eng.conv2d(h, filt, key=fresh_key(),
                                     padding=1, stride=1) for h in ct))
    ct = _interact(conv, key, table, relu=True, shift_bits=None, rng=rng,
                   max_steps=max_steps)

    pooled = CipherTensor(*(eng.avgpool2d(h, k, s) for h in ct))
    flat = CipherTensor(*(PointW(*(c.reshape(-1, 16) for c in h))
                          for h in pooled))
    ct = _interact(flat, key, table, relu=False, shift_bits=26, rng=rng,
                   max_steps=max_steps)

    w1 = fixed_point.encode(weights["weight_fc1"])
    b1 = fixed_point.encode(weights["bias_fc1"])
    bias1 = encrypt_batch(b1, key, rng)
    fc1 = CipherTensor(*(eng.fc(h, w1.astype(object), bias1[i], key=fresh_key())
                         for i, h in enumerate(ct)))
    ct = _interact(fc1, key, table, relu=True, shift_bits=32, rng=rng,
                   max_steps=max_steps)

    w2 = fixed_point.encode(weights["weight_fc2"])
    b2 = fixed_point.encode(weights["bias_fc2"])
    bias2 = encrypt_batch(b2, key, rng)
    fc2 = CipherTensor(*(eng.fc(h, w2.astype(object), bias2[i], key=fresh_key())
                         for i, h in enumerate(ct)))

    logits = np.asarray(decrypt_batch(fc2, key, table, max_steps=max_steps)
                        .tolist(), dtype=np.int64)
    logits = np.maximum(0, logits)
    eng.flush_checks()

    return WorkloadResult(eng.trace, logits=logits,
                          timings={"total": time.time() - t0})


def run_lenet_workload(image: np.ndarray, key: KeyPair, table: BsgsTable,
                       weights: Optional[Dict] = None,
                       rng: Optional[random.Random] = None,
                       num_kernels=(6, 16, 120), pool=(2, 2),
                       max_steps=None) -> WorkloadResult:
    """LeNet-5 (reference src/LeNet/Server.py inferenceCNN): per-kernel
    conv/interaction loops, sparse connection table, per-layer witness
    slices L1..L7."""
    rng = rng or random.Random()
    weights = (weights or load_pretrained_weights(lenet=True)
               or make_random_weights(120, 84))
    nk1, nk2, nk3 = num_kernels
    k, s = pool
    t0 = time.time()

    scaled = fixed_point.min_max_scaling(image)
    ct0 = encrypt_batch(fixed_point.encode(scaled), key, rng)

    eng = HomomorphicEngine(prf_trunc_bytes=13)
    marks = {}

    def mark(name):
        marks[name] = (eng.trace.num_mults, eng.trace.num_adds)

    # L1: conv1 (6 kernels, same hard-coded filter, pad 0)
    conv1 = [CipherTensor(*(eng.conv2d(h, LENET_FILTER, key=fresh_key())
                            for h in ct0)) for _ in range(nk1)]
    mark("L1")
    act1 = [_interact(c, key, table, relu=True, shift_bits=None, rng=rng,
                      max_steps=max_steps) for c in conv1]

    # L2: pool1 + shift 26
    pool1 = [CipherTensor(*(eng.avgpool2d(h, k, s) for h in c)) for c in act1]
    mark("L2")
    act2 = [_interact(c, key, table, relu=False, shift_bits=26, rng=rng,
                      max_steps=max_steps) for c in pool1]

    # L3: conv2 (16 kernels over connection-table channel sums)
    conv2 = []
    for row in LENET_CONNECTION_TABLE[:nk2]:
        chans = [act2[j] for j in range(nk1) if row[j]]
        summed = CipherTensor(channel_sum([c.c1 for c in chans]),
                              channel_sum([c.c2 for c in chans]))
        conv2.append(CipherTensor(*(eng.conv2d(h, LENET_FILTER, key=fresh_key())
                                    for h in summed)))
    mark("L3")
    act3 = [_interact(c, key, table, relu=True, shift_bits=None, rng=rng,
                      max_steps=max_steps) for c in conv2]

    # L4: pool2 + shift 26
    pool2 = [CipherTensor(*(eng.avgpool2d(h, k, s) for h in c)) for c in act3]
    mark("L4")
    act4 = [_interact(c, key, table, relu=False, shift_bits=26, rng=rng,
                      max_steps=max_steps) for c in pool2]

    # L5: conv3 (120 kernels over the sum of all 16 channels)
    conv3 = []
    summed = CipherTensor(channel_sum([c.c1 for c in act4]),
                          channel_sum([c.c2 for c in act4]))
    for _ in range(nk3):
        conv3.append(CipherTensor(*(eng.conv2d(h, LENET_FILTER, key=fresh_key())
                                    for h in summed)))
    mark("L5")

    # flatten 120 single-pixel outputs into a vector, ReLU + shift 26
    vec = CipherTensor(_stack_outputs([c.c1 for c in conv3]),
                       _stack_outputs([c.c2 for c in conv3]))
    ct = _interact(vec, key, table, relu=True, shift_bits=26, rng=rng,
                   max_steps=max_steps)

    # L6: FC1 120->84, then ReLU + shift 33
    w1 = fixed_point.encode(weights["weight_fc1"])
    b1 = fixed_point.encode(weights["bias_fc1"])
    bias1 = encrypt_batch(b1, key, rng)
    fc1 = CipherTensor(*(eng.fc(h, w1.astype(object), bias1[i], key=fresh_key())
                         for i, h in enumerate(ct)))
    mark("L6")
    ct = _interact(fc1, key, table, relu=True, shift_bits=33, rng=rng,
                   max_steps=max_steps)

    # L7: FC2 84->10
    w2 = fixed_point.encode(weights["weight_fc2"])
    b2 = fixed_point.encode(weights["bias_fc2"])
    bias2 = encrypt_batch(b2, key, rng)
    fc2 = CipherTensor(*(eng.fc(h, w2.astype(object), bias2[i], key=fresh_key())
                         for i, h in enumerate(ct)))
    mark("L7")

    logits = np.maximum(0, np.asarray(
        decrypt_batch(fc2, key, table, max_steps=max_steps).tolist(),
        dtype=np.int64))
    eng.flush_checks()

    # layer slices (mult_range, add_range) in reference L1..L7 order
    slices = {}
    prev = (0, 0)
    for name in ["L1", "L2", "L3", "L4", "L5", "L6", "L7"]:
        cur = marks[name]
        slices[name] = ((prev[0], cur[0]), (prev[1], cur[1]))
        prev = cur
    return WorkloadResult(eng.trace, logits=logits,
                          timings={"total": time.time() - t0},
                          layer_slices=slices)


def _stack_outputs(halves: List[PointW]) -> PointW:
    """Stack a list of (1,1)-shaped conv outputs into a (n,) vector."""
    import jax.numpy as jnp
    return PointW(*(jnp.stack([h[i].reshape(16) for h in halves], axis=0)
                    for i in range(3)))
