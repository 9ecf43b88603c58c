"""Headline benchmark: single-conv encrypted inference (reference E3).

Runs the 3x3-filter / 32x32-image encrypted conv workload — encryption,
homomorphic conv on both ciphertext halves, rLC verification, witness
recording — on the available accelerator and prints ONE JSON line.

Baseline: the reference's E3 envelope is "2-60 minutes" per single conv
on a 48-core Xeon (README.md:136-138); we take the most favorable end
(120 s) as the comparison point.
"""

import json
import random
import sys
import time

import numpy as np


def main():
    import jax

    from vpin_tpu.nn.elgamal import KeyPair
    from vpin_tpu.nn.models import run_conv_workload

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    key = KeyPair.generate(random.Random(0))
    rng = np.random.RandomState(0)
    img = rng.uniform(0.0, 1.0, (size, size)).astype(np.float32)

    # run twice: first run pays one-time XLA compilation, second run is the
    # steady-state number a serving deployment would see.
    t0 = time.time()
    res = run_conv_workload(img, 3, key, random.Random(1))
    cold = time.time() - t0

    t0 = time.time()
    res = run_conv_workload(img, 3, key, random.Random(2))
    warm = time.time() - t0

    baseline_s = 120.0  # reference E3 lower envelope
    print(json.dumps({
        "metric": f"conv3_{size}x{size}_encrypted_inference_warm",
        "value": round(warm, 3),
        "unit": "s",
        "vs_baseline": round(baseline_s / warm, 2),
        "cold_s": round(cold, 3),
        "num_mults": int(res.num_mults),
        "num_adds": int(res.num_adds),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
