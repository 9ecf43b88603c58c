"""Headline benchmark: conv3/32x32 encrypted inference + PROOF GENERATION.

Reference E3 (single conv layer, filter 3, input 32x32) runs inference
AND `cargo run -- 3_32` proof generation; its envelope is "2-60 minutes"
on a 48-core Xeon (reference README.md:136-138).  The primary metric here
is the same end-to-end path — encrypt, homomorphic conv with rLC witness
recording, CP-SNARK prove (point-add + point-mult gadgets, full SPARK
eval proof) and verify — against the envelope FLOOR (120 s), i.e. the
most conservative possible baseline.

Also reported:
  * warm inference-only and prove/verify split timings,
  * proof size in real bincode bytes,
  * a 4096-point MSM microbenchmark (windowed-table vs naive ladder),
  * a synthetic 2^16 R1CS stock-SNARK prove/verify (Spartan profiler
    comparison point; reference numbers at 2^20: prove 39.13 s,
    verify 103 ms on 1 CPU core, Spartan/README.md:337-389).

Prints ONE JSON line.
"""

import json
import os
import random
import sys
import time

import numpy as np


def _time(fn, *args, **kw):
    t0 = time.time()
    out = fn(*args, **kw)
    return out, time.time() - t0


def main():
    import jax

    from vpin_tpu.nn.elgamal import KeyPair
    from vpin_tpu.nn.models import run_conv_workload
    from vpin_tpu.runner.proof_runner import prove_trace

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    key = KeyPair.generate(random.Random(0))
    rng = np.random.RandomState(0)
    img = rng.uniform(0.0, 1.0, (size, size)).astype(np.float32)

    # --- inference (cold pays XLA compilation, warm is steady-state) ---
    res, cold_inf = _time(run_conv_workload, img, 3, key, random.Random(1))
    res, warm_inf = _time(run_conv_workload, img, 3, key, random.Random(2))

    # --- proof generation + verification over the recorded witness ----
    out = {}
    if os.environ.get("VPIN_BENCH_PROVE", "1") != "0":
        import io
        import contextlib
        buf = io.StringIO()
        t0 = time.time()
        with contextlib.redirect_stdout(buf):
            total_size, gen_ms, ver_ms = prove_trace(res.trace, tape_seed=3)
        prove_wall = time.time() - t0
        out.update({
            "prove_s": round(gen_ms / 1000.0, 3),
            "verify_s": round(ver_ms / 1000.0, 3),
            "proof_bytes": int(total_size),
            "prove_wall_s": round(prove_wall, 3),
        })
        e2e = warm_inf + prove_wall
    else:
        e2e = warm_inf

    # --- MSM microbenchmark: windowed table vs naive ladder ------------
    if os.environ.get("VPIN_BENCH_MSM", "1") != "0":
        import jax.numpy as jnp
        from vpin_tpu.field.prime_field import L_MODULUS as L
        from vpin_tpu.curve.ristretto import RISTRETTO as R
        from vpin_tpu.curve.weierstrass import scalars_to_bits
        from vpin_tpu.curve.msm import host_digits, msm_oneshot
        from vpin_tpu.commit.pedersen import MultiCommitGens, commit_vec_ints

        n = 4096
        mrng = random.Random(9)
        scalars = [mrng.randrange(L) for _ in range(n)]
        gens = MultiCommitGens.new(n, b"bench_msm")

        # fixed-base table path (gens table cached after first call)
        _ = commit_vec_ints(scalars, 0, gens)
        pt, t_table = _time(lambda: jax.block_until_ready(
            commit_vec_ints(scalars, 0, gens).x))

        # naive 253-round ladder (the round-1 implementation)
        bits = scalars_to_bits(scalars, 253)
        _ = R.psum_points(R.pscalar_mul_bits(gens.G, bits), axis=0)
        lad, t_ladder = _time(lambda: jax.block_until_ready(
            R.psum_points(R.pscalar_mul_bits(gens.G, bits), axis=0).x))
        out.update({
            "msm4096_table_ms": round(t_table * 1000, 1),
            "msm4096_ladder_ms": round(t_ladder * 1000, 1),
            "msm_speedup": round(t_ladder / t_table, 2),
        })

    # --- synthetic stock SNARK (Spartan profiler point) ----------------
    sc = int(os.environ.get("VPIN_BENCH_SYNTH", "16"))
    if sc > 0:
        from vpin_tpu.snark import snark_prove_synthetic
        t0 = time.time()
        proof, ok, psize = snark_prove_synthetic(1 << sc, 1 << sc, 10,
                                                 seed=1, tape_seed=5)
        out.update({
            f"synthetic_2^{sc}_snark_s": round(time.time() - t0, 3),
            f"synthetic_2^{sc}_proof_bytes": int(psize),
            f"synthetic_2^{sc}_verified": bool(ok),
        })

    baseline_s = 120.0  # reference E3 envelope floor (includes proving)
    print(json.dumps({
        "metric": f"conv3_{size}x{size}_e2e_inference_plus_proof",
        "value": round(e2e, 3),
        "unit": "s",
        "vs_baseline": round(baseline_s / e2e, 2),
        "inference_warm_s": round(warm_inf, 3),
        "inference_cold_s": round(cold_inf, 3),
        "num_mults": int(res.num_mults),
        "num_adds": int(res.num_adds),
        "device": str(jax.devices()[0]),
        **out,
    }))


if __name__ == "__main__":
    main()
