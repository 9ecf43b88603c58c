"""Synthetic stock-SNARK profiler points (Spartan-comparable).

The reference vendors profiler binaries sweeping 2^10..2^20 synthetic
R1CS instances (Spartan/profiler/snark.rs:19) and publishes single-core
numbers for 2^20: prove 4.44 s (R1CSProof) / encode 14.45 s / verify
103 ms / sat proof 47,024 B (Spartan/README.md:337-389).  This script
records the same flow — SNARK::encode, SNARK::prove (sat + eval proofs),
verify, serialized size — for our TPU prover and appends the results to
artifacts/SYNTHETIC_SNARK.md.

Usage:  python scripts/synthetic_profiler.py --k 16
        python scripts/synthetic_profiler.py --k 20
"""

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
REPO = os.path.join(os.path.dirname(__file__), "..")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, required=True,
                    help="log2 of num_cons == num_vars")
    ap.add_argument("--inputs", type=int, default=10)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts",
                                                  "SYNTHETIC_SNARK.md"))
    args = ap.parse_args()

    from vpin_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from vpin_tpu.snark.stock import (SNARK, produce_synthetic_r1cs,
                                      snark_encode)
    from vpin_tpu.snark import SNARKGens
    from vpin_tpu.transcript.merlin import Transcript

    n = 1 << args.k
    print(f"synthetic R1CS 2^{args.k}: generating...", flush=True)
    t0 = time.time()
    inst, vars_ints, inputs = produce_synthetic_r1cs(n, n, args.inputs,
                                                     args.seed)
    t_gen = time.time() - t0

    gens = SNARKGens(inst.num_cons, inst.num_vars, inst.num_inputs,
                     max(m.nnz for m in (inst.A, inst.B, inst.C)))
    t0 = time.time()
    comm, decomm = snark_encode(inst, gens)
    t_encode = time.time() - t0
    print(f"encode {t_encode:.1f}s", flush=True)

    t0 = time.time()
    pt = Transcript(b"snark_example")
    proof = SNARK.prove(inst, comm, decomm, vars_ints, inputs, gens, pt,
                        tape_seed=5)
    t_prove = time.time() - t0
    size = proof.size()
    print(f"prove {t_prove:.1f}s, {size} B", flush=True)

    t0 = time.time()
    vt = Transcript(b"snark_example")
    ok = proof.verify(comm, inst, inputs, vt, gens)
    t_verify = time.time() - t0
    assert ok, "synthetic SNARK failed to verify"
    print(f"verify {t_verify:.3f}s", flush=True)

    rec = {
        "k": args.k,
        "gen_s": round(t_gen, 1),
        "encode_s": round(t_encode, 1),
        "prove_s": round(t_prove, 1),
        "verify_s": round(t_verify, 3),
        "proof_bytes": size,
        "peak_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
    }
    print(json.dumps(rec), flush=True)
    with open(args.out, "a") as fh:
        fh.write(f"| 2^{args.k} | {rec['encode_s']} s | {rec['prove_s']} s "
                 f"| {rec['verify_s']} s | {rec['proof_bytes']} B "
                 f"| {rec['peak_rss_gb']} GB |\n")


if __name__ == "__main__":
    main()
