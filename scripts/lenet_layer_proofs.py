"""Prove the real LeNet layer witness slices (reference E4 headline).

The reference runs seven `cargo run -- L$i` proofs over the recorded
slices (script.sh:204-212, main.rs:14-46), L2/L4 mult-less; L5 is the
2.08e7-constraint instance behind the ~230 GB / ~4 h figure
(README.md:118-120).  This driver replays that flow over an exported
`rust_files_lenet/` trace directory (produced by
`python -m vpin_tpu.runner.cli lenet --export rust_files_lenet`),
in ascending size order, with intra-proof checkpointing, and appends
per-layer prove/verify time, proof size, and peak host RSS to
artifacts/LENET_PROOFS.md.

Usage:
    python scripts/lenet_layer_proofs.py --layers L7,L6,L1,L3 [--transparent]
    python scripts/lenet_layer_proofs.py --layers L5 --transparent
"""

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.join(os.path.dirname(__file__), "..")


def peak_rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=os.path.join(REPO, "rust_files_lenet"))
    ap.add_argument("--layers", default="L7,L6,L1,L3")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--transparent", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts",
                                                  "LENET_PROOFS.md"))
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from vpin_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from vpin_tpu.runner.proof_runner import prove_tag_dir

    results = []
    for layer in args.layers.split(","):
        layer = layer.strip()
        d = os.path.join(args.dir, layer)
        print(f"\n===== {layer} ({d}) =====", flush=True)
        t0 = time.time()
        total = prove_tag_dir(
            d, tape_seed=args.seed,
            full_snark=not args.transparent,
            skip_mult=layer in ("L2", "L4"),
            ckpt_dir=os.path.join(REPO, f"ckpt_lenet_{layer}"))
        wall = time.time() - t0
        rec = {
            "layer": layer,
            "mode": "transparent" if args.transparent else "full_snark",
            "proof_bytes": total[0],
            "gen_ms": total[1],
            "ver_ms": total[2],
            "wall_s": round(wall, 1),
            "peak_rss_gb": round(peak_rss_gb(), 2),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    with open(args.out, "a") as fh:
        for r in results:
            fh.write(f"| {r['layer']} | {r['mode']} | {r['proof_bytes']} B "
                     f"| {r['gen_ms']/1000:.1f} s | {r['ver_ms']/1000:.2f} s "
                     f"| {r['wall_s']} s | {r['peak_rss_gb']} GB |\n")
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
