"""CLI entry points mirroring the reference's script.sh workloads.

  python -m vpin_tpu.runner.cli conv   --filter 3 --size 32
  python -m vpin_tpu.runner.cli cnn    --version A
  python -m vpin_tpu.runner.cli lenet
  python -m vpin_tpu.runner.cli prove  --dir rust_files/A
  python -m vpin_tpu.runner.cli bsgs   --m 3200000

Each workload runs client+server in-process (socket mode is unnecessary
for proofs; the transport layer of the reference is incidental), records
the witness trace, exports reference-compatible JSON, and can chain
straight into proof generation.
"""

from __future__ import annotations

import argparse
import random
import sys
import time

import numpy as np


def _make_image(size: int, seed: int = 5) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.uniform(0.0, 1.0, (size, size)).astype(np.float32)


def cmd_conv(args):
    from ..nn.elgamal import KeyPair
    from ..nn.models import run_conv_workload
    from .proof_runner import prove_trace

    key = KeyPair.generate(random.Random(args.seed))
    img = _make_image(args.size, args.seed)
    t0 = time.time()
    res = run_conv_workload(img, args.filter, key, random.Random(args.seed))
    print(f"Server: Number of EC point multiplications: {res.num_mults}")
    print(f"Server: Number of EC point additions: {res.num_adds}")
    print(f"Inference time: {time.time() - t0:.2f} s")
    if args.export:
        res.trace.export_json(args.export)
        print(f"Witness JSON exported to {args.export}")
    if args.prove:
        prove_trace(res.trace, tape_seed=args.seed,
                    full_snark=not args.transparent)


def cmd_cnn(args):
    from ..nn.bsgs import BsgsTable
    from ..nn.elgamal import KeyPair
    from ..nn.models import run_cnn_workload
    from .proof_runner import prove_trace

    key = KeyPair.generate(random.Random(args.seed))
    table = BsgsTable.build(m=args.bsgs_m, cache_path=args.bsgs_cache)
    img = _make_image(args.size, args.seed)
    res = run_cnn_workload(args.version, img, key, table,
                           rng=random.Random(args.seed))
    print(f"Server: Number of EC point multiplications: {res.num_mults}")
    print(f"Server: Number of EC point additions: {res.num_adds}")
    print(f"Logits: {res.logits.tolist()}")
    if args.export:
        res.trace.export_json(args.export)
    if args.prove:
        prove_trace(res.trace, tape_seed=args.seed,
                    full_snark=not args.transparent)


def cmd_lenet(args):
    from ..nn.bsgs import BsgsTable
    from ..nn.elgamal import KeyPair
    from ..nn.models import run_lenet_workload
    from .proof_runner import prove_trace

    key = KeyPair.generate(random.Random(args.seed))
    table = BsgsTable.build(m=args.bsgs_m, cache_path=args.bsgs_cache)
    img = _make_image(args.size, args.seed)
    res = run_lenet_workload(img, key, table, rng=random.Random(args.seed))
    print(f"Server: Number of EC point multiplications: {res.num_mults}")
    print(f"Server: Number of EC point additions: {res.num_adds}")
    for name, (msl, asl) in res.layer_slices.items():
        print(f"  {name}: mults {msl} adds {asl}")
    if args.export:
        fin = res.trace.finalize()
        for name, (msl, asl) in res.layer_slices.items():
            res.trace.export_json(f"{args.export}/{name}", mult_slice=msl,
                                  add_slice=asl, _finalized=fin)
    if args.prove:
        for name, (msl, asl) in res.layer_slices.items():
            print(f"\n=== layer {name} ===")
            prove_trace(res.trace, tape_seed=args.seed,
                        mult_slice=msl, add_slice=asl,
                        full_snark=not args.transparent)


def cmd_prove(args):
    from .proof_runner import prove_tag_dir
    prove_tag_dir(args.dir, tape_seed=args.seed,
                  full_snark=not args.transparent)


def cmd_bsgs(args):
    from ..nn.bsgs import BsgsTable
    t0 = time.time()
    table = BsgsTable.build(m=args.m, cache_path=args.cache)
    print(f"BSGS table built: m={table.m} entries={len(table.keys_sorted)} "
          f"in {time.time() - t0:.1f} s")


def main(argv=None):
    p = argparse.ArgumentParser(prog="vpin-tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("conv", help="single conv layer workload (E3)")
    c.add_argument("--filter", type=int, default=3, choices=[3, 5, 7])
    c.add_argument("--size", type=int, default=32)
    c.add_argument("--seed", type=int, default=0)
    c.add_argument("--export", type=str, default=None)
    c.add_argument("--prove", action="store_true")
    c.add_argument("--transparent", action="store_true",
                   help="skip the R1CS eval proof (verifier reads matrices)")
    c.set_defaults(fn=cmd_conv)

    c = sub.add_parser("cnn", help="CNN A-E workload (E2)")
    c.add_argument("--version", type=str, default="A", choices=list("ABCDE"))
    c.add_argument("--size", type=int, default=32)
    c.add_argument("--seed", type=int, default=0)
    c.add_argument("--bsgs-m", type=int, default=3_200_000)
    c.add_argument("--bsgs-cache", type=str, default=".bsgs_table.pkl")
    c.add_argument("--export", type=str, default=None)
    c.add_argument("--prove", action="store_true")
    c.add_argument("--transparent", action="store_true")
    c.set_defaults(fn=cmd_cnn)

    c = sub.add_parser("lenet", help="LeNet-5 workload (E4)")
    c.add_argument("--size", type=int, default=28)
    c.add_argument("--seed", type=int, default=0)
    c.add_argument("--bsgs-m", type=int, default=3_200_000)
    c.add_argument("--bsgs-cache", type=str, default=".bsgs_table.pkl")
    c.add_argument("--export", type=str, default=None)
    c.add_argument("--prove", action="store_true")
    c.add_argument("--transparent", action="store_true")
    c.set_defaults(fn=cmd_lenet)

    c = sub.add_parser("prove", help="prove a rust_files/<tag> witness dir")
    c.add_argument("--dir", type=str, required=True)
    c.add_argument("--seed", type=int, default=None)
    c.add_argument("--transparent", action="store_true")
    c.set_defaults(fn=cmd_prove)

    c = sub.add_parser("bsgs", help="build the BSGS decryption table (E1)")
    c.add_argument("--m", type=int, default=3_200_000)
    c.add_argument("--cache", type=str, default=".bsgs_table.pkl")
    c.set_defaults(fn=cmd_bsgs)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
