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
    """The reference's real MNIST image for this size when available
    (src/convolution/image_mnist_<size>_<size>.npy), random otherwise."""
    from ..nn.models import load_reference_image
    img = load_reference_image(size)
    if img is not None:
        print(f"Using reference MNIST image image_mnist_{size}_{size}.npy")
        return img
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
    weights = None
    if args.weight_scale is not None:
        from ..nn.models import CNN_CONFIGS
        fc1_in, fc1_out, _, _ = CNN_CONFIGS[args.version]
        rngw = np.random.RandomState(args.seed)
        weights = {
            "weight_fc1": rngw.uniform(-args.weight_scale, args.weight_scale,
                                       (fc1_in, fc1_out)).astype(np.float32),
            "bias_fc1": rngw.uniform(-args.weight_scale, args.weight_scale,
                                     (fc1_out,)).astype(np.float32),
            "weight_fc2": rngw.uniform(-args.weight_scale, args.weight_scale,
                                       (fc1_out, 10)).astype(np.float32),
            "bias_fc2": rngw.uniform(-args.weight_scale, args.weight_scale,
                                     (10,)).astype(np.float32),
        }
    res = run_cnn_workload(args.version, img, key, table, weights=weights,
                           rng=random.Random(args.seed),
                           max_steps=args.max_steps)
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
    if img.shape[0] < 32:  # reference pads MNIST 28x28 to 32x32
        pad = (32 - img.shape[0]) // 2
        img = np.pad(img, ((pad, 32 - img.shape[0] - pad),) * 2)
    res = run_lenet_workload(img, key, table, rng=random.Random(args.seed),
                             num_kernels=tuple(args.kernels),
                             max_steps=args.max_steps)
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


def cmd_serve_conv(args):
    from ..nn.socket_runner import server_main
    result = server_main(args.port, filter_size=args.filter,
                         export_dir=args.export)
    print(f"Server: Number of EC point multiplications: {result['num_mults']}")
    print(f"Server: Number of EC point additions: {result['num_adds']}")


def cmd_client_conv(args):
    from ..nn.socket_runner import client_main
    img = _make_image(args.size, args.seed)
    result = client_main(args.port, img, seed=args.seed)
    print(f"Client: server reported {result}")


def cmd_mult_scale(args):
    """Synthetic point-mult proof at scale (feasibility demo for the
    LeNet-L5 path; reference point_mult.rs:61-62)."""
    import random as _random
    from ..curve.host_ec import E2_G_HOST, E2_ORDER
    from .proof_runner import prove_point_mult

    rng = _random.Random(args.seed)
    n = args.mults
    print(f"Generating {n} random point-mults (n=128-bit scalars)...")
    t0 = time.time()
    scalars = [rng.randrange(1, 1 << 128) for _ in range(n)]
    base = rng.randrange(1, E2_ORDER) * E2_G_HOST
    # distinct base points via cheap doubling chain on the host
    px, py = [], []
    P = base
    for _ in range(n):
        px.append(P.x)
        py.append(P.y)
        P = P + P
    print(f"trace ready in {time.time()-t0:.1f} s")
    prove_point_mult(scalars, px, py, tape_seed=args.seed,
                     full_snark=not args.transparent,
                     ckpt_dir=args.ckpt)


def cmd_bsgs(args):
    from ..nn.bsgs import BsgsTable
    t0 = time.time()
    table = BsgsTable.build(m=args.m, cache_path=args.cache)
    print(f"BSGS table built: m={table.m} entries={len(table.keys_sorted)} "
          f"in {time.time() - t0:.1f} s")


def main(argv=None):
    from ..utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
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
    c.add_argument("--weight-scale", type=float, default=None,
                   help="use random weights of this magnitude (reduced runs)")
    c.add_argument("--max-steps", type=int, default=None)
    c.set_defaults(fn=cmd_cnn)

    c = sub.add_parser("lenet", help="LeNet-5 workload (E4)")
    c.add_argument("--size", type=int, default=28)
    c.add_argument("--seed", type=int, default=0)
    c.add_argument("--bsgs-m", type=int, default=3_200_000)
    c.add_argument("--bsgs-cache", type=str, default=".bsgs_table.pkl")
    c.add_argument("--export", type=str, default=None)
    c.add_argument("--prove", action="store_true")
    c.add_argument("--transparent", action="store_true")
    c.add_argument("--kernels", type=int, nargs=3, default=(6, 16, 120),
                   help="kernel counts per conv stage (reduced runs)")
    c.add_argument("--max-steps", type=int, default=None)
    c.set_defaults(fn=cmd_lenet)

    c = sub.add_parser("prove", help="prove a rust_files/<tag> witness dir")
    c.add_argument("--dir", type=str, required=True)
    c.add_argument("--seed", type=int, default=None)
    c.add_argument("--transparent", action="store_true")
    c.set_defaults(fn=cmd_prove)

    c = sub.add_parser("serve-conv", help="socket-mode conv server (two-process)")
    c.add_argument("--port", type=int, default=35000)
    c.add_argument("--filter", type=int, default=3, choices=[3, 5, 7])
    c.add_argument("--export", type=str, default=None)
    c.set_defaults(fn=cmd_serve_conv)

    c = sub.add_parser("client-conv", help="socket-mode conv client (two-process)")
    c.add_argument("--port", type=int, default=35000)
    c.add_argument("--size", type=int, default=32)
    c.add_argument("--seed", type=int, default=0)
    c.set_defaults(fn=cmd_client_conv)

    c = sub.add_parser("mult-scale", help="synthetic point-mult proof at scale")
    c.add_argument("--mults", type=int, default=1000)
    c.add_argument("--seed", type=int, default=0)
    c.add_argument("--transparent", action="store_true")
    c.add_argument("--ckpt", type=str, default=None,
                   help="checkpoint dir: long proofs resume after a kill")
    c.set_defaults(fn=cmd_mult_scale)

    c = sub.add_parser("bsgs", help="build the BSGS decryption table (E1)")
    c.add_argument("--m", type=int, default=3_200_000)
    c.add_argument("--cache", type=str, default=".bsgs_table.pkl")
    c.set_defaults(fn=cmd_bsgs)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
