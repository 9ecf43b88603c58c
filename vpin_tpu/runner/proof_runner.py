"""Proof-generation driver: witness JSON/trace -> CP-SNARK prove+verify.

Replicates the reference CLI flow and its canonical output metric lines
(vPIN_proof_generation/src/main.rs:14-46, proof_point_add.rs:23-113):

    Point Addition Gadget...
    Number of Point Additions: N
    Proof size: N bytes
    Proof generation time: N ms
    Proof verification time: N ms
    ...
    Total proof size / generation time / verification time

Witnesses load either from a WitnessTrace (in-process) or from the
`rust_files/<tag>` JSON layout for cross-feeding with the reference.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Optional, Tuple

from ..transcript.merlin import Transcript
from ..gadgets.point_addition import point_addition_gadget
from ..gadgets.point_mult import point_mult_gadget
from ..snark import (
    SNARKGens, cp_commit_witness, cp_snark_prove, cp_snark_verify,
    snark_encode,
)
from ..utils.config import DEFAULT_CONFIG


def _bytes_to_int(row) -> int:
    return int.from_bytes(bytes(int(b) & 0xFF for b in row), "little")


def load_point_add_json(dir_path: str):
    d = os.path.join(dir_path, "pointAdd")

    def load(name):
        with open(os.path.join(d, name)) as fh:
            return json.load(fh)

    px = [_bytes_to_int(r) for r in load("point_add_px_byte.json")]
    py = [_bytes_to_int(r) for r in load("point_add_py_byte.json")]
    rx = [_bytes_to_int(r) for r in load("point_add_rx_byte.json")]
    ry = [_bytes_to_int(r) for r in load("point_add_ry_byte.json")]
    rz = [int(v) for v in load("point_add_rz_byte.json")]
    return px, py, rx, ry, rz


def load_point_mult_json(dir_path: str):
    d = os.path.join(dir_path, "pointMult")

    def load(name):
        with open(os.path.join(d, name)) as fh:
            return json.load(fh)

    weights = [int(w) for w in load("weight.json")]
    px = [_bytes_to_int(r) for r in load("point_mult_px_byte.json")]
    py = [_bytes_to_int(r) for r in load("point_mult_py_byte.json")]
    return weights, px, py


@dataclass
class ProofStats:
    size_bytes: int
    gen_ms: int
    ver_ms: int


def _prove_gadget(gadget_out, tape_seed: Optional[int], quiet: bool,
                  full_snark: bool = True, ckpt=None):
    from ..utils.timer import span
    inst, vars_para, vars_input, vars_full, inputs, nc, nv, ni, nnz = gadget_out

    gens = SNARKGens(nc, nv, ni, nnz)
    # SNARK::encode — commit to the R1CS matrices so the verifier never
    # touches them (reference lib.rs:347-358).  `full_snark=False` is a
    # "transparent" shortcut where the verifier evaluates the public
    # matrices itself (not part of the reference flow; useful for tests).
    comm = decomm = None
    if full_snark:
        comm, decomm = snark_encode(inst, gens)
    with span("witness_commit"):
        poly_vars, comm_vars, blind_vars, comm_para, comm_input = \
            cp_commit_witness(vars_para, vars_input, vars_full, gens,
                              tape_seed=tape_seed, ckpt=ckpt)

    pt = Transcript(b"snark_example")
    proof = cp_snark_prove(inst, vars_full, inputs, gens, pt,
                           poly_vars, comm_vars, blind_vars,
                           decomm=decomm, tape_seed=tape_seed,
                           with_eval_proof=full_snark, ckpt=ckpt)
    return proof, inst, inputs, gens, comm_para, comm_input, comm


def _witness_digest(*arrays) -> str:
    """Digest of the witness inputs so a checkpoint dir can never be
    resumed against a DIFFERENT witness of the same shape (which would
    silently reuse the previous run's commitments)."""
    import hashlib
    h = hashlib.sha256()
    for arr in arrays:
        for v in arr:
            h.update(int(v).to_bytes(33, "little", signed=False))
        h.update(b"|")
    return h.hexdigest()[:32]


def _make_ckpt(ckpt_dir: Optional[str], kind: str, count: int,
               tape_seed: Optional[int], n_bits: int = 0,
               witness_digest: str = ""):
    """CheckpointStore bound to this exact proof run (SURVEY.md section 5:
    intra-proof resume for LeNet-L5-class runs)."""
    if ckpt_dir is None:
        return None
    from ..utils.checkpoint import CheckpointStore
    assert tape_seed is not None, \
        "checkpointed proofs need a deterministic tape_seed"
    return CheckpointStore(ckpt_dir, meta={
        "kind": kind, "count": count, "tape_seed": tape_seed,
        "n_bits": n_bits, "witness": witness_digest})


def prove_point_add(px, py, rx, ry, rz, tape_seed=None,
                    quiet=False, full_snark=None,
                    ckpt_dir=None) -> ProofStats:
    if full_snark is None:
        full_snark = DEFAULT_CONFIG.with_eval_proof
    t0 = time.time()
    if not quiet:
        print("Point Addition Gadget...")
        print(f"Number of Point Additions: {len(px)}")
    ckpt = _make_ckpt(ckpt_dir, "point_add", len(px), tape_seed,
                      witness_digest=(
                          _witness_digest(px, py, rx, ry, rz)
                          if ckpt_dir else ""))
    gadget = point_addition_gadget(px, py, rx, ry, rz)
    proof, inst, inputs, gens, comm_para, comm_input, comm = \
        _prove_gadget(gadget, tape_seed, quiet, full_snark=full_snark,
                      ckpt=ckpt)
    size = proof.size()
    gen_ms = int((time.time() - t0) * 1000)
    if not quiet:
        print(f"Proof size: {size} bytes")
        print(f"Proof generation time: {gen_ms} ms")
    t1 = time.time()
    vt = Transcript(b"snark_example")
    ok = cp_snark_verify(proof, inst, inputs, vt, gens, comm_para, comm_input,
                         comm=comm)
    assert ok, "point-add proof verification failed"
    if not quiet:
        print("Proof verification successful!")
    ver_ms = int((time.time() - t1) * 1000)
    if not quiet:
        print(f"Proof verification time: {ver_ms} ms")
    return ProofStats(size, gen_ms, ver_ms)


def prove_point_mult(weights, px, py, n_bits=128, tape_seed=None,
                     quiet=False, full_snark=None,
                     ckpt_dir=None) -> ProofStats:
    if full_snark is None:
        full_snark = DEFAULT_CONFIG.with_eval_proof
    t0 = time.time()
    if weights and max(int(w) for w in weights) >= (1 << n_bits):
        # wide rLC-combined FC scalars (sign-folding couldn't keep them
        # under 2^128; the reference u128 loader would panic here —
        # load_data.rs:21-23).  Use the full-width double-and-add circuit.
        n_bits = 253
    if not quiet:
        print("Point Multiplication Gadget...")
        print(f"Number of Point Multiplications: {len(weights)}")
    ckpt = _make_ckpt(ckpt_dir, "point_mult", len(weights), tape_seed,
                      n_bits=n_bits,
                      witness_digest=(_witness_digest(weights, px, py)
                                      if ckpt_dir else ""))
    from ..utils.timer import span as _span
    with _span("point_mult_gadget"):
        gadget = point_mult_gadget(weights, px, py, n=n_bits)
    proof, inst, inputs, gens, comm_para, comm_input, comm = \
        _prove_gadget(gadget, tape_seed, quiet, full_snark=full_snark,
                      ckpt=ckpt)
    size = proof.size()
    gen_ms = int((time.time() - t0) * 1000)
    if not quiet:
        print(f"Proof size: {size} bytes")
        print(f"Proof generation time: {gen_ms} ms")
    t1 = time.time()
    vt = Transcript(b"snark_example")
    ok = cp_snark_verify(proof, inst, inputs, vt, gens, comm_para, comm_input,
                         comm=comm)
    assert ok, "point-mult proof verification failed"
    if not quiet:
        print("Proof verification successful!")
    ver_ms = int((time.time() - t1) * 1000)
    if not quiet:
        print(f"Proof verification time: {ver_ms} ms")
    return ProofStats(size, gen_ms, ver_ms)


def prove_tag_dir(dir_path: str, n_bits=128, tape_seed=None,
                  skip_mult=False, full_snark=None,
                  ckpt_dir=None) -> Tuple[int, int, int]:
    """`cargo run -- <tag>` equivalent over a rust_files/<tag> directory.
    ckpt_dir: base directory for intra-proof checkpoints (<base>/add and
    <base>/mult); long layer proofs resume after a kill."""
    stats_add = prove_point_add(*load_point_add_json(dir_path),
                                tape_seed=tape_seed, full_snark=full_snark,
                                ckpt_dir=(os.path.join(ckpt_dir, "add")
                                          if ckpt_dir else None))
    print("")
    if skip_mult or not os.path.exists(
            os.path.join(dir_path, "pointMult", "weight.json")):
        print("Number of Point Multiplications: 0")
        print("Proof size: 0 bytes")
        print("Proof generation time: 0 ms")
        print("Proof verification time: 0 ms")
        stats_mult = ProofStats(0, 0, 0)
    else:
        weights, px, py = load_point_mult_json(dir_path)
        if len(weights) == 0:
            stats_mult = ProofStats(0, 0, 0)
        else:
            stats_mult = prove_point_mult(weights, px, py, n_bits=n_bits,
                                          tape_seed=tape_seed,
                                          full_snark=full_snark,
                                          ckpt_dir=(os.path.join(ckpt_dir,
                                                                 "mult")
                                                    if ckpt_dir else None))

    total = (stats_add.size_bytes + stats_mult.size_bytes,
             stats_add.gen_ms + stats_mult.gen_ms,
             stats_add.ver_ms + stats_mult.ver_ms)
    print("\n====================================")
    print(f"Total proof size: {total[0]} bytes")
    print(f"Total proof generation time: {total[1]} ms")
    print(f"Total proof verification time: {total[2]} ms")
    print("====================================")
    return total


def prove_trace(trace, n_bits=128, tape_seed=None,
                mult_slice=None, add_slice=None,
                full_snark=None) -> Tuple[int, int, int]:
    """Prove directly from an in-process WitnessTrace (no JSON round trip)."""
    fin = trace.finalize()
    ms = slice(*(mult_slice or (0, len(fin["mult_scalars"]))))
    as_ = slice(*(add_slice or (0, len(fin["add_px"]))))

    add_rz = [1 if i else 0 for i in fin["add_r_inf"][as_]]
    stats_add = prove_point_add(
        [int(v) for v in fin["add_px"][as_]],
        [int(v) for v in fin["add_py"][as_]],
        [int(v) for v in fin["add_rx"][as_]],
        [int(v) for v in fin["add_ry"][as_]],
        add_rz, tape_seed=tape_seed, full_snark=full_snark)
    print("")
    weights = [int(w) for w in fin["mult_scalars"][ms]]
    if weights:
        stats_mult = prove_point_mult(
            weights,
            [int(v) for v in fin["mult_px"][ms]],
            [int(v) for v in fin["mult_py"][ms]],
            n_bits=n_bits, tape_seed=tape_seed, full_snark=full_snark)
    else:
        print("Number of Point Multiplications: 0")
        stats_mult = ProofStats(0, 0, 0)

    total = (stats_add.size_bytes + stats_mult.size_bytes,
             stats_add.gen_ms + stats_mult.gen_ms,
             stats_add.ver_ms + stats_mult.ver_ms)
    print("\n====================================")
    print(f"Total proof size: {total[0]} bytes")
    print(f"Total proof generation time: {total[1]} ms")
    print(f"Total proof verification time: {total[2]} ms")
    print("====================================")
    return total
