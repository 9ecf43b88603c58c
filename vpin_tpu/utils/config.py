"""Framework configuration (the reference scatters these across module
constants, bash variables, and hard-coded tables — SURVEY.md section 5).

One dataclass, overridable from JSON or keyword arguments, covering:
curve parameters, fixed-point bit allocations, per-workload PRF
truncation, BSGS table size, gadget scalar bit width, mesh shape.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass
class VpinConfig:
    # fixed-point codec (reference: f=16 inputs/weights; shifts 26/32/33;
    # pool reciprocal at 10 bits)
    fraction_bits: int = 16
    pool_reciprocal_bits: int = 10

    # per-workload PRF truncation bytes (conv/cnn/lenet)
    prf_trunc_conv: int = 16
    prf_trunc_cnn: int = 14
    prf_trunc_lenet: int = 13

    # BSGS
    bsgs_m: int = 3_200_000
    bsgs_chunk: int = 1 << 18
    bsgs_max_steps: int = 20_000

    # point-mult gadget scalar bit width (reference load_data.rs:62)
    gadget_n_bits: int = 128

    # device mesh (data-parallel axis size; None = all local devices)
    mesh_devices: Optional[int] = None

    # proof options
    deterministic_tape_seed: Optional[int] = None
    with_eval_proof: bool = True

    @staticmethod
    def from_json(path: str) -> "VpinConfig":
        with open(path) as fh:
            data = json.load(fh)
        return VpinConfig(**data)

    def to_json(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump(dataclasses.asdict(self), fh, indent=2)


DEFAULT_CONFIG = VpinConfig()
