"""Device-mesh management for the sharded prover.

The reference's parallelism is rayon work-stealing over Hyrax row
commits (Spartan/src/dense_mlpoly.rs:160-175) and an 8-process point-sum
(src/cnn_networks/Server.py:170-208).  Here the equivalents are
shard_map'd device kernels over a 1-D "dp" mesh (SURVEY.md section 2.4):
rows of the witness commitment, halves of the sumcheck eval tables, and
rows of the R1CS multiply all shard over the same axis.

A mesh is opt-in: call set_mesh()/use_mesh() (the CLI and
dryrun_multichip do); without one every kernel runs single-device,
bit-identically.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh

AXIS = "dp"

_ACTIVE: Optional[Mesh] = None


def set_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE
    _ACTIVE = mesh


def get_mesh() -> Optional[Mesh]:
    return _ACTIVE


def mesh_axis_size() -> int:
    return 1 if _ACTIVE is None else _ACTIVE.shape[AXIS]


@contextlib.contextmanager
def use_mesh(mesh: Optional[Mesh]):
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = mesh
    try:
        yield mesh
    finally:
        _ACTIVE = prev


def default_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))
