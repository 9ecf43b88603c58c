"""Intra-proof checkpoint/resume for long proofs.

The reference has no intra-proof resume: a LeNet-L5-class proof (~2^25
constraints, hours, ~230 GB) that dies must restart from zero
(SURVEY.md section 5).  Here the prover is DETERMINISTIC given
(witness, tape_seed) — challenges come from the merlin transcript and
prover randomness from the seeded RandomTape — so a checkpoint is tiny:
sponge states + the protocol artifacts accumulated so far.  Bound
sumcheck tables are NOT stored; they are a deterministic function of the
initial tables and the recorded challenges, so resume re-binds
(elementwise, ~1/3 of a full round's cost) instead of serializing
gigabyte eval tables.

Granularity:
  * every K rounds inside each ZK sumcheck (sumcheck.py _prove_rounds);
  * after the witness commitment (cp_snark.cp_commit_witness);
  * after the full sat proof, before the SPARK eval proof
    (cp_snark.cp_snark_prove).

Usage:
    ckpt = CheckpointStore("ckpt_dir")          # resumes if files exist
    prove_point_mult(..., tape_seed=1, ckpt=ckpt)
The tape_seed MUST be set (and identical across runs) for resume to be
sound; CheckpointStore records and enforces it.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

#: checkpoint cadence inside sumchecks (rounds between snapshots)
ROUNDS_PER_CHECKPOINT = int(os.environ.get("VPIN_CKPT_ROUNDS", "4"))


class CheckpointStore:
    """Directory-backed key->blob store for prover checkpoints."""

    def __init__(self, dir_path: str, meta: Optional[dict] = None):
        self.dir = dir_path
        os.makedirs(dir_path, exist_ok=True)
        self._meta_path = os.path.join(dir_path, "meta.pkl")
        if os.path.exists(self._meta_path):
            with open(self._meta_path, "rb") as fh:
                existing = pickle.load(fh)
            if meta is not None and existing != meta:
                raise ValueError(
                    f"checkpoint dir {dir_path} belongs to a different "
                    f"proof run: {existing} != {meta}")
        elif meta is not None:
            self._write(self._meta_path, meta)

    @staticmethod
    def _write(path: str, obj: Any) -> None:
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            pickle.dump(obj, fh, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, path)          # atomic: a kill never corrupts

    def _path(self, key: str) -> str:
        return os.path.join(self.dir, key.replace("/", "__") + ".pkl")

    def save(self, key: str, obj: Any) -> None:
        self._write(self._path(key), obj)

    def load(self, key: str) -> Optional[Any]:
        p = self._path(key)
        if not os.path.exists(p):
            return None
        with open(p, "rb") as fh:
            return pickle.load(fh)

    def clear(self) -> None:
        for name in os.listdir(self.dir):
            if name.endswith(".pkl"):
                os.remove(os.path.join(self.dir, name))
