"""Host-only verification mode.

The prover is a TPU program; the verifier is not.  Reference verifiers
(Spartan/src/snark: SNARK::verify and the gadget drivers,
proof_point_add.rs:96-111) run single-core on the CPU in milliseconds-
to-seconds.  Mirroring that split matters here for a different reason:
every device MSM a verifier issues drags in XLA compiles for
verify-only shapes (a one-shot table build is a 256-step scan program)
plus a tunnel round-trip per dispatch — measured at 38-44 s for a
cold-cache full-SNARK verify whose actual arithmetic is ~1 s of host
Pippenger.

Inside `host_verify()` the size-based host/device MSM heuristics
(`curve.rpoint.msm_host`, `snark.r1csproof._fold_commitment_rows`,
`batch_verify.VerifyAccumulator.check`) are overridden to stay on the
host unconditionally, so verification never traces, compiles, or
touches a device.  All top-level verify entry points enter it; set
VPIN_VERIFY_DEVICE=1 to restore the size heuristics (e.g. when
verifying on a machine where the device shapes are already cached and
the batch is enormous).
"""

from __future__ import annotations

import contextlib
import contextvars
import os

_HOST_VERIFY = contextvars.ContextVar("vpin_host_verify", default=False)


def host_only() -> bool:
    """True when group work must stay on the host (verification)."""
    return _HOST_VERIFY.get()


@contextlib.contextmanager
def host_verify():
    """Scope in which all verifier group algebra runs host-side."""
    if os.environ.get("VPIN_VERIFY_DEVICE", "0") == "1":
        yield
        return
    tok = _HOST_VERIFY.set(True)
    try:
        yield
    finally:
        _HOST_VERIFY.reset(tok)
