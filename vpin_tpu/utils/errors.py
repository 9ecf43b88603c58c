"""Typed proof errors + clean-failure semantics for verifiers.

The reference splits errors into ProofVerifyError / R1CSError
(reference: Spartan/src/errors.rs:5-45).  Our verifiers additionally
guarantee that a *malformed* proof (wrong lengths, non-canonical point
encodings, bad types) fails verification cleanly instead of raising —
the equivalent of Rust's type system rejecting a proof that does not
deserialize.
"""

from __future__ import annotations

import functools


class ProofVerifyError(Exception):
    """Proof verification failed (reference errors.rs ProofVerifyError)."""


class R1CSError(Exception):
    """R1CS instance construction error (reference errors.rs R1CSError)."""


class InternalError(Exception):
    """Prover-side invariant violation (never raised by verification)."""


#: exception types a malformed/tampered proof may legitimately trigger
#: inside a verifier (bad lengths, invalid point encodings, wrong types,
#: failed protocol checks).
_MALFORMED = (ProofVerifyError, AssertionError, ValueError, IndexError,
              KeyError, TypeError, ZeroDivisionError, OverflowError)


def verify_guard(failure=False):
    """Decorator: convert malformed-proof exceptions into a clean failure
    value (False for bool verifiers, None for Optional-returning ones).
    Set VPIN_NO_GUARD=1 to let exceptions propagate (debugging)."""
    import os
    if os.environ.get("VPIN_NO_GUARD", "0") == "1":
        return lambda fn: fn

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except _MALFORMED:
                return failure
        return wrapper
    return deco
