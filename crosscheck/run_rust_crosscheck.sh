#!/usr/bin/env bash
# Bidirectional crosscheck with the reference Rust stack.
# Requires: cargo + the pinned nightly toolchain (reference README.md:56-57).
set -euo pipefail

REF_PROOF_DIR="${1:?usage: run_rust_crosscheck.sh <reference/src/proof_generation>}"
CRATE="$REF_PROOF_DIR/vPIN_proof_generation"
TAG="tpu_3_32"

if ! command -v cargo >/dev/null; then
    echo "ERROR: cargo not found — this environment cannot run the Rust" \
         "verifier (see crosscheck/README.md for the substitute evidence)." >&2
    exit 2
fi

# 1. export a conv3/32 witness from the TPU framework
python - <<'EOF'
import random
import numpy as np
from vpin_tpu.nn.elgamal import KeyPair
from vpin_tpu.nn.models import run_conv_workload
import os, sys
key = KeyPair.generate(random.Random(0))
img = np.random.RandomState(0).uniform(0, 1, (32, 32)).astype(np.float32)
res = run_conv_workload(img, 3, key, random.Random(1))
out = os.path.join(os.environ["CRATE"], "src", "rust_files", os.environ["TAG"])
res.trace.export_json(out)
print("exported", res.num_mults, "mults /", res.num_adds, "adds ->", out)
EOF

# 2. reference prover+verifier over our witness (direction 1)
(cd "$CRATE/src" && cargo run --release -- "$TAG")

# 3. our prover+verifier over a reference-generated witness (direction 2):
# any existing rust_files tag produced by the reference Python server works.
for d in "$CRATE"/src/rust_files/*/; do
    tag=$(basename "$d")
    [ "$tag" = "$TAG" ] && continue
    python -c "from vpin_tpu.runner.proof_runner import prove_tag_dir; prove_tag_dir('$d')"
    break
done
echo "crosscheck complete"
