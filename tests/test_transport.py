"""Two-process-topology socket workload (reference script.sh parity).

Runs the conv workload split across a server and a client speaking the
reference's chunked-ACK pickle protocol (nn/transport.py).  The test uses
two threads (same wire protocol, one JAX runtime); true two-process runs
use `python -m vpin_tpu.runner.cli serve-conv / client-conv`.
"""

import threading

import numpy as np
import pytest

from vpin_tpu.nn.socket_runner import client_main, server_main

pytestmark = pytest.mark.slow


def test_socket_conv_roundtrip():
    port = 36531
    out = {}
    err = []

    def run_server():
        try:
            out.update(server_main(port, filter_size=3))
        except Exception as e:              # pragma: no cover
            err.append(e)

    t = threading.Thread(target=run_server, daemon=True)
    t.start()
    img = np.random.RandomState(3).rand(8, 8).astype(np.float32)
    res = client_main(port, img, seed=1)
    t.join(timeout=600)
    assert not err, err
    # conv3 with padding on both ciphertext halves: 9 mults + 8 adds each
    assert res == out == {"num_mults": 18, "num_adds": 16}
