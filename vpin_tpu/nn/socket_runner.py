"""Two-process client/server conv workload over the socket transport.

Process topology parity with the reference's script.sh runs
(src/cnn_networks/Server.py:95-149 server side, Client.py:85-123 client
side, script.sh:49-108): the client generates keys, sends the public
parameters, encrypts and sends the image; the server runs the
homomorphic conv with rLC witness recording and returns the output
ciphertext plus witness counts.  Both ends speak the reference's
length-prefixed chunked-ACK pickle protocol (nn/transport.py).

Entry points are importable (for in-process/threaded tests) and exposed
as `python -m vpin_tpu.runner.cli serve-conv / client-conv` for true
two-process runs.
"""

from __future__ import annotations

import random
from typing import Optional

import numpy as np

from . import fixed_point
from .elgamal import CipherTensor, KeyPair, encrypt_batch
from .homomorphic import HomomorphicEngine
from .models import CONV_FILTERS
from .prf import fresh_key
from .trace import WitnessTrace
from .transport import (
    connect, recv_ciphertensor, recv_obj, send_ciphertensor, send_obj, serve,
)


def server_main(port: int, filter_size: int = 3,
                export_dir: Optional[str] = None) -> dict:
    """Accept one client, run the conv workload on its ciphertext."""
    srv, conn = serve(port)
    try:
        send_obj(conn, "Welcome to the server!")
        params = recv_obj(conn)                    # {"q", "h"} public params
        assert "q" in params and "h" in params
        ct = recv_ciphertensor(conn)

        eng = HomomorphicEngine(prf_trunc_bytes=16)
        filt = CONV_FILTERS[filter_size]
        out_halves = [eng.conv2d(h, filt, key=fresh_key(), padding=1, stride=1)
                      for h in ct]
        eng.flush_checks()
        if export_dir:
            eng.trace.export_json(export_dir)
        result = {"num_mults": int(eng.trace.num_mults),
                  "num_adds": int(eng.trace.num_adds)}
        send_obj(conn, result)
        send_ciphertensor(conn, CipherTensor(*out_halves))
        return result
    finally:
        conn.close()
        srv.close()


def client_main(port: int, image: np.ndarray,
                seed: int = 0) -> dict:
    """Connect, send parameters + encrypted image, receive the result."""
    from ..curve.host_ec import E2_ORDER

    sock = connect(port)
    try:
        assert recv_obj(sock) == "Welcome to the server!"
        key = KeyPair.generate(random.Random(seed))
        send_obj(sock, {"q": E2_ORDER,
                        "h": (int(key.h_host.x), int(key.h_host.y))})

        scaled = fixed_point.min_max_scaling(image)
        fixed = fixed_point.encode(scaled)
        ct = encrypt_batch(fixed, key, random.Random(seed + 1))
        send_ciphertensor(sock, ct)
        result = recv_obj(sock)
        _ = recv_ciphertensor(sock)
        return result
    finally:
        sock.close()
