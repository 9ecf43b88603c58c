"""Client/server socket transport (reference P10 parity).

TCP with pickle serialization, length-prefixed 30,000-byte chunks and a
text ACK per chunk — the exact wire protocol of the reference
(src/cnn_networks/Server.py:95-149, Client.py:85-123).  The hot path
never touches this layer; it exists for deployment parity and for
two-process runs of the workloads.

Ciphertexts travel as structure-of-arrays numpy payloads (the projective
limb tensors), not per-point Python objects — serialization is a single
pickle of a few contiguous arrays.
"""

from __future__ import annotations

import pickle
import socket
from typing import Any

import numpy as np

from ..curve.weierstrass import PointW
from .elgamal import CipherTensor

FORMAT = "utf-8"
SIZE = 256_000
CHUNK = 30_000


def send_in_chunks(sock: socket.socket, data: bytes) -> None:
    sock.sendall(str(len(data)).encode(FORMAT))
    sock.recv(SIZE)
    for i in range(0, len(data), CHUNK):
        sock.sendall(data[i:i + CHUNK])
        sock.recv(SIZE)


def recv_in_chunks(sock: socket.socket) -> bytes:
    total = int(sock.recv(SIZE).decode(FORMAT))
    sock.send(b"length received")
    parts = []
    received = 0
    n_chunks = (total + CHUNK - 1) // CHUNK
    for i in range(n_chunks):
        want = min(CHUNK, total - received)
        buf = b""
        while len(buf) < want:
            buf += sock.recv(want - len(buf))
        parts.append(buf)
        received += len(buf)
        sock.send(f"chunk {i} received".encode(FORMAT))
    return b"".join(parts)


def send_obj(sock: socket.socket, obj: Any) -> None:
    send_in_chunks(sock, pickle.dumps(obj))


def recv_obj(sock: socket.socket) -> Any:
    return pickle.loads(recv_in_chunks(sock))


def ciphertensor_to_payload(ct: CipherTensor) -> dict:
    return {
        "c1": [np.asarray(c) for c in ct.c1],
        "c2": [np.asarray(c) for c in ct.c2],
    }


def payload_to_ciphertensor(payload: dict) -> CipherTensor:
    import jax.numpy as jnp
    return CipherTensor(
        PointW(*(jnp.asarray(a) for a in payload["c1"])),
        PointW(*(jnp.asarray(a) for a in payload["c2"])),
    )


def send_ciphertensor(sock: socket.socket, ct: CipherTensor) -> None:
    send_obj(sock, ciphertensor_to_payload(ct))


def recv_ciphertensor(sock: socket.socket) -> CipherTensor:
    return payload_to_ciphertensor(recv_obj(sock))


def serve(port: int):
    """Bind, listen, accept one client; returns (server, conn)."""
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", port))
    srv.listen()
    conn, _ = srv.accept()
    return srv, conn


def connect(port: int) -> socket.socket:
    cli = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    cli.connect(("127.0.0.1", port))
    return cli
