"""Encrypted-inference layer tests: ElGamal, BSGS, homomorphic conv/pool/FC
with rLC verification and witness-count parity vs the reference's formulas."""

import random

import numpy as np
import pytest

from vpin_tpu.curve.host_ec import E2_G_HOST, host_infinity
from vpin_tpu.curve.weierstrass import E2, PointW
from vpin_tpu.nn import (
    BsgsTable, HomomorphicEngine, KeyPair, WitnessTrace,
    channel_sum, decrypt_batch, encrypt_batch,
)
from vpin_tpu.nn.prf import pf

RNG = random.Random(42)


@pytest.fixture(scope="module")
def table():
    return BsgsTable.build(m=4096, chunk=1024)


@pytest.fixture(scope="module")
def keypair():
    return KeyPair.generate(random.Random(1))


def test_prf_known_shape():
    key = b"\x01" * 32
    v16 = pf(key, 0, 16)
    v13 = pf(key, 0, 13)
    assert v16.bit_length() <= 128 and v13.bit_length() <= 104
    assert v16 >> 24 == v13  # same digest, different truncation


def test_elgamal_roundtrip(table, keypair):
    msgs = [0, 1, 5, -3, 4095, -4000, 123456]
    ct = encrypt_batch(msgs, keypair, random.Random(2))
    got = decrypt_batch(ct, keypair, table, max_steps=64)
    assert [int(v) for v in got] == msgs


def test_bsgs_exact_multiple(table):
    # values exactly at giant-step boundaries (i*m)
    vals = [4096, 8192, 0]
    pts = E2.from_affine_host([v * E2_G_HOST if v else host_infinity() for v in vals])
    got = table.dlog_batch(pts, max_steps=8)
    assert got == vals


@pytest.mark.slow  # XLA-CPU compile-bound (~5-15 min on 2-core hosts)
def test_conv_rlc_and_witness_counts(table, keypair):
    n = 4
    img = np.array([[RNG.randrange(0, 50) for _ in range(n)] for _ in range(n)])
    ct = encrypt_batch(img, keypair, random.Random(3))
    filt = np.array([[1, 0, 1], [2, 0, 2], [1, 0, 1]])

    eng = HomomorphicEngine(prf_trunc_bytes=14)
    out_halves = []
    for half in (ct.c1, ct.c2):
        out_halves.append(eng.conv2d(half, filt, key=b"k" * 32, padding=1, stride=1))
    eng.flush_checks()

    # witness counts: f^2 mults + (f^2 - 1) adds per ciphertext half
    assert eng.trace.num_mults == 2 * 9
    assert eng.trace.num_adds == 2 * 8

    # decrypt conv output and compare to plaintext conv
    from vpin_tpu.nn.elgamal import CipherTensor
    out_ct = CipherTensor(out_halves[0], out_halves[1])
    got = decrypt_batch(out_ct, keypair, table, max_steps=64)
    padded = np.pad(img, 1)
    for i in range(n):
        for j in range(n):
            want = int(np.sum(padded[i:i + 3, j:j + 3] * filt))
            assert int(got[i][j]) == want


@pytest.mark.slow  # XLA-CPU compile-bound (~5-15 min on 2-core hosts)
def test_pool_and_fc(table, keypair):
    img = np.array([[RNG.randrange(0, 30) for _ in range(4)] for _ in range(4)])
    ct = encrypt_batch(img, keypair, random.Random(4))

    eng = HomomorphicEngine(prf_trunc_bytes=14)
    pooled = [eng.avgpool2d(h, kernel_size=2, stride=2) for h in ct]
    # pool records (k^2-1) adds per output pixel per half: 2 * 4 * 3 = 24
    assert eng.trace.num_adds == 24
    assert eng.trace.num_mults == 0

    # decrypt pooled: value = windowsum * fp(1/4, 10 bits) = sum * 256
    from vpin_tpu.nn.elgamal import CipherTensor
    got = decrypt_batch(CipherTensor(pooled[0], pooled[1]), keypair, table,
                        max_steps=2000)
    for i in range(2):
        for j in range(2):
            want = int(np.sum(img[2 * i:2 * i + 2, 2 * j:2 * j + 2])) * 256
            assert int(got[i][j]) == want

    # FC on the flattened pooled vector
    flat = [PointW(*(c.reshape(-1, 16) for c in p)) for p in pooled]
    W = np.array([[RNG.randrange(0, 5) for _ in range(3)] for _ in range(4)])
    bias = [RNG.randrange(0, 20) for _ in range(3)]
    bias_ct = encrypt_batch(bias, keypair, random.Random(5))

    n_adds_before = eng.trace.num_adds
    out = [eng.fc(flat[k], W, bias_ct[k], key=b"f" * 32) for k in range(2)]
    eng.flush_checks()
    # per half: n_out bias adds + (n_in - 1) rLC adds; n_in rLC mults
    assert eng.trace.num_mults == 2 * 4
    assert eng.trace.num_adds - n_adds_before == 2 * (3 + 3)

    got = decrypt_batch(CipherTensor(out[0], out[1]), keypair, table,
                        max_steps=20000)
    pooled_plain = np.array([[int(np.sum(img[2 * i:2 * i + 2, 2 * j:2 * j + 2])) * 256
                              for j in range(2)] for i in range(2)]).reshape(-1)
    want = pooled_plain @ W + np.array(bias)
    assert [int(v) for v in got] == [int(v) for v in want]


def test_channel_sum(table, keypair):
    a = np.array([[1, 2], [3, 4]])
    b = np.array([[10, 20], [30, 40]])
    ca = encrypt_batch(a, keypair, random.Random(6))
    cb = encrypt_batch(b, keypair, random.Random(7))
    from vpin_tpu.nn.elgamal import CipherTensor
    summed = CipherTensor(channel_sum([ca.c1, cb.c1]), channel_sum([ca.c2, cb.c2]))
    got = decrypt_batch(summed, keypair, table, max_steps=16)
    assert (np.asarray(got, dtype=np.int64) == a + b).all()


def test_trace_export(tmp_path, keypair):
    # same shapes as test_conv_rlc_and_witness_counts so the compiled
    # kernels are reused
    img = np.array([[RNG.randrange(0, 9) for _ in range(4)] for _ in range(4)])
    ct = encrypt_batch(img, keypair, random.Random(8))
    eng = HomomorphicEngine(prf_trunc_bytes=14)
    filt = np.array([[1, 0, 1], [2, 0, 2], [1, 0, 1]])
    for half in ct:
        eng.conv2d(half, filt, key=b"t" * 32, padding=1, stride=1)
    eng.flush_checks()
    eng.trace.export_json(str(tmp_path / "T"))

    import json
    mdir = tmp_path / "T" / "pointMult"
    adir = tmp_path / "T" / "pointAdd"
    weights = json.loads((mdir / "weight.json").read_text())
    assert weights == [str(w) for w in filt.reshape(-1)] * 2
    px = json.loads((mdir / "point_mult_px_byte.json").read_text())
    assert len(px) == 18 and all(len(row) == 32 for row in px)
    rz = json.loads((adir / "point_add_rz_byte.json").read_text())
    # adds record (acc, temp_i) for i>=1; temps with weight 0 are identity
    assert len(rz) == 16
    assert rz == [1 if w == 0 else 0 for w in filt.reshape(-1)[1:]] * 2
