"""ristretto255 validation: RFC 9496 constants/vectors, encode/decode,
group law, one-way map, Pedersen generator derivation."""

import numpy as np
import pytest

from vpin_tpu.curve.ristretto import (
    RISTRETTO as R, PointE, D, SQRT_M1, P,
    RISTRETTO_BASEPOINT_COMPRESSED, ONE_MINUS_D_SQ, SQRT_AD_MINUS_ONE,
    INVSQRT_A_MINUS_D,
)
from vpin_tpu.curve.rpoint import RPoint
from vpin_tpu.curve.weierstrass import scalars_to_bits


def test_rfc_constants():
    assert D == 37095705934669439343138083508754565189542113879843219016388785533085940283555
    assert SQRT_M1 == 19681161376707505956807079304988542015446066515923890162744021073123829784752
    assert ONE_MINUS_D_SQ == 1159843021668779879193775521855586647937357759715417654439879720876111806838
    assert SQRT_AD_MINUS_ONE == 25063068953384623474111414158702152701244531502492656460079210482610430750235
    assert INVSQRT_A_MINUS_D == 54469307008909316920995813868745141605393597292927456921205312896311721017578


def test_basepoint_encoding():
    assert RPoint.basepoint().compress() == RISTRETTO_BASEPOINT_COMPRESSED


def test_small_multiples():
    # RFC 9496 appendix A.1 (first few)
    known = [
        "0000000000000000000000000000000000000000000000000000000000000000",
        RISTRETTO_BASEPOINT_COMPRESSED.hex(),
        "6a493210f7499cd17fecb510ae0cea23a110e8d5b901f8acadd3095c73a3b919",
    ]
    B8 = R.basepoint((len(known),))
    bits = scalars_to_bits(list(range(len(known))), 4)
    encs = R.encode_bytes(R.pscalar_mul_bits(B8, bits))
    for k, h in enumerate(known):
        assert encs[k].hex() == h, k


def test_decode_roundtrip_and_group_law():
    B = RPoint.basepoint()
    twoB = B + B
    threeB = twoB + B
    assert RPoint.decompress(twoB.compress()) == B.mul(2)
    assert threeB == B.mul(3)
    assert (threeB - B) == twoB
    assert (B - B) == RPoint.identity()
    # scalar mul by the group order is the identity
    from vpin_tpu.field.prime_field import L_MODULUS
    assert B.mul(L_MODULUS) == RPoint.identity()


def test_decode_rejects_bad_encodings():
    with pytest.raises(ValueError):
        RPoint.decompress(b"\x01" + b"\x00" * 31)  # odd => negative s
    with pytest.raises(ValueError):
        RPoint.decompress(b"\xff" * 32)  # non-canonical


@pytest.mark.slow
def test_one_way_map_consistency():
    chunks = [bytes([i]) * 64 for i in range(4)]
    pts = R.from_uniform_bytes(chunks)
    encs = R.encode_bytes(pts)
    back = R.decode_bytes(encs)
    assert bool(np.asarray(R.peq(pts, back)).all())
    # deterministic
    pts2 = R.from_uniform_bytes(chunks)
    assert R.encode_bytes(pts2) == encs


def test_pedersen_gens_and_homomorphism():
    from vpin_tpu.commit import MultiCommitGens, commit_vec_ints, commit_scalar
    gens = MultiCommitGens.new(4, b"test-gens")
    assert gens.n == 4
    g1a, g1b = gens.split_at(2)
    assert g1a.n == 2 and g1b.n == 2

    c1 = commit_vec_ints([1, 2, 3, 4], 7, gens)
    c2 = commit_vec_ints([5, 5, 5, 5], 3, gens)
    c3 = commit_vec_ints([6, 7, 8, 9], 10, gens)
    assert (c1 + c2) == c3  # additively homomorphic

    gens1 = MultiCommitGens.new(1, b"g1")
    a = commit_scalar(11, 13, gens1)
    b = commit_scalar(2, 1, gens1)
    c = commit_scalar(13, 14, gens1)
    assert (a + b) == c


def test_host_device_cross_check():
    """Host ristretto (curve/host_ristretto.py) matches the device group
    bit-for-bit on encode / add / scalar-mul / elligator."""
    from vpin_tpu.curve import host_ristretto as H
    B = H.basepoint()
    bits = scalars_to_bits(list(range(4)), 4)
    B4 = R.basepoint((4,))
    dev = R.encode_bytes(R.pscalar_mul_bits(B4, bits))
    host = [(B.mul(k)).encode() for k in range(4)]
    assert host == dev

    chunks = [bytes([i]) * 64 for i in range(4)]
    dev_map = R.encode_bytes(R.from_uniform_bytes(chunks))
    host_map = [H.from_uniform_bytes(c).encode() for c in chunks]
    assert host_map == dev_map

    # msm cross-check
    pts = [B.mul(i + 1) for i in range(6)]
    sc = [7 * i + 3 for i in range(6)]
    expect = H.identity()
    for s_, p_ in zip(sc, pts):
        expect = expect + p_.mul(s_)
    assert H.msm(sc, pts).eq(expect)
    assert H._pippenger8(sc, pts).eq(expect)
    assert H._straus4(sc, pts).eq(expect)
