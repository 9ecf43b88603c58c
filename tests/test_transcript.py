"""Transcript bit-exactness: keccak vs hashlib, merlin vs its published
test vectors, Spartan extension behavior."""

import hashlib

from vpin_tpu.transcript import Transcript, RandomTape, sha3_256
from vpin_tpu.field.prime_field import L_MODULUS


def test_keccak_via_sha3():
    for msg in [b"", b"abc", b"The quick brown fox", b"x" * 1000]:
        assert sha3_256(msg) == hashlib.sha3_256(msg).digest()


def test_merlin_equivalence_simple():
    # merlin 3.0, tests::transcript_equivalence_simple
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    ch = t.challenge_bytes(b"challenge", 32)
    assert ch.hex() == ("d5a21972d0d5fe320c0d263fac7fffb8"
                        "145aa640af6e9bca177c03c7efcf0615")


def test_merlin_streaming_stability():
    # two identical transcripts agree; diverging data diverges challenges
    a = Transcript(b"proto")
    b = Transcript(b"proto")
    a.append_message(b"l", b"payload")
    b.append_message(b"l", b"payload")
    assert a.challenge_bytes(b"c", 16) == b.challenge_bytes(b"c", 16)
    a.append_message(b"l", b"x")
    b.append_message(b"l", b"y")
    assert a.challenge_bytes(b"c", 16) != b.challenge_bytes(b"c", 16)


def test_spartan_extension():
    t = Transcript(b"snark_example")
    t.append_protocol_name(b"Spartan SNARK proof")
    s = t.challenge_scalar(b"challenge_tau")
    assert 0 <= s < L_MODULUS
    v = t.challenge_vector(b"challenge_tau", 3)
    assert len(v) == 3 and len(set(v)) == 3


def test_random_tape_determinism():
    a = RandomTape(b"proof", seed=42)
    b = RandomTape(b"proof", seed=42)
    c = RandomTape(b"proof", seed=43)
    va = a.random_vector(b"v", 4)
    assert va == b.random_vector(b"v", 4)
    assert va != c.random_vector(b"v", 4)
