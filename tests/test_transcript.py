"""Transcript serialization tests, pinned to the reference's byte-level rules
(/root/reference/transcript.py:58-100)."""

import hashlib
import struct

from kzg_snark_tpu.ops.host.field import scalar_field, base_field
from kzg_snark_tpu.transcript import Transcript

Fr = scalar_field("bn254")
Fp = base_field("bn254")


def manual_state(label: str) -> bytes:
    return hashlib.sha256(label.encode()).digest()


def chain(state: bytes, label: str, data: bytes) -> bytes:
    return hashlib.sha256(state + label.encode() + data).digest()


def test_initial_state():
    t = Transcript("marlin-proof", Fr)
    assert t.state == manual_state("marlin-proof")


def test_append_str_and_int():
    t = Transcript("proto", Fr)
    t.append_message("lbl", "hello")
    expect = chain(manual_state("proto"), "lbl", b"hello")
    assert t.state == expect
    t.append_message("n", 7)
    expect = chain(expect, "n", struct.pack(">q", 7))
    assert t.state == expect


def test_field_elements_serialize_as_decimal_str():
    t = Transcript("proto", Fr)
    x = Fr(-34)
    t.append_message("public-inputs", [Fr(1), x])
    expect = chain(manual_state("proto"), "public-inputs",
                   b"1" + str(Fr.modulus - 34).encode())
    assert t.state == expect


def test_point_tuples_serialize_like_pyecc_str():
    # py_ecc commitments are 3-tuples of FQ whose str() is "(x, y, z)" with
    # bare ints; our host field elements repr as bare ints, so tuples match.
    t = Transcript("proto", Fr)
    pt = (Fp(1), Fp(2), Fp(1))
    t.append_message("round1-commitments", [pt])
    expect = chain(manual_state("proto"), "round1-commitments", b"(1, 2, 1)")
    assert t.state == expect


def test_get_challenge_reduction_and_state_absorb():
    t = Transcript("proto", Fr)
    pre = t.state
    raw = hashlib.sha256(pre + b"alpha").digest()
    c = t.get_challenge("alpha")
    assert int(c) == int.from_bytes(raw, "big") % Fr.modulus
    assert t.state == chain(pre, "alpha", raw)


def test_prover_verifier_agree():
    t1 = Transcript("x", Fr)
    t2 = Transcript("x", Fr)
    for t in (t1, t2):
        t.append_message("m", [Fr(5), Fr(6)])
    assert t1.get_challenge("c") == t2.get_challenge("c")
    assert t1.state == t2.state


def test_list_concatenation_no_separator():
    t1 = Transcript("x", Fr)
    t2 = Transcript("x", Fr)
    t1.append_message("m", ["ab", "c"])
    t2.append_message("m", ["a", "bc"])
    # Reference concatenates with no separators: these collide by design.
    assert t1.state == t2.state
