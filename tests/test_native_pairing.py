"""Native C++ pairing vs the pure-Python tower oracle."""

import pytest

from kzg_snark_tpu import constants as C
from kzg_snark_tpu.ops.host import curve as pc
from kzg_snark_tpu.ops.host.field import base_field
from kzg_snark_tpu.ops.host.pairing import PairingContext
from kzg_snark_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

ctx = PairingContext("bn254")
Fq2 = ctx.Fq2
Fp = base_field("bn254")
G1 = (Fp(1), Fp(2), Fp(1))
G2 = (Fq2(*C.BN254_G2_X), Fq2(*C.BN254_G2_Y), Fq2.one())


def aff1(p):
    a = pc.normalize(p)
    return None if a is None else (int(a[0]), int(a[1]))


def aff2(p):
    a = pc.normalize(p)
    return None if a is None else ((a[0].c0, a[0].c1), (a[1].c0, a[1].c1))


def serialize_py(e) -> bytes:
    out = b""
    for c6 in (e.c0, e.c1):
        for c2 in (c6.c0, c6.c1, c6.c2):
            out += int(c2.c0).to_bytes(32, "big") + int(c2.c1).to_bytes(32, "big")
    return out


def test_ate_loop_constant():
    assert C.BN254_ATE_LOOP == (1 << 64) + 0x9D797039BE763BA8


@pytest.mark.parametrize("k2,k1", [(1, 1), (1, 7), (5, 3), (123, 321)])
def test_pairing_matches_python(k2, k1):
    q = pc.multiply(G2, k2)
    p = pc.multiply(G1, k1)
    assert native.pairing_bytes(aff2(q), aff1(p)) == \
        serialize_py(ctx.pairing(q, p))


def test_pairing_identity_inputs():
    assert native.pairing_bytes(None, aff1(G1)) == \
        serialize_py(ctx.Fq12.one())
    assert native.pairing_bytes(aff2(G2), None) == \
        serialize_py(ctx.Fq12.one())


def test_pairing_eq_bilinearity():
    assert native.pairing_eq(aff2(G2), aff1(pc.multiply(G1, 6)),
                             aff2(pc.multiply(G2, 2)),
                             aff1(pc.multiply(G1, 3)))
    assert not native.pairing_eq(aff2(G2), aff1(pc.multiply(G1, 6)),
                                 aff2(pc.multiply(G2, 2)),
                                 aff1(pc.multiply(G1, 4)))
