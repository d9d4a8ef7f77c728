"""Host curve group-law and pairing tests (both curves)."""

import pytest

from kzg_snark_tpu import constants as C
from kzg_snark_tpu.ops.host import curve as pc
from kzg_snark_tpu.ops.host.field import base_field
from kzg_snark_tpu.ops.host.pairing import PairingContext


def g1_generator(curve_type):
    Fp = base_field(curve_type)
    gx, gy = C.BN254_G1 if curve_type == "bn254" else C.BLS12_381_G1
    return (Fp(gx), Fp(gy), Fp(1)), Fp


@pytest.mark.parametrize("curve_type", ["bn254", "bls12_381"])
def test_g1_group_law(curve_type):
    G1, Fp = g1_generator(curve_type)
    b = Fp(C.BN254_B if curve_type == "bn254" else C.BLS12_381_B)
    r = C.BN254_R if curve_type == "bn254" else C.BLS12_381_R

    assert pc.is_on_curve(G1, b)
    for k in (2, 3, 5, 1 << 60, r - 1):
        assert pc.is_on_curve(pc.multiply(G1, k), b)
    assert pc.eq(pc.add(pc.multiply(G1, 11), pc.multiply(G1, 31)),
                 pc.multiply(G1, 42))
    assert pc.eq(pc.add(G1, pc.neg(G1)), pc.identity(Fp))
    assert pc.is_identity(pc.multiply(G1, r))
    # identity behavior
    assert pc.add(pc.identity(Fp), G1) == G1
    assert pc.add(G1, pc.identity(Fp)) == G1


@pytest.mark.parametrize("curve_type", ["bn254", "bls12_381"])
def test_g2_group_law(curve_type):
    ctx = PairingContext(curve_type)
    Fq2 = ctx.Fq2
    if curve_type == "bn254":
        G2 = (Fq2(*C.BN254_G2_X), Fq2(*C.BN254_G2_Y), Fq2.one())
        b2 = Fq2(C.BN254_B, 0) / Fq2(*C.BN254_XI)
        r = C.BN254_R
    else:
        G2 = (Fq2(*C.BLS12_381_G2_X), Fq2(*C.BLS12_381_G2_Y), Fq2.one())
        b2 = Fq2(C.BLS12_381_B, 0) * Fq2(*C.BLS12_381_XI)
        r = C.BLS12_381_R
    assert pc.is_on_curve(G2, b2)
    assert pc.is_on_curve(pc.multiply(G2, 123456789), b2)
    assert pc.is_identity(pc.multiply(G2, r))


def test_multiply_matches_repeated_add():
    G1, Fp = g1_generator("bn254")
    acc = pc.identity(Fp)
    for k in range(8):
        assert pc.eq(acc, pc.multiply(G1, k)), k
        acc = pc.add(acc, G1)


@pytest.mark.parametrize("curve_type", ["bn254", "bls12_381"])
def test_pairing_bilinearity(curve_type):
    ctx = PairingContext(curve_type)
    Fq2 = ctx.Fq2
    G1, Fp = g1_generator(curve_type)
    if curve_type == "bn254":
        G2 = (Fq2(*C.BN254_G2_X), Fq2(*C.BN254_G2_Y), Fq2.one())
        r = C.BN254_R
    else:
        G2 = (Fq2(*C.BLS12_381_G2_X), Fq2(*C.BLS12_381_G2_Y), Fq2.one())
        r = C.BLS12_381_R

    e = ctx.pairing(G2, G1)
    assert e != ctx.Fq12.one()          # non-degenerate
    assert e ** r == ctx.Fq12.one()     # lands in mu_r
    assert ctx.pairing(G2, pc.multiply(G1, 9)) == e ** 9
    assert ctx.pairing(pc.multiply(G2, 9), G1) == e ** 9
    assert (ctx.pairing(pc.multiply(G2, 6), pc.multiply(G1, 7)) == e ** 42)


def test_pairing_identity_inputs():
    ctx = PairingContext("bn254")
    G1, Fp = g1_generator("bn254")
    Fq2 = ctx.Fq2
    G2 = (Fq2(*C.BN254_G2_X), Fq2(*C.BN254_G2_Y), Fq2.one())
    assert ctx.pairing(pc.identity(Fq2), G1) == ctx.Fq12.one()
    assert ctx.pairing(G2, pc.identity(Fp)) == ctx.Fq12.one()
