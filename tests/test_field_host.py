"""Host field / polynomial / FFT oracle tests."""

import random

import pytest

from kzg_snark_tpu.ops.host.field import scalar_field, base_field
from kzg_snark_tpu.ops.host.poly import Poly
from kzg_snark_tpu.ops.host.fft import fft_ff, ifft_ff, fft_interpolation

Fr = scalar_field("bn254")
rng = random.Random(1234)


def rand_fr():
    return Fr(rng.randrange(Fr.modulus))


def test_field_ring_axioms():
    for _ in range(50):
        a, b, c = rand_fr(), rand_fr(), rand_fr()
        assert (a + b) * c == a * c + b * c
        assert a - a == 0
        if b != 0:
            assert (a * b) / b == a
        assert a ** 5 == a * a * a * a * a


def test_field_inverse_and_pow():
    for _ in range(20):
        a = rand_fr()
        if a == 0:
            continue
        assert a * a.inverse() == 1
        assert a ** (-1) == a.inverse()
        assert a ** (Fr.modulus - 1) == 1  # Fermat


def test_field_str_is_decimal():
    # Transcript-critical: str(element) must be the canonical decimal int
    # (reference transcript.py:80-85 hashes str of Sage GF elements).
    a = Fr(-1)
    assert str(a) == str(Fr.modulus - 1)
    assert str(Fr(0)) == "0"


def test_nth_root_of_unity_orders():
    for n in (2, 4, 16, 1024):
        g = Fr.nth_root_of_unity(n)
        assert g ** n == 1
        assert g ** (n // 2) != 1


def test_bls12_381_field():
    F2 = scalar_field("bls12_381")
    g = F2.nth_root_of_unity(32)
    assert g ** 32 == 1 and g ** 16 != 1


@pytest.mark.parametrize("n", [1, 2, 8, 16, 64])
def test_fft_matches_naive_dft(n):
    coeffs = [rand_fr() for _ in range(n)]
    w = Fr.nth_root_of_unity(n) if n > 1 else Fr(1)
    evals = fft_ff(coeffs, w)
    p = Poly(Fr, coeffs)
    for i in range(n):
        assert evals[i] == p(w ** i)


@pytest.mark.parametrize("n", [2, 16, 256])
def test_ifft_roundtrip(n):
    coeffs = [rand_fr() for _ in range(n)]
    w = Fr.nth_root_of_unity(n)
    assert ifft_ff(fft_ff(coeffs, w), w) == coeffs


def test_fft_interpolation():
    n = 16
    g = Fr.nth_root_of_unity(n)
    values = [rand_fr() for _ in range(n)]
    p = fft_interpolation(values, g)
    for i in range(n):
        assert p(g ** i) == values[i]


def test_poly_divmod_roundtrip():
    for _ in range(10):
        a = Poly(Fr, [rand_fr() for _ in range(rng.randrange(1, 12))])
        b = Poly(Fr, [rand_fr() for _ in range(rng.randrange(1, 6))])
        if b.is_zero():
            continue
        q, r = a.divmod(b)
        assert q * b + r == a
        assert r.degree() < b.degree()


def test_poly_exact_division_raises():
    x = Poly.x(Fr)
    p = x ** 2 - 1
    assert p / (x - 1) == x + 1
    with pytest.raises(ValueError):
        (p + 1) / (x - 1)


def test_poly_lagrange():
    pts = [(Fr(i + 1), rand_fr()) for i in range(6)]
    p = Poly.lagrange(Fr, pts)
    for x, y in pts:
        assert p(x) == y


def test_poly_scale_argument():
    p = Poly(Fr, [rand_fr() for _ in range(9)])
    c = rand_fr()
    z = rand_fr()
    assert p.scale_argument(c)(z) == p(c * z)


def test_vanishing_and_derivative():
    n = 16
    v = Poly.vanishing(Fr, n)
    g = Fr.nth_root_of_unity(n)
    for i in range(n):
        assert v(g ** i) == 0
    assert v.derivative() == Poly.monomial(Fr, n - 1, n)
