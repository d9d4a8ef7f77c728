"""Pallas fused field kernels vs the XLA/host oracle (interpret mode on
CPU; the same kernels compile with Mosaic on TPU)."""

import random

import jax.numpy as jnp
import pytest

from kzg_snark_tpu.ops import pallas_fr
from kzg_snark_tpu.ops.fr import fr_backend

rng = random.Random(1717)


@pytest.fixture(autouse=True)
def interpret_mode():
    old = pallas_fr._INTERPRET
    pallas_fr._INTERPRET = True
    yield
    pallas_fr._INTERPRET = old


def test_fused_mul_matches_oracle():
    be = fr_backend("bn254")
    p = be.modulus
    xs = [rng.randrange(p) for _ in range(512)]
    ys = [rng.randrange(p) for _ in range(512)]
    a, b = be.from_ints(xs), be.from_ints(ys)
    out = be.to_ints(pallas_fr.fused_mul(be, a, b))
    assert out == [(x * y) % p for x, y in zip(xs, ys)]


def test_fused_mul_fallback_non_tiling():
    be = fr_backend("bn254")
    p = be.modulus
    xs = [rng.randrange(p) for _ in range(7)]   # 7 doesn't tile
    a = be.from_ints(xs)
    out = be.to_ints(pallas_fr.fused_mul(be, a, a))
    assert out == [(x * x) % p for x in xs]


def test_fused_butterfly_matches_oracle():
    be = fr_backend("bn254")
    p = be.modulus
    n = 256
    xl_i = [rng.randrange(p) for _ in range(n)]
    xu_i = [rng.randrange(p) for _ in range(n)]
    tw_i = [rng.randrange(p) for _ in range(n)]
    mask = [(i % 2) for i in range(n)]
    xl, xu, tw = be.from_ints(xl_i), be.from_ints(xu_i), be.from_ints(tw_i)
    m = jnp.asarray(mask, dtype=jnp.uint32)[None]
    out = be.to_ints(pallas_fr.fused_butterfly(be, xl, xu, tw, m))
    expect = [
        (x - t * u) % p if mk else (x + t * u) % p
        for x, u, t, mk in zip(xl_i, xu_i, tw_i, mask)
    ]
    assert out == expect


def test_scan_ntt_with_pallas_flag(monkeypatch):
    """Force the Pallas butterfly inside the scan NTT (interpret mode) and
    check bit-parity with the host FFT."""
    monkeypatch.setenv("KZG_TPU_PALLAS", "1")
    from kzg_snark_tpu.ops.ntt import ntt_context
    from kzg_snark_tpu.ops.host.field import scalar_field
    from kzg_snark_tpu.ops.host.fft import fft_ff

    Fr = scalar_field("bn254")
    n = 512
    ctx = ntt_context("bn254", n)
    be = ctx.backend
    coeffs = [rng.randrange(Fr.modulus) for _ in range(n)]
    w = Fr.nth_root_of_unity(n)
    host = [int(v) for v in fft_ff([Fr(c) for c in coeffs], w)]
    dev = be.to_ints(ctx._transform_scan(be.from_ints(coeffs),
                                         ctx._get_stage_tws(True)))
    assert dev == host
