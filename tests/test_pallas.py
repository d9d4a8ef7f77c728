"""Pallas kernel block/chunk plumbing vs the XLA oracle (interpret mode).

The field/curve *arithmetic* inside the kernel bodies is covered directly
(and cheaply) by test_regfield.py — these tests only exercise the Pallas
layer itself: BlockSpec index maps, the 8-row chunk loop, the non-tiling
fallbacks, and the NTT stage wiring.  Interpret-mode compiles of the big
fused curve bodies cost tens of minutes each on CPU, so the curve group
law is validated here through the *smallest* kernel (double) only; the
add/madd kernels share the identical block layout and are verified
end-to-end on hardware (tests on TPU, repro against the host oracle).
"""

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


def test_fused_mul_chunk_loop():
    """rows > CHUNK exercises the in-kernel fori_loop over 8-row chunks."""
    be = fr_backend("bn254")
    p = be.modulus
    n = 128 * 16
    xs = [rng.randrange(p) for _ in range(n)]
    ys = [rng.randrange(p) for _ in range(n)]
    out = be.to_ints(pallas_fr.fused_mul(be, be.from_ints(xs),
                                         be.from_ints(ys)))
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


def test_fused_curve_double_matches_xla():
    """Smallest curve kernel validates the (3, L, S, 128) point block
    layout shared by add/add_mixed."""
    import numpy as np
    from kzg_snark_tpu.ops.msm import msm_context

    ctx = msm_context("bn254")
    curve = ctx.curve
    P = ctx._generator_pad(128)
    assert np.array_equal(np.asarray(curve.double_xla(P)),
                          np.asarray(pallas_fr.fused_curve_double(curve, P)))
