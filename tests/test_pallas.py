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


def _affine_batch(n: int):
    """n distinct affine points (2^i G) as a (3, L, n) Z=1 batch."""
    from kzg_snark_tpu.ops.msm import msm_context
    import jax.numpy as jnp

    ctx = msm_context("bn254")
    curve = ctx.curve
    pts = [ctx._generator_pad(1)]
    for _ in range(1, n):
        pts.append(curve.double_xla(pts[-1]))
    raw = jnp.concatenate(pts, axis=-1)
    aff = curve.to_affine_ints(raw)
    return curve, curve.from_affine_ints([a[0] for a in aff],
                                         [a[1] for a in aff])


def test_fused_curve_add_matches_xla():
    import numpy as np
    import jax.numpy as jnp

    curve, P = _affine_batch(128)
    Q = jnp.concatenate([P[..., 1:], P[..., :1]], axis=-1)
    assert np.array_equal(np.asarray(curve.add_xla(P, Q)),
                          np.asarray(pallas_fr.fused_curve_add(curve, P, Q)))


def test_fused_curve_double_matches_xla():
    import numpy as np

    curve, P = _affine_batch(128)
    assert np.array_equal(np.asarray(curve.double_xla(P)),
                          np.asarray(pallas_fr.fused_curve_double(curve, P)))


def test_fused_curve_add_mixed_matches_xla_and_general():
    import numpy as np
    import jax.numpy as jnp

    curve, P = _affine_batch(128)
    Q = jnp.concatenate([P[..., 1:], P[..., :1]], axis=-1)
    mixed = pallas_fr.fused_curve_add_mixed(curve, P, Q[0], Q[1])
    assert np.array_equal(np.asarray(curve.add_mixed_xla(P, Q[0], Q[1])),
                          np.asarray(mixed))
    # madd-2007-bl with Z2 = 1 produces the same representative as the
    # general add-2007-bl path, so mixed == general holds bit-for-bit.
    assert np.array_equal(np.asarray(curve.add_xla(P, Q)), np.asarray(mixed))


def test_fused_curve_add_mixed_edge_cases():
    import numpy as np
    import jax.numpy as jnp

    curve, P = _affine_batch(4)
    f = curve.f
    qx, qy = P[0], P[1]
    # identity + q == q
    ident = curve.identity((4,))
    out = pallas_fr.fused_curve_add_mixed(curve, ident, qx, qy)
    assert np.array_equal(np.asarray(out[0]), np.asarray(qx))
    assert np.array_equal(np.asarray(out[1]), np.asarray(qy))
    # p + p == double(p)
    out = pallas_fr.fused_curve_add_mixed(curve, P, qx, qy)
    assert np.array_equal(np.asarray(out), np.asarray(curve.double_xla(P)))
    # p + (-p) == identity
    neg = jnp.stack([qx, f.neg(qy), jnp.broadcast_to(f.one_mont, qx.shape)])
    out = pallas_fr.fused_curve_add_mixed(curve, neg, qx, qy)
    assert bool(f.is_zero(out[2]).all())
