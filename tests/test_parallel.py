"""Distributed NTT (four-step, all_to_all) and MSM (sharded lanes,
all_gather) on the simulated 8-device CPU mesh (conftest sets
--xla_force_host_platform_device_count=8)."""

import random

import jax
import pytest

from kzg_snark_tpu.constants import BN254_R
from kzg_snark_tpu.ops.host import curve as hc
from kzg_snark_tpu.ops.host.field import base_field, scalar_field
from kzg_snark_tpu.ops.host.fft import fft_ff
from kzg_snark_tpu.parallel.mesh import make_mesh
from kzg_snark_tpu.parallel.msm_dist import DistMsmContext
from kzg_snark_tpu.parallel.ntt_dist import DistNttContext

rng = random.Random(2718)
Fr = scalar_field("bn254")

needs_devices = pytest.mark.skipif(len(jax.devices()) < 8,
                                   reason="needs 8 simulated devices")


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


@needs_devices
def test_dist_ntt_matches_host(mesh):
    n = 128
    ctx = DistNttContext("bn254", n, mesh)
    be = ctx.backend
    coeffs = [rng.randrange(BN254_R) for _ in range(n)]
    x_cyc = ctx.natural_to_cyclic(be.from_ints(coeffs))
    y = ctx.ntt(x_cyc)
    got = be.to_ints(ctx.blocked_to_natural(y))
    w = Fr.nth_root_of_unity(n)
    expect = [int(v) for v in fft_ff([Fr(c) for c in coeffs], w)]
    assert got == expect


@needs_devices
def test_dist_intt_roundtrip(mesh):
    n = 128
    ctx = DistNttContext("bn254", n, mesh)
    be = ctx.backend
    coeffs = [rng.randrange(BN254_R) for _ in range(n)]
    x_cyc = ctx.natural_to_cyclic(be.from_ints(coeffs))
    back = ctx.intt(ctx.ntt(x_cyc))
    assert be.to_ints(ctx.cyclic_to_natural(back)) == coeffs


@needs_devices
def test_dist_msm_matches_host(mesh):
    Fp = base_field("bn254")
    G1 = (Fp(1), Fp(2), Fp(1))
    N = 32
    ks = [rng.randrange(1, 10 ** 9) for _ in range(N)]
    scalars = [rng.randrange(BN254_R) for _ in range(N)]
    pts_aff = []
    for k in ks:
        a = hc.normalize(hc.multiply(G1, k))
        pts_aff.append((int(a[0]), int(a[1])))
    ctx = DistMsmContext("bn254", mesh)
    pts = ctx.base.curve.from_affine_ints([p[0] for p in pts_aff],
                                          [p[1] for p in pts_aff])
    res = ctx.msm(pts, ctx.base.scalars_to_limbs(scalars))
    got = ctx.base.curve.to_affine_ints(res)[0]
    total = sum(k * s for k, s in zip(ks, scalars)) % BN254_R
    exp = hc.normalize(hc.multiply(G1, total))
    assert got == (int(exp[0]), int(exp[1]))
