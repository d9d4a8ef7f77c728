"""Fused-MSM (ops/msm_kernel.py) correctness on CPU.

The pallas kernel itself only runs on TPU; on CPU the semantics-identical
`_pass_xla` reference executes (the TPU bench cross-checks kernel ==
reference bitwise on hardware).  Here the full pipeline — signed digit
recoding, bucket accumulation semantics, lane/bucket/window reduction,
multi-scalar batching — is validated against the host projective oracle
with edge-case scalars (0, 1, r-1, duplicates).

Point basis: ``random_point_basis`` (P_i = k_i G, random 128-bit k_i).
The round-3 basis [(i+1) G] is UNSOUND for the incomplete fast add: with
signed digits, bucket partial sums are small integer combinations
sum +-(i_k+1) that collide with incoming points (128 G + 256 G then
384 G — the dropped doubling case); random multipliers push that below
2^-100.  The SRS case is safe by Schwartz-Zippel over the secret tau.

Replaces the reference's naive commit loop (/root/reference/kzg.py:112-117)
at production sizes; dispatched from MsmContext.msm for n >= 2048.
"""

import random

import jax
import jax.numpy as jnp
import pytest

from kzg_snark_tpu import constants as C
from kzg_snark_tpu.ops.benchpoints import random_point_basis
from kzg_snark_tpu.ops.fr import fr_backend, ints_to_limb_array
from kzg_snark_tpu.ops.host import curve as pc
from kzg_snark_tpu.ops.host.field import base_field
from kzg_snark_tpu.ops.msm_kernel import fused_msm, signed_digits


def test_random_point_basis_disk_cache(tmp_path):
    """The per-(curve, size, seed) .npz basis cache returns the same
    points as the device build and as a cache-disabled build."""
    import numpy as np

    d = str(tmp_path)
    p1, k1 = random_point_basis("bn254", 32, seed=77, cache_dir=d)
    p2, k2 = random_point_basis("bn254", 32, seed=77, cache_dir=d)  # hit
    assert k1 == k2
    assert (np.asarray(p1) == np.asarray(p2)).all()
    p3, _ = random_point_basis("bn254", 32, seed=77, cache_dir=None)
    assert (np.asarray(p1) == np.asarray(p3)).all()


def test_signed_digits_reconstruct():
    be = fr_backend("bn254")
    r = be.modulus
    rng = random.Random(3)
    scalars = [0, 1, 63, 64, 127, 128, (1 << 253) - 1, r - 1,
               rng.randrange(r), rng.randrange(r)]
    limbs = jnp.asarray(ints_to_limb_array(scalars, be.num_limbs))
    enc = jax.device_get(signed_digits(be, limbs, r.bit_length()))
    for j, s in enumerate(scalars):
        acc = 0
        for w in range(enc.shape[0]):
            e = int(enc[w, j])
            mag, sign = e & 0x7F, e >> 7
            assert mag <= 64
            acc += (-mag if sign else mag) << (7 * w)
        assert acc % r == s % r


def _gen(curve_type):
    Fp = base_field(curve_type)
    g = C.BN254_G1 if curve_type == "bn254" else C.BLS12_381_G1
    return (Fp(g[0]), Fp(g[1]), Fp(1))


def _expect(curve_type, ks, scalars, r):
    total = sum(k * s for k, s in zip(ks, scalars)) % r
    e = pc.normalize(pc.multiply(_gen(curve_type), total))
    return None if e is None else (int(e[0]), int(e[1]))


@pytest.mark.slow
@pytest.mark.parametrize("n", [1024, 2048])
def test_fused_msm_vs_host_oracle(n):
    """n = 1024 is one grid chunk; n = 2048 exercises the multi-chunk grid
    (the BASELINE-config dispatch threshold, VERDICT.md round-2 next #6)."""
    rng = random.Random(42)
    be = fr_backend("bn254")
    r = be.modulus
    fm = fused_msm("bn254")
    pts, ks = random_point_basis("bn254", n, seed=1000 + n)
    sc = [rng.randrange(r) for _ in range(n)]
    sc[0], sc[1], sc[2] = 0, 1, r - 1
    sc[3] = sc[4] = sc[5]            # duplicate scalars

    limbs = jnp.asarray(ints_to_limb_array(sc, be.num_limbs))
    got = fm.curve.to_affine_ints(fm.msm(pts, limbs))[0]
    assert got == _expect("bn254", ks, sc, r)


@pytest.mark.slow
def test_msm_many_vs_host_oracle():
    """Batched scalars (k = 3, the PLONK round-1 commit shape): one digit
    tensor, shared passes, per-scalar Horner — each result must match the
    single-MSM oracle."""
    n, k = 1024, 3
    rng = random.Random(77)
    be = fr_backend("bn254")
    r = be.modulus
    fm = fused_msm("bn254")
    pts, ks = random_point_basis("bn254", n, seed=2024)
    sets = [[rng.randrange(r) for _ in range(n)] for _ in range(k)]
    sets[0][0] = 0
    ml = jnp.stack([jnp.asarray(ints_to_limb_array(s, be.num_limbs))
                    for s in sets])
    affs = fm.curve.to_affine_ints(fm.msm_many(pts, ml))
    for j, s in enumerate(sets):
        assert affs[j] == _expect("bn254", ks, s, r), f"scalar set {j}"


@pytest.mark.slow
def test_fused_msm_bls12_381():
    """BLS12-381 fused path (c = 6, 33-bucket table, 43 windows over the
    255-bit scalar field) vs the host oracle — the round-3 bn254-only
    dispatch gate is open (VERDICT r3 missing #4)."""
    n = 1024
    rng = random.Random(5)
    be = fr_backend("bls12_381")
    r = be.modulus
    fm = fused_msm("bls12_381")
    assert fm.c == 6
    pts, ks = random_point_basis("bls12_381", n, seed=31)
    sc = [rng.randrange(r) for _ in range(n)]
    sc[0], sc[1] = 0, r - 1
    limbs = jnp.asarray(ints_to_limb_array(sc, be.num_limbs))
    got = fm.curve.to_affine_ints(fm.msm(pts, limbs))[0]
    assert got == _expect("bls12_381", ks, sc, r)
