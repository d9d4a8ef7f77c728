"""Fused-MSM (ops/msm_kernel.py) correctness on CPU.

The pallas kernel itself only runs on TPU; on CPU the semantics-identical
`_pass_xla` reference executes (the TPU bench cross-checks kernel ==
reference bitwise on hardware).  Here the full pipeline — signed digit
recoding, bucket accumulation semantics, lane/bucket/window reduction —
is validated against the host projective oracle at n = 1024 (one full
chunk) with edge-case scalars (0, 1, r-1, duplicates).

Replaces the reference's naive commit loop (/root/reference/kzg.py:112-117)
at production sizes; dispatched from MsmContext.msm for n >= 2048.
"""

import random

import jax
import jax.numpy as jnp
import pytest

from kzg_snark_tpu import constants as C
from kzg_snark_tpu.ops.fr import fr_backend, ints_to_limb_array
from kzg_snark_tpu.ops.host import curve as pc
from kzg_snark_tpu.ops.host.field import base_field
from kzg_snark_tpu.ops.msm_kernel import fused_msm, signed_digits


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


@pytest.mark.slow
@pytest.mark.parametrize("n", [1024, 2048])
def test_fused_msm_vs_host_oracle(n):
    """n = 1024 is one grid chunk; n = 2048 exercises the multi-chunk grid
    (the BASELINE-config dispatch threshold, VERDICT.md round-2 next #6)."""
    rng = random.Random(42)
    be = fr_backend("bn254")
    r = be.modulus
    Fp = base_field("bn254")
    G = (Fp(C.BN254_G1[0]), Fp(C.BN254_G1[1]), Fp(1))
    fm = fused_msm("bn254")
    xs, ys = [], []
    P = G
    for _ in range(n):
        a = pc.normalize(P)
        xs.append(int(a[0]))
        ys.append(int(a[1]))
        P = pc.add(P, G)
    sc = [rng.randrange(r) for _ in range(n)]
    sc[0], sc[1], sc[2] = 0, 1, r - 1
    sc[3] = sc[4] = sc[5]            # duplicate scalars

    pts = fm.curve.from_affine_ints(xs, ys)
    limbs = jnp.asarray(ints_to_limb_array(sc, be.num_limbs))
    got = fm.curve.to_affine_ints(fm.msm(pts, limbs))[0]

    total = sum((i + 1) * s for i, s in enumerate(sc)) % r
    exp = pc.normalize(pc.multiply(G, total))
    assert got == (int(exp[0]), int(exp[1]))
