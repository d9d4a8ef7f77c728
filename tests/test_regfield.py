"""Register-limb field/curve math (ops.regfield / ops.regcurve) vs oracles.

These functions ARE the Pallas kernel bodies (pallas_fr builds kernels from
them); testing them directly as jnp ops gives fast, thorough coverage of
the arithmetic without paying interpret-mode compile costs — the thin
block/index plumbing is covered separately in test_pallas.py.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from kzg_snark_tpu import constants as C
from kzg_snark_tpu.ops.regfield import reg_field
from kzg_snark_tpu.ops.regcurve import RegCurve

rng = random.Random(20260818)

FIELDS = [("bn254_q", C.BN254_P), ("bn254_r", C.BN254_R),
          ("bls12_381_q", C.BLS12_381_P), ("bls12_381_r", C.BLS12_381_R)]


def to_regs(rf, vals, shape=(2, 128)):
    n = shape[0] * shape[1]
    assert len(vals) == n
    mont = [v * rf.R % rf.modulus for v in vals]
    return [jnp.array([(m >> (16 * i)) & 0xFFFF for m in mont],
                      dtype=jnp.uint32).reshape(shape)
            for i in range(rf.L)]


def from_regs(rf, regs):
    mats = [np.asarray(r).reshape(-1) for r in regs]
    r_inv = pow(rf.R, -1, rf.modulus)
    n = mats[0].size
    return [sum(int(mats[i][j]) << (16 * i) for i in range(rf.L))
            * r_inv % rf.modulus for j in range(n)]


@pytest.mark.parametrize("name,p", FIELDS)
def test_field_ops_vs_ints(name, p):
    rf = reg_field(p)
    n = 256
    xs = [rng.randrange(p) for _ in range(n)]
    ys = [rng.randrange(p) for _ in range(n)]
    xs[:4] = [0, 1, p - 1, p // 2]
    ys[:4] = [0, p - 1, p - 1, 2]
    a, b = to_regs(rf, xs), to_regs(rf, ys)
    assert from_regs(rf, rf.mul(a, b)) == [x * y % p for x, y in zip(xs, ys)]
    assert from_regs(rf, rf.square(a)) == [x * x % p for x in xs]
    assert from_regs(rf, rf.add(a, b)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert from_regs(rf, rf.sub(a, b)) == [(x - y) % p for x, y in zip(xs, ys)]
    assert from_regs(rf, rf.neg(a)) == [(-x) % p for x in xs]
    assert from_regs(rf, rf.double(a)) == [2 * x % p for x in xs]


def test_predicates_and_select():
    p = C.BN254_R
    rf = reg_field(p)
    xs = [0, 1, p - 1, 0] * 64
    ys = [0, 1, 5, 7] * 64
    a, b = to_regs(rf, xs), to_regs(rf, ys)
    assert list(np.asarray(rf.is_zero(a)).reshape(-1)) == \
        [x == 0 for x in xs]
    assert list(np.asarray(rf.eq(a, b)).reshape(-1)) == \
        [x == y for x, y in zip(xs, ys)]
    cond = rf.eq(a, b)
    sel = from_regs(rf, rf.select(cond, a, b))
    assert sel == [x if x == y else y for x, y in zip(xs, ys)]


def _host_curve_batch(n):
    """n distinct affine points via the trusted XLA CurveOps path."""
    from kzg_snark_tpu.ops.msm import msm_context
    ctx = msm_context("bn254")
    curve = ctx.curve
    pts = [ctx._generator_pad(1)]
    for _ in range(1, n):
        pts.append(curve.double_xla(pts[-1]))
    raw = jnp.concatenate(pts, axis=-1)
    aff = curve.to_affine_ints(raw)
    return ctx, curve, aff


def _point_to_regs(rf, aff_list):
    xs = [a[0] for a in aff_list]
    ys = [a[1] for a in aff_list]
    shape = (len(xs) // 128 if len(xs) >= 128 else 1,
             min(len(xs), 128))
    return (to_regs(rf, xs, shape), to_regs(rf, ys, shape),
            to_regs(rf, [1] * len(xs), shape))


def test_regcurve_matches_curveops():
    ctx, curve, aff = _host_curve_batch(128)
    rf = reg_field(curve.f.modulus)
    rc = RegCurve(rf)
    P = _point_to_regs(rf, aff)
    rot = aff[1:] + aff[:1]
    Q = _point_to_regs(rf, rot)

    # doubling
    got = rc.double(P)
    X, Y, Z = (from_regs(rf, got[0]), from_regs(rf, got[1]),
               from_regs(rf, got[2]))
    pj = curve.from_affine_ints([a[0] for a in aff], [a[1] for a in aff])
    want = curve.double_xla(pj)
    wf = curve.f
    assert X == wf.to_ints(want[0]) and Y == wf.to_ints(want[1]) \
        and Z == wf.to_ints(want[2])

    # general and mixed addition agree with the XLA formulas
    qj = curve.from_affine_ints([a[0] for a in rot], [a[1] for a in rot])
    want = curve.add_xla(pj, qj)
    got = rc.add(P, Q)
    assert from_regs(rf, got[0]) == wf.to_ints(want[0])
    assert from_regs(rf, got[1]) == wf.to_ints(want[1])
    assert from_regs(rf, got[2]) == wf.to_ints(want[2])

    want_m = curve.add_mixed_xla(pj, qj[0], qj[1])
    got_m = rc.add_mixed(P, Q[0], Q[1])
    assert from_regs(rf, got_m[0]) == wf.to_ints(want_m[0])
    assert from_regs(rf, got_m[1]) == wf.to_ints(want_m[1])
    assert from_regs(rf, got_m[2]) == wf.to_ints(want_m[2])


def test_regcurve_edge_cases():
    ctx, curve, aff = _host_curve_batch(4)
    rf = reg_field(curve.f.modulus)
    rc = RegCurve(rf)
    qx = to_regs(rf, [a[0] for a in aff], (1, 4))
    qy = to_regs(rf, [a[1] for a in aff], (1, 4))
    one = to_regs(rf, [1] * 4, (1, 4))

    # identity + q == q
    ident = rc.identity_like(qx[0])
    out = rc.add_mixed(ident, qx, qy)
    assert from_regs(rf, out[0]) == [a[0] for a in aff]
    assert from_regs(rf, out[1]) == [a[1] for a in aff]

    # p + p == 2p
    P = (qx, qy, one)
    out = rc.add_mixed(P, qx, qy)
    dbl = rc.double(P)
    assert from_regs(rf, out[0]) == from_regs(rf, dbl[0])
    assert from_regs(rf, out[2]) == from_regs(rf, dbl[2])

    # p + (-p) == identity (general and mixed)
    neg = (qx, [jnp.asarray(v) for v in rf.neg(qy)], one)
    out = rc.add_mixed(neg, qx, qy)
    assert all(v == 0 for v in from_regs(rf, out[2]))
    out = rc.add(neg, P)
    assert all(v == 0 for v in from_regs(rf, out[2]))

    # identity + identity
    out = rc.add(rc.identity_like(qx[0]), rc.identity_like(qx[0]))
    assert all(v == 0 for v in from_regs(rf, out[2]))
