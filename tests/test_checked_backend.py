"""Checked-arithmetic debug backend (SURVEY.md §5 sanitizers row).

CheckedFieldBackend validates every eager ring-op output: 16-bit-clean
limbs and canonical (< p) values.  The positive test runs a representative
op mix (including a full curve-add chain, which stacks ~30 field ops);
the negative test proves the trap actually fires on a corrupted value.
"""

import random

import jax.numpy as jnp
import pytest

from kzg_snark_tpu import constants as C
from kzg_snark_tpu.ops.fr import CheckedFieldBackend
from kzg_snark_tpu.ops.g1 import CurveOps


@pytest.fixture(scope="module")
def checked():
    return CheckedFieldBackend(C.BN254_R)


def test_checked_ops_pass_on_valid_inputs(checked):
    rng = random.Random(5)
    be = checked
    a = be.from_ints([rng.randrange(be.modulus) for _ in range(8)])
    b = be.from_ints([rng.randrange(be.modulus) for _ in range(8)])
    be.validate(be.add(a, b), "add")
    be.validate(be.sub(a, b), "sub")
    be.validate(be.mul(a, b), "mul")
    be.validate(be.square(a), "square")


def test_checked_curve_chain(monkeypatch):
    # Full curve formulas over the checked Fq backend, eager on CPU.
    monkeypatch.setenv("KZG_TPU_PALLAS", "0")
    curve = CurveOps(CheckedFieldBackend(C.BN254_P))
    g = curve.from_affine_ints([C.BN254_G1[0]] * 4, [C.BN254_G1[1]] * 4)
    p2 = curve.double(g)
    p3 = curve.add(p2, g)
    assert curve.on_curve(p3, 3).all()


def test_checked_trap_fires(checked):
    be = checked
    # limb overflow: a 17-bit limb
    bad = jnp.full((be.num_limbs, 1), 1 << 16, dtype=jnp.uint32)
    with pytest.raises(AssertionError, match="limb overflow"):
        be.validate(bad, "synthetic")
    # non-canonical: p itself (all limbs in range but value == p)
    from kzg_snark_tpu.ops.fr import _int_to_limbs
    import numpy as np
    p_arr = jnp.asarray(np.asarray(
        [_int_to_limbs(be.modulus, be.num_limbs)], dtype=np.uint32).T)
    with pytest.raises(AssertionError, match="non-canonical"):
        be.validate(p_arr, "synthetic")
