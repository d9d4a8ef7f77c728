"""Checked execution for kernels (VERDICT.md round-2 next #7).

The eager CheckedFieldBackend skips tracer values, so jitted prover
rounds and Pallas kernels run unchecked.  ``ops.fr.validate_canonical``
closes the gap: it validates CONCRETE outputs (limbs 16-bit clean,
values < p) — of a kernel call, or of every jitted prover round when
KZG_TPU_CHECKED=1 (models/plonk/device.py PlonkDeviceCore.jit_method).

The acceptance bar from the verdict: a seeded limb-overflow bug in
regfield.mul must be caught by the suite.  Here the bug is injected by
monkeypatching RegField.mul (the shared multiplier of every Pallas
kernel: pallas_fr, ntt_stage, msm_kernel) and re-tracing one interpret-
mode kernel; the validator must trap both an overflow and a missed
final conditional subtraction (non-canonical output).
"""

import random

import jax
import jax.numpy as jnp
import pytest

from kzg_snark_tpu.ops import pallas_fr
from kzg_snark_tpu.ops.fr import (fr_backend, validate_canonical,
                                  validate_tree_canonical)
from kzg_snark_tpu.ops.regfield import RegField

rng = random.Random(909)


def _rand_mont(be, n):
    return be.to_mont(be.from_ints(
        [rng.randrange(be.modulus) for _ in range(n)]))


@pytest.fixture()
def interpret_kernels(monkeypatch):
    monkeypatch.setattr(pallas_fr, "_INTERPRET", True)
    monkeypatch.setenv("KZG_TPU_PALLAS", "1")
    pallas_fr._mul_call.cache_clear()
    yield
    pallas_fr._mul_call.cache_clear()


def test_validator_traps_bad_arrays():
    """Fast-tier check of the validator logic itself (no Pallas kernel:
    the minimum kernel batch is 1024 and interpret-mode tracing of the
    unrolled mul body costs minutes on this box — the kernel-integration
    variants below are slow-tier, VERDICT r3 weak #2)."""
    be = fr_backend("bn254")
    good = be.to_mont(be.from_ints([rng.randrange(be.modulus)
                                    for _ in range(8)]))
    validate_canonical(be, good, "good")       # must not raise
    bad_limb = good.at[0].add(jnp.uint32(1 << 16))
    with pytest.raises(AssertionError, match="limb overflow"):
        validate_canonical(be, bad_limb, "bad-limb")
    # raw limb split of p itself: limb-clean but == p, i.e. non-canonical
    # (from_ints can't build this — it reduces mod p and Montgomery-maps)
    from kzg_snark_tpu.ops.fr import ints_to_limb_array
    over = jnp.asarray(ints_to_limb_array([be.modulus - 1], be.num_limbs))
    over = over.at[0, 0].add(jnp.uint32(1))
    with pytest.raises(AssertionError, match="non-canonical"):
        validate_canonical(be, over, "equal-p")


@pytest.mark.slow
def test_clean_kernel_validates(interpret_kernels):
    be = fr_backend("bn254")
    a, b = _rand_mont(be, 1024), _rand_mont(be, 1024)
    out = pallas_fr.fused_mul(be, a, b)
    validate_canonical(be, out, "fused_mul")   # must not raise


@pytest.mark.slow
def test_seeded_limb_overflow_is_caught(interpret_kernels, monkeypatch):
    """A mul that leaks a 17th bit into limb 0 must trap at validation."""
    be = fr_backend("bn254")
    orig = RegField.mul

    def bad_mul(self, a, b=None, b_const=None):
        out = orig(self, a, b, b_const=b_const)
        out = list(out)
        out[0] = out[0] + jnp.uint32(1 << 16)
        return out

    monkeypatch.setattr(RegField, "mul", bad_mul)
    a, b = _rand_mont(be, 1024), _rand_mont(be, 1024)
    out = pallas_fr.fused_mul(be, a, b)
    with pytest.raises(AssertionError, match="limb overflow"):
        validate_canonical(be, out, "fused_mul")


@pytest.mark.slow
def test_missed_final_subtraction_is_caught(interpret_kernels, monkeypatch):
    """A mul returning p + x (limb-clean but non-canonical) must trap."""
    be = fr_backend("bn254")
    orig = RegField.mul
    L = be.num_limbs
    p_limbs = [(be.modulus >> (16 * i)) & 0xFFFF for i in range(L)]

    def bad_mul(self, a, b=None, b_const=None):
        out = orig(self, a, b, b_const=b_const)
        # add p limbwise with ripple carry: value becomes x + p < 2^(16L)
        carry = jnp.zeros_like(out[0])
        res = []
        for i in range(L):
            s = out[i] + jnp.uint32(p_limbs[i]) + carry
            res.append(s & jnp.uint32(0xFFFF))
            carry = s >> 16
        return res

    monkeypatch.setattr(RegField, "mul", bad_mul)
    a = _rand_mont(be, 1024)
    b = be.to_mont(be.from_ints([1] * 1024))
    out = pallas_fr.fused_mul(be, a, b)
    with pytest.raises(AssertionError, match="non-canonical"):
        validate_canonical(be, out, "fused_mul")


@pytest.mark.slow  # compiles the full device prover under the checked
# backend (~30 min XLA:CPU, VERDICT r4 #2); checked kernel-level coverage
# stays in the default tier above
def test_checked_device_prover_rounds(monkeypatch, plonk_instance):
    """KZG_TPU_CHECKED=1 validates every jitted PLONK round output on the
    fixture circuit — the debug pass covering the paths the eager checked
    backend never sees."""
    monkeypatch.setenv("KZG_TPU_CHECKED", "1")
    from kzg_snark_tpu.models.plonk.device import (DeviceProver,
                                                   PlonkDeviceCore)
    from kzg_snark_tpu.models.plonk.verifier import Verifier
    from kzg_snark_tpu.rng import Rng

    inst = plonk_instance
    n = len(inst.qM)
    prover = DeviceProver("bn254", rng=Rng(321))
    ipk, ivk = prover.preprocess(inst.qM, inst.qL, inst.qR, inst.qO,
                                 inst.qC, inst.perm, max_degree=n + 5,
                                 tau=0xBEEF1234)
    # Fresh core state so jit_method re-wraps under the env flag.
    core = PlonkDeviceCore("bn254", n)
    for key in list(vars(core)):
        if key.startswith("_jit_"):
            delattr(core, key)
    x = inst.w[:5]
    w = inst.w[5:]
    proof = prover.prove(ipk, x, w)
    assert Verifier("bn254", rng=Rng(322)).verify(ivk, x, proof)


def test_validate_tree_walks_leaves():
    be = fr_backend("bn254")
    good = _rand_mont(be, 64)
    tree = {"a": good, "b": (good, good)}
    validate_tree_canonical(be, tree, "tree")
    bad = good.at[0, 0].set(jnp.uint32(1 << 20))
    with pytest.raises(AssertionError):
        validate_tree_canonical(be, {"a": good, "b": bad}, "tree")
