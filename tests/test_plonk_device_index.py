"""Device-encoded PLONK indexing (DeviceProver.preprocess): end-to-end on a
synthetic circuit — index with device iNTT/MSM, prove with the jitted round
kernels, verify with the standard verifier.  Covers the scale path used by
bench.py's n = 2^16 section at a CI-friendly size (n = 16).
"""

import pytest

pytest.importorskip("jax")

from kzg_snark_tpu.models.plonk.device import DeviceProver
from kzg_snark_tpu.models.plonk.verifier import Verifier
from kzg_snark_tpu.ops.host.field import scalar_field
from kzg_snark_tpu.rng import Rng


@pytest.fixture(scope="module")
def synthetic():
    Fr = scalar_field("bn254")
    n = 16
    one, zero = Fr(1), Fr(0)
    a = [Fr(i + 2) for i in range(n)]
    b = [Fr(i + 3) for i in range(n)]
    c = [x * y for x, y in zip(a, b)]
    return {
        "qM": [one] * n, "qZ": [zero] * n, "qO": [-one] * n,
        "perm": list(range(3 * n)), "w": a + b + c, "n": n,
    }


@pytest.fixture(scope="module")
def device_indexed(synthetic):
    s = synthetic
    prover = DeviceProver("bn254", rng=Rng(77))
    ipk, ivk = prover.preprocess(s["qM"], s["qZ"], s["qZ"], s["qO"], s["qZ"],
                                 s["perm"], max_degree=s["n"] + 5,
                                 tau=0xABCDEF12345)
    return prover, ipk, ivk


def test_device_indexed_proof_verifies(device_indexed, synthetic):
    prover, ipk, ivk = device_indexed
    proof = prover.prove(ipk, [], synthetic["w"])
    assert Verifier("bn254", rng=Rng(78)).verify(ivk, [], proof)


def test_device_indexed_tamper_rejected(device_indexed, synthetic):
    prover, ipk, ivk = device_indexed
    proof = prover.prove(ipk, [], synthetic["w"])
    proof["evaluations"]["a"] = proof["evaluations"]["a"] + 1
    assert not Verifier("bn254", rng=Rng(79)).verify(ivk, [], proof)
