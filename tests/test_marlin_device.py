"""Device Marlin prover: end-to-end on the shipped R1CS fixture, byte-parity
with the host prover, tamper rejection."""

import pytest

from kzg_snark_tpu.models.marlin.indexer import Indexer
from kzg_snark_tpu.models.marlin.prover import Prover
from kzg_snark_tpu.models.marlin.verifier import Verifier
from kzg_snark_tpu.rng import Rng

X_SIZE = 5
TAU = 0xABCDEF987654321
MAX_DEGREE = 200

pytest.importorskip("jax")

# Slow tier (VERDICT r4 #2): the device indexer/prover compile ~25 min of
# XLA:CPU graphs per worker process (no CPU compile cache — its executable
# deserialization segfaults in this jax build).  Device-Marlin coverage in
# the default tier rides the TPU bench marlin section; byte-parity and
# at-scale runs stay here and in test_marlin_device_scale.py.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def device_keys(r1cs_instance):
    inst = r1cs_instance
    indexer = Indexer(curve_type="bn254", backend="tpu", rng=Rng(700))
    return indexer.preprocess(inst.A, inst.B, inst.C, MAX_DEGREE, tau=TAU)


@pytest.fixture(scope="module")
def device_proof(device_keys, r1cs_instance):
    ipk, _ = device_keys
    x = r1cs_instance.z[:X_SIZE]
    w = r1cs_instance.z[X_SIZE:]
    prover = Prover(curve_type="bn254", backend="tpu", rng=Rng(701))
    return prover.prove(ipk, x, w)


def test_device_proof_verifies(device_keys, device_proof, r1cs_instance):
    _, ivk = device_keys
    x = r1cs_instance.z[:X_SIZE]
    assert Verifier(curve_type="bn254", rng=Rng(702)).verify(
        ivk, x, device_proof)


def test_device_proof_tamper_rejected(device_keys, device_proof,
                                      r1cs_instance):
    _, ivk = device_keys
    x = r1cs_instance.z[:X_SIZE]
    original = device_proof["evaluations"]["beta2"][0]
    device_proof["evaluations"]["beta2"][0] = original + 1
    try:
        assert not Verifier(curve_type="bn254", rng=Rng(703)).verify(
            ivk, x, device_proof)
    finally:
        device_proof["evaluations"]["beta2"][0] = original


def test_device_matches_host_prover_bytes(r1cs_instance):
    """Same seed + tau: device and host (normalized-commitment) provers
    emit identical proofs — validates every device kernel in one shot."""
    inst = r1cs_instance
    x = inst.z[:X_SIZE]
    w = inst.z[X_SIZE:]

    idx_dev = Indexer(curve_type="bn254", backend="tpu", rng=Rng(800))
    ipk_d, ivk_d = idx_dev.preprocess(inst.A, inst.B, inst.C, MAX_DEGREE,
                                      tau=TAU)
    idx_host = Indexer(curve_type="bn254", backend="host", rng=Rng(800))
    idx_host.kzg.normalize_commitments = True
    ipk_h, ivk_h = idx_host.preprocess(inst.A, inst.B, inst.C, MAX_DEGREE,
                                       tau=TAU)

    proof_d = Prover(curve_type="bn254", backend="tpu",
                     rng=Rng(801)).prove(ipk_d, x, w)
    prover_h = Prover(curve_type="bn254", backend="host", rng=Rng(801))
    prover_h.kzg.normalize_commitments = True
    proof_h = prover_h.prove(ipk_h, x, w)

    assert proof_d["evaluations"] == proof_h["evaluations"]
    assert proof_d["commitments"] == proof_h["commitments"]
    assert proof_d["kzg_proofs"] == proof_h["kzg_proofs"]
    assert Verifier(curve_type="bn254", rng=Rng(802)).verify(ivk_d, x, proof_d)
