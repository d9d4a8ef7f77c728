"""Device PLONK prover: end-to-end on the shipped fixture, byte-parity with
the host prover, and tamper rejection.

The strongest check here: given identical seed + tau, the device pipeline
(NTT/MSM/scan) and the host pipeline (exact Poly algebra) must emit
*byte-identical* proofs — quotient-by-coset-evaluation equals
quotient-by-exact-division, grand-product-by-prefix-scan equals the
sequential accumulator, and MSM commitments equal the naive sum.
"""

import pytest

from kzg_snark_tpu.models.plonk.indexer import Indexer
from kzg_snark_tpu.models.plonk.prover import Prover
from kzg_snark_tpu.models.plonk.verifier import Verifier
from kzg_snark_tpu.rng import Rng

X_SIZE = 5
TAU = 0xFEEDFACE1234567

pytest.importorskip("jax")

# Slow tier (VERDICT r4 #2): the module fixture compiles ~25 min of
# XLA:CPU device-pipeline graphs per worker.  The default tier keeps a
# full device-PLONK e2e via test_plonk_device_index.py (synthetic n=16,
# same DeviceProver path) and the TPU bench plonk section; byte-parity
# vs the host prover runs here and at n=2^12 in test_plonk_device_scale.
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def device_keys(plonk_instance):
    inst = plonk_instance
    n = len(inst.qM)
    indexer = Indexer(curve_type="bn254", backend="tpu", rng=Rng(500))
    return indexer.preprocess(inst.qM, inst.qL, inst.qR, inst.qO, inst.qC,
                              inst.perm, max_degree=n + 5, tau=TAU)


@pytest.fixture(scope="module")
def device_proof(device_keys, plonk_instance):
    ipk, _ = device_keys
    x = plonk_instance.w[:X_SIZE]
    w = plonk_instance.w[X_SIZE:]
    prover = Prover(curve_type="bn254", backend="tpu", rng=Rng(501))
    return prover.prove(ipk, x, w)


def test_device_proof_verifies(device_keys, device_proof, plonk_instance):
    _, ivk = device_keys
    x = plonk_instance.w[:X_SIZE]
    verifier = Verifier(curve_type="bn254", rng=Rng(502))
    assert verifier.verify(ivk, x, device_proof)


def test_device_proof_tamper_rejected(device_keys, device_proof,
                                      plonk_instance):
    _, ivk = device_keys
    x = plonk_instance.w[:X_SIZE]
    verifier = Verifier(curve_type="bn254", rng=Rng(503))
    original = device_proof["evaluations"]["b"]
    device_proof["evaluations"]["b"] = original + 1
    try:
        assert not verifier.verify(ivk, x, device_proof)
    finally:
        device_proof["evaluations"]["b"] = original


def test_device_matches_host_prover_bytes(plonk_instance):
    """Same seed + tau: device and host (normalized-commitment) provers
    must produce identical proofs."""
    inst = plonk_instance
    n = len(inst.qM)
    x = inst.w[:X_SIZE]
    w = inst.w[X_SIZE:]

    idx_dev = Indexer(curve_type="bn254", backend="tpu", rng=Rng(600))
    ipk_d, ivk_d = idx_dev.preprocess(inst.qM, inst.qL, inst.qR, inst.qO,
                                      inst.qC, inst.perm, max_degree=n + 5,
                                      tau=TAU)
    idx_host = Indexer(curve_type="bn254", backend="host", rng=Rng(600))
    idx_host.kzg.normalize_commitments = True
    ipk_h, ivk_h = idx_host.preprocess(inst.qM, inst.qL, inst.qR, inst.qO,
                                       inst.qC, inst.perm, max_degree=n + 5,
                                       tau=TAU)

    # Same tau + same rng => identical coset multipliers and domains.
    assert ipk_d["subgroups"]["k1"] == ipk_h["subgroups"]["k1"]
    assert ipk_d["subgroups"]["k2"] == ipk_h["subgroups"]["k2"]

    prover_d = Prover(curve_type="bn254", backend="tpu", rng=Rng(601))
    proof_d = prover_d.prove(ipk_d, x, w)

    prover_h = Prover(curve_type="bn254", backend="host", rng=Rng(601))
    prover_h.kzg.normalize_commitments = True
    proof_h = prover_h.prove(ipk_h, x, w)

    assert proof_d["commitments"] == proof_h["commitments"]
    assert proof_d["evaluations"] == proof_h["evaluations"]
    assert proof_d["kzg_proofs"] == proof_h["kzg_proofs"]

    # Both verify against either ivk (same SRS, same index commitments
    # modulo representative — use each with its own).
    assert Verifier(curve_type="bn254", rng=Rng(602)).verify(ivk_d, x, proof_d)
    assert Verifier(curve_type="bn254", rng=Rng(603)).verify(ivk_h, x, proof_h)
