"""Marlin end-to-end tests, mirroring the reference self-test strategy
(/root/reference/marlin/*.py __main__ blocks): encoder property checks,
indexer structure, prove->verify, tamper rejection, determinism."""

import random

import pytest

from kzg_snark_tpu.models.marlin.encoder import Encoder
from kzg_snark_tpu.models.marlin.indexer import Indexer
from kzg_snark_tpu.models.marlin.prover import Prover
from kzg_snark_tpu.models.marlin.verifier import Verifier
from kzg_snark_tpu.ops.host.field import scalar_field
from kzg_snark_tpu.rng import Rng

Fr = scalar_field("bn254")
X_SIZE = 5
MAX_DEGREE = 200


@pytest.fixture(scope="module")
def marlin_keys(r1cs_instance):
    indexer = Indexer(curve_type="bn254", rng=Rng(100))
    ipk, ivk = indexer.preprocess(r1cs_instance.A, r1cs_instance.B,
                                  r1cs_instance.C, MAX_DEGREE, tau=987654321)
    return ipk, ivk


@pytest.fixture(scope="module")
def marlin_proof(marlin_keys, r1cs_instance):
    ipk, _ = marlin_keys
    x = r1cs_instance.z[:X_SIZE]
    w = r1cs_instance.z[X_SIZE:]
    prover = Prover(curve_type="bn254", rng=Rng(101))
    return prover.prove(ipk, x, w)


def test_encoder_domains(r1cs_instance):
    enc = Encoder(Fr)
    enc.update_state(r1cs_instance.A, r1cs_instance.B, r1cs_instance.C)
    assert enc.n == 16 and enc.m == 32  # SURVEY.md §2 row 13
    assert enc.g_H ** 16 == 1 and enc.g_H ** 8 != 1
    assert enc.g_K ** 32 == 1 and enc.g_K ** 16 != 1


def test_encoder_entrywise_product(r1cs_instance):
    """zA(kappa) * zB(kappa) - zC(kappa) = 0 on H
    (reference marlin/encoder.py:267-286)."""
    enc = Encoder(Fr)
    enc.update_state(r1cs_instance.A, r1cs_instance.B, r1cs_instance.C)
    combos = enc.encode_linear_combinations(r1cs_instance.z)
    rng = random.Random(7)
    for _ in range(5):
        kappa = rng.choice(enc.H)
        assert (combos["zA_poly"](kappa) * combos["zB_poly"](kappa)
                - combos["zC_poly"](kappa)) == 0


def test_encoder_witness_roundtrip(r1cs_instance):
    enc = Encoder(Fr)
    enc.update_state(r1cs_instance.A, r1cs_instance.B, r1cs_instance.C)
    ew = enc.encode_witness(r1cs_instance.z, X_SIZE)
    # z_poly interpolates z over H
    for i, zi in enumerate(r1cs_instance.z):
        assert ew["z_poly"](enc.H[i]) == zi
    # x_poly interpolates the public input over H[:x_size]
    for i in range(X_SIZE):
        assert ew["x_poly"](enc.H[i]) == r1cs_instance.z[i]


def test_encoder_matrix_polys_evaluate_to_tables(r1cs_instance):
    enc = Encoder(Fr)
    enc.update_state(r1cs_instance.A, r1cs_instance.B, r1cs_instance.C)
    encoded = enc.encode_matrices()
    positions = list(r1cs_instance.A.nonzero_positions())
    for k, (i, j) in enumerate(positions):
        assert encoded["row_A"](enc.K[k]) == enc.H[i]
        assert encoded["col_A"](enc.K[k]) == enc.H[j]


def test_indexer_structure(marlin_keys):
    """Key-set and field checks (reference marlin/indexer.py:156-168)."""
    ipk, ivk = marlin_keys
    assert set(ipk["polynomials"].keys()) == set(ipk["commitments"].keys())
    assert len(ipk["polynomials"]) == 9
    assert "ck" in ipk and "rk" in ivk
    assert ipk["subgroups"]["n"] == 16 and ipk["subgroups"]["m"] == 32
    assert ivk["subgroups"]["n"] == 16


def test_proof_shape(marlin_proof):
    """Proof component counts (reference marlin/prover.py:505-513 and
    SURVEY.md §2.2 proof shapes)."""
    p = marlin_proof
    assert len(p["commitments"]["first_round"]) == 6
    assert len(p["commitments"]["second_round"]) == 3
    assert len(p["commitments"]["third_round"]) == 2
    assert len(p["evaluations"]["beta1"]) == 2
    assert len(p["evaluations"]["beta2"]) == 6
    assert set(p["kzg_proofs"].keys()) == {"beta1", "beta2"}


def test_prove_verify(marlin_keys, marlin_proof, r1cs_instance):
    _, ivk = marlin_keys
    x = r1cs_instance.z[:X_SIZE]
    verifier = Verifier(curve_type="bn254", rng=Rng(102))
    assert verifier.verify(ivk, x, marlin_proof)


def test_tampered_proof_rejected(marlin_keys, marlin_proof, r1cs_instance):
    """Tamper test (reference marlin/verifier.py:271-285)."""
    _, ivk = marlin_keys
    x = r1cs_instance.z[:X_SIZE]
    verifier = Verifier(curve_type="bn254", rng=Rng(103))
    original = marlin_proof["evaluations"]["beta1"][0]
    marlin_proof["evaluations"]["beta1"][0] = original + 1
    try:
        assert not verifier.verify(ivk, x, marlin_proof)
    finally:
        marlin_proof["evaluations"]["beta1"][0] = original


def test_wrong_public_input_rejected(marlin_keys, marlin_proof, r1cs_instance):
    _, ivk = marlin_keys
    x = list(r1cs_instance.z[:X_SIZE])
    x[1] = x[1] + 1
    verifier = Verifier(curve_type="bn254", rng=Rng(104))
    assert not verifier.verify(ivk, x, marlin_proof)


def test_deterministic_proof_with_seed(marlin_keys, r1cs_instance):
    """Same seed + same tau => byte-identical proof (randomness-injection
    contract, SURVEY.md §2.2)."""
    ipk, _ = marlin_keys
    x = r1cs_instance.z[:X_SIZE]
    w = r1cs_instance.z[X_SIZE:]
    p1 = Prover(curve_type="bn254", rng=Rng(55)).prove(ipk, x, w)
    p2 = Prover(curve_type="bn254", rng=Rng(55)).prove(ipk, x, w)
    assert p1 == p2
    p3 = Prover(curve_type="bn254", rng=Rng(56)).prove(ipk, x, w)
    assert p1 != p3
