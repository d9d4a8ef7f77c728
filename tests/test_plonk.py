"""PLONK end-to-end tests, mirroring the reference self-test strategy
(/root/reference/plonk/*.py __main__ blocks): encoder constraint checks,
indexer structure, prove->verify, tamper rejection, determinism."""

import random

import pytest

from kzg_snark_tpu.models.plonk.encoder import Encoder
from kzg_snark_tpu.models.plonk.indexer import Indexer
from kzg_snark_tpu.models.plonk.prover import Prover
from kzg_snark_tpu.models.plonk.verifier import Verifier
from kzg_snark_tpu.ops.host.field import scalar_field
from kzg_snark_tpu.ops.host.poly import Poly
from kzg_snark_tpu.rng import Rng

Fr = scalar_field("bn254")
X_SIZE = 5


@pytest.fixture(scope="module")
def plonk_keys(plonk_instance):
    inst = plonk_instance
    indexer = Indexer(curve_type="bn254", rng=Rng(200))
    n = len(inst.qM)
    ipk, ivk = indexer.preprocess(inst.qM, inst.qL, inst.qR, inst.qO, inst.qC,
                                  inst.perm, max_degree=n + 5, tau=192837465)
    return ipk, ivk


@pytest.fixture(scope="module")
def plonk_proof(plonk_keys, plonk_instance):
    ipk, _ = plonk_keys
    x = plonk_instance.w[:X_SIZE]
    witness = plonk_instance.w[X_SIZE:]
    prover = Prover(curve_type="bn254", rng=Rng(201))
    return prover.prove(ipk, x, witness)


def test_encoder_constraints(plonk_instance):
    """Gate constraint at a random H point and divisibility by v_H
    (reference plonk/encoder.py:299-333)."""
    inst = plonk_instance
    enc = Encoder(Fr, rng=Rng(77))
    enc.update_state(inst.qM, inst.qL, inst.qR, inst.qO, inst.qC, inst.perm)
    sel = enc.encode_selectors()
    wit = enc.encode_witness(inst.w, x_size=X_SIZE)

    constraint = (sel["qM"] * wit["a"] * wit["b"] + sel["qL"] * wit["a"]
                  + sel["qR"] * wit["b"] + sel["qO"] * wit["c"]
                  + sel["qC"] + wit["PI"])
    point = random.Random(3).choice(enc.H)
    assert constraint(point) == 0
    assert constraint % enc.v_H == Poly(Fr)


def test_coset_multipliers(plonk_instance):
    inst = plonk_instance
    enc = Encoder(Fr, rng=Rng(78))
    enc.update_state(inst.qM, inst.qL, inst.qR, inst.qO, inst.qC, inst.perm)
    n = enc.n
    assert enc.k1 ** n != 1 and enc.k2 ** n != 1 and (enc.k1 / enc.k2) ** n != 1
    # Cosets are disjoint from H and from each other.
    assert not (set(e.n for e in enc.k1H) & set(e.n for e in enc.H))
    assert not (set(e.n for e in enc.k1H) & set(e.n for e in enc.k2H))


def test_permutation_encoding(plonk_instance):
    inst = plonk_instance
    enc = Encoder(Fr, rng=Rng(79))
    enc.update_state(inst.qM, inst.qL, inst.qR, inst.qO, inst.qC, inst.perm)
    perm_data = enc.encode_permutation()
    n = enc.n
    assert len(perm_data["sigma_star"]) == 3 * n
    for i in range(n):
        assert perm_data["S_sigma1"](enc.H[i]) == enc.index_to_element(inst.perm[i])


def test_lagrange_basis(plonk_instance):
    inst = plonk_instance
    enc = Encoder(Fr, rng=Rng(80))
    enc.update_state(inst.qM, inst.qL, inst.qR, inst.qO, inst.qC, inst.perm)
    L3 = enc.compute_lagrange_basis(3)
    for j, h in enumerate(enc.H):
        assert L3(h) == (1 if j == 3 else 0)


def test_indexer_structure(plonk_keys):
    """Structure checks (reference plonk/indexer.py:158-170)."""
    ipk, ivk = plonk_keys
    assert set(ipk["polynomials"].keys()) == set(ipk["commitments"].keys())
    assert len(ipk["polynomials"]) == 8
    assert "ck" in ipk and "rk" in ivk
    assert ipk["subgroups"]["n"] == 16
    assert len(ipk["sigma_star"]) == 48


def test_proof_shape(plonk_proof):
    """Proof shapes (reference plonk/prover.py:188-210, SURVEY.md §2.2)."""
    p = plonk_proof
    assert set(p["commitments"].keys()) == {"a", "b", "c", "z",
                                            "t_lo", "t_mid", "t_hi"}
    assert set(p["evaluations"].keys()) == {"a", "b", "c", "s_sigma1",
                                            "s_sigma2", "z_omega"}
    assert set(p["kzg_proofs"].keys()) == {"W_z", "W_zw"}


def test_prove_verify(plonk_keys, plonk_proof, plonk_instance):
    _, ivk = plonk_keys
    x = plonk_instance.w[:X_SIZE]
    verifier = Verifier(curve_type="bn254", rng=Rng(202))
    assert verifier.verify(ivk, x, plonk_proof)


def test_tampered_proof_rejected(plonk_keys, plonk_proof, plonk_instance):
    """Tamper test (reference plonk/verifier.py:276-290)."""
    _, ivk = plonk_keys
    x = plonk_instance.w[:X_SIZE]
    verifier = Verifier(curve_type="bn254", rng=Rng(203))
    original = plonk_proof["evaluations"]["a"]
    plonk_proof["evaluations"]["a"] = original + 1
    try:
        assert not verifier.verify(ivk, x, plonk_proof)
    finally:
        plonk_proof["evaluations"]["a"] = original


def test_wrong_public_input_rejected(plonk_keys, plonk_proof, plonk_instance):
    _, ivk = plonk_keys
    x = list(plonk_instance.w[:X_SIZE])
    x[0] = x[0] + 1
    verifier = Verifier(curve_type="bn254", rng=Rng(204))
    assert not verifier.verify(ivk, x, plonk_proof)


def test_deterministic_proof_with_seed(plonk_keys, plonk_instance):
    ipk, _ = plonk_keys
    x = plonk_instance.w[:X_SIZE]
    witness = plonk_instance.w[X_SIZE:]
    p1 = Prover(curve_type="bn254", rng=Rng(57)).prove(ipk, x, witness)
    p2 = Prover(curve_type="bn254", rng=Rng(57)).prove(ipk, x, witness)
    assert p1 == p2
