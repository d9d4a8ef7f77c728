"""SRS / proof persistence round-trips (SURVEY.md §5 checkpoint/resume)."""

import os

from kzg_snark_tpu.models.kzg import KZG
from kzg_snark_tpu.ops.host.poly import Poly
from kzg_snark_tpu.rng import Rng
from kzg_snark_tpu.utils.serialization import (load_proof, load_srs,
                                               save_proof, save_srs)


def test_srs_roundtrip_host(tmp_path):
    kzg = KZG("bn254", rng=Rng(42))
    ck, rk = kzg.setup(6, tau=777)
    path = os.path.join(tmp_path, "srs.npz")
    save_srs(path, kzg, ck, rk)
    ck2, rk2 = load_srs(path, kzg, device=False)
    from kzg_snark_tpu.ops.host import curve as pc
    assert pc.eq(rk2, rk)  # same group element (affine-normalized on save)
    for a, b in zip(ck, ck2):
        assert pc.eq(a, b)
    # A reloaded SRS produces verifying proofs.
    F = kzg.Fq
    polys = [Poly(F, [3, 1, 4])]
    comms = kzg.commit(ck2, polys)
    proof = kzg.open(ck2, polys, 9, 5)
    assert kzg.check(rk2, comms, 9, [polys[0](9)], proof, 5)


def test_proof_roundtrip(tmp_path, plonk_instance):
    from kzg_snark_tpu.models.plonk.indexer import Indexer
    from kzg_snark_tpu.models.plonk.prover import Prover
    from kzg_snark_tpu.models.plonk.verifier import Verifier

    inst = plonk_instance
    n = len(inst.qM)
    indexer = Indexer(curve_type="bn254", rng=Rng(900))
    ipk, ivk = indexer.preprocess(inst.qM, inst.qL, inst.qR, inst.qO,
                                  inst.qC, inst.perm, max_degree=n + 5,
                                  tau=888)
    x, w = inst.w[:5], inst.w[5:]
    proof = Prover(curve_type="bn254", rng=Rng(901)).prove(ipk, x, w)

    path = os.path.join(tmp_path, "proof.json")
    save_proof(path, proof)
    kzg = KZG("bn254")
    proof2 = load_proof(path, kzg)
    assert proof2 == proof
    assert Verifier(curve_type="bn254", rng=Rng(902)).verify(ivk, x, proof2)
