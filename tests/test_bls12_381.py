"""BLS12-381 end-to-end coverage (the reference's alternative curve,
kzg.py:31-35): KZG commit/open/check and a PLONK prove/verify round."""

import pytest

from kzg_snark_tpu.models.kzg import KZG
from kzg_snark_tpu.ops.host.poly import Poly
from kzg_snark_tpu.rng import Rng


@pytest.fixture(scope="module")
def kzg_bls():
    kzg = KZG(curve_type="bls12_381", rng=Rng(4242))
    ck, rk = kzg.setup(8, tau=0xB15B15B15)
    return kzg, ck, rk


def test_kzg_commit_open_check_bls(kzg_bls):
    kzg, ck, rk = kzg_bls
    F = kzg.Fq
    polys = [Poly(F, [1, 2, 3]), Poly(F, [4, 0, 0, 5])]
    comms = kzg.commit(ck, polys)
    proof = kzg.open(ck, polys, 7, 42)
    evals = [p(7) for p in polys]
    assert kzg.check(rk, comms, 7, evals, proof, 42)
    evals[0] = evals[0] + 1
    assert not kzg.check(rk, comms, 7, evals, proof, 42)


def test_kzg_batch_check_bls(kzg_bls):
    kzg, ck, rk = kzg_bls
    F = kzg.Fq
    lists = [[Poly(F, [1, 1, 2])], [Poly(F, [3, 0, 0, 7])]]
    zs, xis = [F(5), F(9)], [F(2), F(3)]
    comms = [kzg.commit(ck, ps) for ps in lists]
    evals = [[p(z) for p in ps] for ps, z in zip(lists, zs)]
    proofs = [kzg.open(ck, ps, z, xi) for ps, z, xi in zip(lists, zs, xis)]
    assert kzg.batch_check(rk, comms, zs, evals, proofs, xis)
    evals[1][0] = evals[1][0] + 1
    assert not kzg.batch_check(rk, comms, zs, evals, proofs, xis)


def test_plonk_end_to_end_bls():
    """Synthetic n=8 circuit (the shipped fixture's wrapped negative values
    don't transfer between scalar fields): one multiplication gate
    3*4 = 12 plus zero gates, identity permutation."""
    from kzg_snark_tpu.models.plonk.indexer import Indexer
    from kzg_snark_tpu.models.plonk.prover import Prover
    from kzg_snark_tpu.models.plonk.verifier import Verifier
    from kzg_snark_tpu.ops.host.field import scalar_field

    Fr = scalar_field("bls12_381")
    n = 8
    z = [Fr(0)] * n
    qM = [Fr(1)] + [Fr(0)] * (n - 1)
    qO = [Fr(-1)] + [Fr(0)] * (n - 1)
    perm = list(range(3 * n))
    w = ([Fr(3)] + [Fr(0)] * (n - 1)       # a wires
         + [Fr(4)] + [Fr(0)] * (n - 1)     # b wires
         + [Fr(12)] + [Fr(0)] * (n - 1))   # c wires

    indexer = Indexer(curve_type="bls12_381", rng=Rng(321))
    ipk, ivk = indexer.preprocess(qM, list(z), list(z), qO, list(z), perm,
                                  max_degree=n + 5, tau=777777)
    proof = Prover(curve_type="bls12_381", rng=Rng(322)).prove(ipk, [], w)
    assert Verifier(curve_type="bls12_381", rng=Rng(323)).verify(ivk, [], proof)
