"""KZG scheme tests mirroring the reference self-test strategy
(/root/reference/kzg.py:291-380): individual checks, batch agreement, and
tamper-rejection negative tests."""

import pytest

from kzg_snark_tpu.models.kzg import KZG
from kzg_snark_tpu.ops.host.poly import Poly
from kzg_snark_tpu.rng import Rng


@pytest.fixture(scope="module")
def kzg_setup():
    kzg = KZG(curve_type="bn254", rng=Rng(2024))
    ck, rk = kzg.setup(8)
    return kzg, ck, rk


def _poly_lists(F):
    return [
        [Poly(F, [1, 2, 3]), Poly(F, [4, 0, 0, 5])],
        [Poly(F, [7, 0, -2, 1]), Poly(F, [3, 4, 2])],
        [Poly(F, [0, 2, 5]), Poly(F, [1, 1, 1, 1])],
    ]


def test_commit_open_check(kzg_setup):
    kzg, ck, rk = kzg_setup
    F = kzg.Fq
    polys = _poly_lists(F)[0]
    comms = kzg.commit(ck, polys)
    z, xi = 7, 42
    proof = kzg.open(ck, polys, z, xi)
    evals = [p(z) for p in polys]
    assert kzg.check(rk, comms, z, evals, proof, xi)


def test_check_rejects_bad_eval(kzg_setup):
    kzg, ck, rk = kzg_setup
    F = kzg.Fq
    polys = _poly_lists(F)[0]
    comms = kzg.commit(ck, polys)
    proof = kzg.open(ck, polys, 7, 42)
    evals = [p(7) for p in polys]
    evals[0] = evals[0] + 1
    assert not kzg.check(rk, comms, 7, evals, proof, 42)


def test_batch_check_agreement_and_tamper(kzg_setup):
    kzg, ck, rk = kzg_setup
    F = kzg.Fq
    plists = _poly_lists(F)
    zs = [F(11), F(22), F(33)]
    xis = [F(5), F(6), F(7)]
    clists = [kzg.commit(ck, ps) for ps in plists]
    elists = [[p(z) for p in ps] for ps, z in zip(plists, zs)]
    prlist = [kzg.open(ck, ps, z, xi) for ps, z, xi in zip(plists, zs, xis)]

    individual = [kzg.check(rk, c, z, e, pr, xi)
                  for c, z, e, pr, xi in zip(clists, zs, elists, prlist, xis)]
    assert all(individual)
    assert kzg.batch_check(rk, clists, zs, elists, prlist, xis)

    elists[0][0] = elists[0][0] + 1
    assert not kzg.check(rk, clists[0], zs[0], elists[0], prlist[0], xis[0])
    assert not kzg.batch_check(rk, clists, zs, elists, prlist, xis)


def test_commit_rejects_oversized_poly(kzg_setup):
    kzg, ck, rk = kzg_setup
    F = kzg.Fq
    too_big = Poly.monomial(F, len(ck), 1)
    with pytest.raises(ValueError):
        kzg.commit(ck, [too_big])


def test_setup_deterministic_with_tau(kzg_setup):
    kzg, _, _ = kzg_setup
    ck1, rk1 = kzg.setup(4, tau=123456789)
    ck2, rk2 = kzg.setup(4, tau=123456789)
    assert ck1 == ck2 and rk1 == rk2


def test_zero_coefficient_skip_semantics(kzg_setup):
    # kzg.py:113-114 skips zero coefficients; the commitment value must not
    # depend on that skip (it's a pure optimization) — sanity-check by
    # comparing against a poly with explicit structural zeros.
    kzg, ck, rk = kzg_setup
    F = kzg.Fq
    c1 = kzg.commit(ck, [Poly(F, [5, 0, 0, 7])])[0]
    c2 = kzg.commit(ck, [[5, 0, 0, 7]])[0]
    assert c1 == c2
