"""KZG with the TPU backend: DeviceSRS + MSM commitments must agree with
the host compat path value-for-value (affine), and proofs must verify."""

import pytest

from kzg_snark_tpu.models.kzg import KZG
from kzg_snark_tpu.ops.host import curve as hc
from kzg_snark_tpu.ops.host.poly import Poly
from kzg_snark_tpu.rng import Rng

TAU = 0xDEADBEEFCAFE12345


@pytest.fixture(scope="module")
def kzg_pair():
    host = KZG("bn254", backend="host", rng=Rng(7))
    tpu = KZG("bn254", backend="tpu", rng=Rng(7))
    ck_h, rk_h = host.setup(16, tau=TAU)
    ck_t, rk_t = tpu.setup(16, tau=TAU)
    return host, tpu, ck_h, rk_h, ck_t, rk_t


def test_srs_matches_host(kzg_pair):
    host, tpu, ck_h, rk_h, ck_t, rk_t = kzg_pair
    assert rk_h == rk_t
    assert len(ck_t) == len(ck_h)
    for i in (0, 1, 7, 16):
        aff_t = ck_t.affine(i)
        aff_h = hc.normalize(ck_h[i])
        assert aff_t == (int(aff_h[0]), int(aff_h[1])), i


def test_commit_matches_host_affine(kzg_pair):
    host, tpu, ck_h, rk_h, ck_t, rk_t = kzg_pair
    F = host.Fq
    polys = [Poly(F, [1, 2, 3]), Poly(F, [4, 0, 0, 5]),
             Poly(F, [0]), Poly(F, list(range(17)))]
    comms_h = host.commit(ck_h, polys)
    comms_t = tpu.commit(ck_t, polys)
    for ch, ct in zip(comms_h, comms_t):
        ah = hc.normalize(ch)
        at = hc.normalize(ct)
        if ah is None:
            assert at is None
        else:
            assert (int(ah[0]), int(ah[1])) == (int(at[0]), int(at[1]))


def test_open_check_roundtrip_tpu(kzg_pair):
    host, tpu, ck_h, rk_h, ck_t, rk_t = kzg_pair
    F = tpu.Fq
    polys = [Poly(F, [1, 2, 3]), Poly(F, [4, 0, 0, 5])]
    comms = tpu.commit(ck_t, polys)
    proof = tpu.open(ck_t, polys, 7, 42)
    evals = [p(7) for p in polys]
    assert tpu.check(rk_t, comms, 7, evals, proof, 42)
    evals[0] = evals[0] + 1
    assert not tpu.check(rk_t, comms, 7, evals, proof, 42)
