"""At-scale Marlin device-prover correctness (VERDICT r3 missing #6).

The Marlin device pipeline (models/marlin/device.py) was suite-covered
only at the shipped n = 16 / m = 32 fixture; its BASELINE-shaped code
paths — segment-sum t(X), the 8m-domain a/b quotients, fused-MSM commit
dispatch — never ran above fixture scale in-suite.  This slow test proves
and verifies a synthetic R1CS at n = 2^10 rows with m = nnz = 2^11
(mirroring tests/test_plonk_device_scale.py), plus a tamper-reject.

Circuit: row i enforces (z_i + z_{i+1 mod n}) * z_i = c_i with
A[i,i] = A[i,(i+1)%n] = 1 (nnz(A) = 2n = m), B = I, C = diag(az_i) —
satisfied by construction for the random witness.  Matrices use the
sparse container (utils/fixtures.SparseMatrix); a dense 2^10-square of
host field elements would be 3M Python objects for 6k nonzeros.

Reference semantics displaced: /root/reference/marlin/prover.py:248-353
(t(X) via O(m) Sage poly divisions; here segment-sum on device).
"""

import random

import pytest

from kzg_snark_tpu.models.marlin.indexer import Indexer
from kzg_snark_tpu.models.marlin.prover import Prover
from kzg_snark_tpu.models.marlin.verifier import Verifier
from kzg_snark_tpu.ops.host.field import scalar_field
from kzg_snark_tpu.rng import Rng
from kzg_snark_tpu.utils.fixtures import SparseMatrix

pytest.importorskip("jax")


@pytest.mark.slow
def test_marlin_device_prover_at_scale():
    n = 1 << 10
    Fr = scalar_field("bn254")
    rng = random.Random(808)
    z = [Fr(1)] + [Fr(rng.randrange(1, Fr.modulus)) for _ in range(n - 1)]

    A_ent, B_ent, C_ent = {}, {}, {}
    for i in range(n):
        A_ent[(i, i)] = Fr(1)
        A_ent[(i, (i + 1) % n)] = A_ent.get((i, (i + 1) % n), Fr(0)) + Fr(1)
        B_ent[(i, i)] = Fr(1)
        az_i = z[i] + z[(i + 1) % n]
        C_ent[(i, i)] = az_i                 # (Az)_i * (Bz)_i = az_i * z_i
    A = SparseMatrix(Fr, n, n, A_ent)
    B = SparseMatrix(Fr, n, n, B_ent)
    C = SparseMatrix(Fr, n, n, C_ent)
    assert len(A.nonzero_positions()) == 2 * n       # m = 2^11

    # sanity: (Az) o (Bz) == Cz
    az, bz, cz = A.matvec(z), B.matvec(z), C.matvec(z)
    assert all((x * y).n == w.n for x, y, w in zip(az, bz, cz))

    m = 2 * n
    max_degree = 6 * m                               # covers deg h2 ~ 5m
    x_size = 5
    x, w = z[:x_size], z[x_size:]

    indexer = Indexer(curve_type="bn254", backend="tpu", rng=Rng(900))
    ipk, ivk = indexer.preprocess(A, B, C, max_degree, tau=0xFEED5EED)
    prover = Prover(curve_type="bn254", backend="tpu", rng=Rng(901))
    proof = prover.prove(ipk, x, w)
    assert Verifier(curve_type="bn254", rng=Rng(902)).verify(ivk, x, proof)

    tampered = dict(proof)
    tampered["evaluations"] = dict(proof["evaluations"])
    beta1 = list(proof["evaluations"]["beta1"])
    beta1[0] = beta1[0] + 1
    tampered["evaluations"]["beta1"] = beta1
    assert not Verifier(curve_type="bn254", rng=Rng(903)).verify(
        ivk, x, tampered)
