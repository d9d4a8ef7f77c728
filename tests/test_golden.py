"""Golden-vector regression tests.

With all randomness seeded, the host provers' full proof bytes are
deterministic; these digests pin the protocol semantics (transcript
schedule, orderings, blinding shapes, field arithmetic) so any silent drift
fails loudly.  Device provers are pinned transitively through the
host<->device byte-parity tests.
"""

import hashlib
import json

from kzg_snark_tpu.models.marlin.indexer import Indexer as MarlinIndexer
from kzg_snark_tpu.models.marlin.prover import Prover as MarlinProver
from kzg_snark_tpu.models.plonk.indexer import Indexer as PlonkIndexer
from kzg_snark_tpu.models.plonk.prover import Prover as PlonkProver
from kzg_snark_tpu.rng import Rng

PLONK_GOLDEN = "37ad40c32cfc057ae0b76769e582d81b53a37b2674c6ee5195c923e36f8ba7cd"
MARLIN_GOLDEN = "c3143105a11fd4925e41b1ec55111c4c3d4cd5b89bba4ed28fb9decb680c5625"


def _digest(proof) -> str:
    def enc(o):
        if isinstance(o, dict):
            return {k: enc(v) for k, v in o.items()}
        if isinstance(o, list):
            return [enc(v) for v in o]
        if isinstance(o, tuple):
            return [int(c) for c in o]
        return int(o)

    return hashlib.sha256(
        json.dumps(enc(proof), sort_keys=True).encode()).hexdigest()


def test_plonk_proof_golden(plonk_instance):
    inst = plonk_instance
    n = len(inst.qM)
    ipk, _ = PlonkIndexer(curve_type="bn254", rng=Rng(123)).preprocess(
        inst.qM, inst.qL, inst.qR, inst.qO, inst.qC, inst.perm,
        max_degree=n + 5, tau=1000003)
    proof = PlonkProver(curve_type="bn254", rng=Rng(456)).prove(
        ipk, inst.w[:5], inst.w[5:])
    assert _digest(proof) == PLONK_GOLDEN


def test_marlin_proof_golden(r1cs_instance):
    inst = r1cs_instance
    ipk, _ = MarlinIndexer(curve_type="bn254", rng=Rng(123)).preprocess(
        inst.A, inst.B, inst.C, 200, tau=1000003)
    proof = MarlinProver(curve_type="bn254", rng=Rng(456)).prove(
        ipk, inst.z[:5], inst.z[5:])
    assert _digest(proof) == MARLIN_GOLDEN
