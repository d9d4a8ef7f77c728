#!/usr/bin/env python3
"""KZG-SNARK-TPU demo driver.

Behavioral parity with ``/root/reference/main.py``: runs the KZG, Marlin and
PLONK demos back-to-back, each isolated by try/except (reference
main.py:97-114).  Adds a ``--backend`` flag (host|tpu) and ``--seed`` for
reproducible runs — the reference has no CLI flags at all (SURVEY.md §5).
"""

import argparse
import sys
import time

FIXTURES = "/root/reference/constraint-system"


def demo_kzg(backend: str, seed):
    """KZG commit/open/check on small polynomials (reference main.py:16-36)."""
    print("=== KZG Polynomial Commitment Demo ===")
    from kzg_snark_tpu.models.kzg import KZG
    from kzg_snark_tpu.ops.host.poly import Poly
    from kzg_snark_tpu.rng import Rng

    kzg = KZG(curve_type="bn254", backend=backend, rng=Rng(seed))
    ck, rk = kzg.setup(max_degree=10)

    F = kzg.Fq
    polys = [Poly(F, [1, 2, 3]), Poly(F, [4, 0, 0, 5])]  # 1+2X+3X^2, 4+5X^3
    commitments = kzg.commit(ck, polys)

    z, xi = 7, 42
    proof = kzg.open(ck, polys, z, xi)
    evals = [p(z) for p in polys]

    result = kzg.check(rk, commitments, z, evals, proof, xi)
    print(f"KZG verification: {'PASS' if result else 'FAIL'}\n")
    return result


def demo_marlin(backend: str, seed):
    """Marlin end-to-end on the shipped R1CS fixture (reference main.py:39-61)."""
    print("=== Marlin SNARK Demo ===")
    from kzg_snark_tpu.models.marlin.indexer import Indexer
    from kzg_snark_tpu.models.marlin.prover import Prover
    from kzg_snark_tpu.models.marlin.verifier import Verifier
    from kzg_snark_tpu.rng import Rng
    from kzg_snark_tpu.utils.fixtures import load_r1cs

    inst = load_r1cs(f"{FIXTURES}/R1CS_INSTANCE.pkl")
    x, w = inst.z[:5], inst.z[5:]

    indexer = Indexer(curve_type="bn254", backend=backend, rng=Rng(seed))
    ipk, ivk = indexer.preprocess(inst.A, inst.B, inst.C, max_degree=200)

    prover = Prover(curve_type="bn254", backend=backend, rng=Rng(seed + 1))
    proof = prover.prove(ipk, x, w)

    verifier = Verifier(curve_type="bn254", backend=backend, rng=Rng(seed + 2))
    result = verifier.verify(ivk, x, proof)
    print(f"Marlin verification: {'PASS' if result else 'FAIL'}\n")
    return result


def demo_plonk(backend: str, seed):
    """PLONK end-to-end on the shipped fixture (reference main.py:64-94)."""
    print("=== PLONK SNARK Demo ===")
    from kzg_snark_tpu.models.plonk.indexer import Indexer
    from kzg_snark_tpu.models.plonk.prover import Prover
    from kzg_snark_tpu.models.plonk.verifier import Verifier
    from kzg_snark_tpu.rng import Rng
    from kzg_snark_tpu.utils.fixtures import load_plonk

    inst = load_plonk(f"{FIXTURES}/PLONK_ARITHMETIZATION_INSTANCE.pkl")
    x, witness = inst.w[:5], inst.w[5:]

    indexer = Indexer(curve_type="bn254", backend=backend, rng=Rng(seed))
    n = len(inst.qM)
    ipk, ivk = indexer.preprocess(inst.qM, inst.qL, inst.qR, inst.qO, inst.qC,
                                  inst.perm, max_degree=n + 5)

    prover = Prover(curve_type="bn254", backend=backend, rng=Rng(seed + 1))
    proof = prover.prove(ipk, x, witness)

    verifier = Verifier(curve_type="bn254", backend=backend, rng=Rng(seed + 2))
    result = verifier.verify(ivk, x, proof)
    print(f"PLONK verification: {'PASS' if result else 'FAIL'}\n")
    return result


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--backend", choices=["host", "tpu"], default="host",
                        help="host = exact compat path; tpu = JAX/Pallas kernels")
    parser.add_argument("--seed", type=int, default=None,
                        help="deterministic randomness seed (default: OS entropy)")
    parser.add_argument("--demo", choices=["kzg", "marlin", "plonk", "all"],
                        default="all")
    parser.add_argument("--timing", action="store_true",
                        help="print per-demo wall-time report (SURVEY.md §5 "
                             "observability; the reference has none)")
    args = parser.parse_args()
    seed = args.seed if args.seed is not None else int(time.time())

    print("Running KZG-SNARK demonstrations...\n")
    results = {}
    demos = {"kzg": demo_kzg, "marlin": demo_marlin, "plonk": demo_plonk}
    selected = list(demos) if args.demo == "all" else [args.demo]
    timer = None
    if args.timing:
        from kzg_snark_tpu.utils.profiling import PhaseTimer
        timer = PhaseTimer()
    for name in selected:
        try:
            if timer is not None:
                with timer.phase(name):
                    results[name] = demos[name](args.backend, seed)
            else:
                results[name] = demos[name](args.backend, seed)
        except Exception as e:  # isolate per-demo, reference main.py:100-113
            print(f"{name} demo failed: {type(e).__name__}: {e}\n")
            results[name] = False

    if timer is not None:
        print("Timing report:")
        print(timer.dump())
    print("Demo complete!")
    return 0 if all(results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
