#!/usr/bin/env python3
"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: G1 MSM throughput (points/s/chip) at the BASELINE size
(2^20), against the 1e7 north star.  Extras carry every size attempted,
the 2^20 NTT latency + parity check, PLONK device-prover proofs/s at
n = 2^16 (BASELINE config #4), Marlin end-to-end on the reference fixture
(config #5), and per-phase prover timings.  The reference publishes no
numbers (BASELINE.md): its commit loop is pure-Python double-and-add
(/root/reference/kzg.py:112-117).

Hardware context recorded in extras: the measured VPU ceiling on this chip
is ~634M Montgomery modmuls/s (in-VMEM, ops/msm_kernel.py docstring); a
254-bit MSM point costs >= 37 windows x ~10.6 modmul-equivalents, so the
speed-of-light for this design is ~1.5M points/s/chip — the 1e7 target is
not reachable for 254-bit scalars on this vector unit.

Process layout: the axon TPU tunnel is single-claim and a faulted program
poisons its process's device for good, so the orchestrator itself never
touches JAX — each section runs in its own subprocess (serially).
Compiled programs persist across subprocesses via the compilation cache.
"""

import json
import os
import subprocess
import sys
import time

MSM_SIZES = [1 << 20, 1 << 16]
TARGET_MSM = 1.0e7
PLONK_LOG_N = 16
SECTION_TIMEOUT_S = 2400


def _sync(x):
    import jax
    jax.block_until_ready(x)
    return x


def best_of(fn, reps=3):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


# ---------------------------------------------------------------------------
# Sections (run inside subprocesses).
# ---------------------------------------------------------------------------

def section_ntt() -> dict:
    from kzg_snark_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from kzg_snark_tpu.ops.ntt import ntt_context
    from kzg_snark_tpu.ops.host.field import scalar_field

    out = {}
    n = 1 << 20
    ctx = ntt_context("bn254", n)
    be = ctx.backend
    # Pseudo-random but reproducible input (device-side LCG over limbs).
    key = jax.random.PRNGKey(7)
    x = jax.random.randint(key, (be.num_limbs, n), 0, 1 << 16,
                           dtype=jnp.int32).astype(jnp.uint32)

    fwd = jax.jit(ctx.ntt)
    inv = jax.jit(ctx.intt)
    t0 = time.perf_counter()
    y = _sync(fwd(x))
    out["ntt20_first_s"] = round(time.perf_counter() - t0, 3)

    # Chained-input slope timing: the device tunnel pipelines identical
    # dispatches, so single-call timings under-measure; the marginal cost
    # of extra chained calls is the honest per-transform latency.
    def chain(f, x0, reps):
        v = x0
        t0 = time.perf_counter()
        for _ in range(reps):
            v = f(v)
        _sync(v)
        return time.perf_counter() - t0
    chain(fwd, x, 2)
    t_lo = min(chain(fwd, x, 4) for _ in range(2))
    t_hi = min(chain(fwd, x, 12) for _ in range(2))
    out["ntt20_ms"] = round((t_hi - t_lo) / 8 * 1e3, 2)
    t_lo = min(chain(inv, y, 4) for _ in range(2))
    t_hi = min(chain(inv, y, 12) for _ in range(2))
    out["intt20_ms"] = round((t_hi - t_lo) / 8 * 1e3, 2)

    # Parity: round-trip must be exact, and a spot evaluation must match
    # an independent host Horner evaluation of the same polynomial.
    rt = _sync(ctx.intt(y))
    out["ntt20_roundtrip_exact"] = bool((rt == x).all())
    Fr = scalar_field("bn254")
    coeffs = be.to_ints(x[:, :4096])          # degree-4095 prefix spot check
    w = Fr(ctx.root) ** (n // 4096)
    # evaluate prefix poly at a root of the size-4096 subdomain both ways
    sub = ntt_context("bn254", 4096)
    dev_evals = be.to_ints(sub.ntt(x[:, :4096]))
    acc = Fr(0)
    pt = w ** 5
    for c in reversed(coeffs):
        acc = acc * pt + Fr(c)
    out["ntt_parity_spot_ok"] = bool(int(acc) == dev_evals[5])
    return out


def section_msm(size: int) -> dict:
    from kzg_snark_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import random

    import jax
    import jax.numpy as jnp
    import numpy as np
    from kzg_snark_tpu.models.kzg import KZG
    from kzg_snark_tpu.ops.msm_kernel import fused_msm
    from kzg_snark_tpu.ops.fr import ints_to_limb_array
    from kzg_snark_tpu.ops.srs import setup_g1_powers
    from kzg_snark_tpu.rng import Rng

    out = {}
    rng = random.Random(1234)
    kzg = KZG("bn254", backend="host", rng=Rng(1))

    t0 = time.perf_counter()
    srs = setup_g1_powers(kzg, 0x1234567890ABCDEF1234567, size - 1)
    _sync(srs.points)
    out["srs_setup_s"] = round(time.perf_counter() - t0, 3)

    fm = fused_msm("bn254")
    planes = tuple(_sync(p) for p in fm.prepare_points(srs.points))
    r = kzg.curve_order
    scalars = [rng.randrange(r) for _ in range(size)]
    limbs = jnp.asarray(ints_to_limb_array(scalars, 16))
    # distinct scalar vectors per rep: the tunnel pipelines/caches repeated
    # identical dispatches, which under-measures
    alt_ints = [[rng.randrange(r) for _ in range(size)] for _ in range(3)]
    alts = [jnp.asarray(ints_to_limb_array(v, 16)) for v in alt_ints]

    def run(lb):
        res = fm.msm_prepared(planes, lb)
        np.asarray(jax.device_get(res))
        return res

    t0 = time.perf_counter()
    run(limbs)
    out["msm_first_s"] = round(time.perf_counter() - t0, 3)
    ts = []
    for lb in alts:
        t0 = time.perf_counter()
        run(lb)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    out["msm_steady_s"] = round(t, 4)
    out["msm_rate"] = round(size / t, 1)

    # Correctness spot check via additivity: msm(s1) + msm(s2) must equal
    # msm(s1 + s2 mod r).  Reuses the already-compiled MSM path (no new
    # kernel widths; a tree_sum-based check costs ~20 extra compiles).
    sum_sc = [(x + y) % r for x, y in zip(alt_ints[0], alt_ints[1])]
    lb_sum = jnp.asarray(ints_to_limb_array(sum_sc, 16))
    r1 = fm.msm_prepared(planes, alts[0])
    r2 = fm.msm_prepared(planes, alts[1])
    r12 = fm.msm_prepared(planes, lb_sum)
    lhs = fm.curve.to_affine_ints(fm.curve.add(r1, r2))[0]
    rhs = fm.curve.to_affine_ints(r12)[0]
    out["msm_spot_ok"] = bool(lhs == rhs)
    return out


def section_plonk() -> dict:
    from kzg_snark_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    from kzg_snark_tpu.models.plonk.device import DeviceProver
    from kzg_snark_tpu.models.plonk.verifier import Verifier
    from kzg_snark_tpu.ops.host.field import scalar_field
    from kzg_snark_tpu.rng import Rng

    out = {}
    n = 1 << PLONK_LOG_N
    Fr = scalar_field("bn254")
    # Synthetic circuit: row i enforces a_i * b_i = c_i (all mul gates),
    # identity permutation; witness a_i = i+2, b_i = i+3.
    one, zero = Fr(1), Fr(0)
    qM = [one] * n
    qO = [-one] * n
    qZ = [zero] * n
    perm = list(range(3 * n))
    a = [Fr(i + 2) for i in range(n)]
    b = [Fr(i + 3) for i in range(n)]
    c = [x * y for x, y in zip(a, b)]
    w = a + b + c

    prover = DeviceProver("bn254", rng=Rng(77), collect_timings=True)
    t0 = time.perf_counter()
    ipk, ivk = prover.preprocess(qM, qZ, qZ, qO, qZ, perm,
                                 max_degree=n + 5, tau=0xABCDEF12345)
    out["plonk_index_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    proof = prover.prove(ipk, [], w)
    out["plonk_first_prove_s"] = round(time.perf_counter() - t0, 2)
    t = best_of(lambda: prover.prove(ipk, [], w), reps=2)
    out["plonk_prove_s"] = round(t, 3)
    out["plonk_proofs_per_s"] = round(1.0 / t, 4)
    out["plonk_n"] = n
    if getattr(prover, "timings", None):
        out["plonk_phases_ms"] = {k: round(v * 1e3, 1)
                                  for k, v in prover.timings.items()}

    verifier = Verifier("bn254", rng=Rng(78))
    t0 = time.perf_counter()
    ok = verifier.verify(ivk, [], proof)
    out["plonk_verify_s"] = round(time.perf_counter() - t0, 3)
    out["plonk_verify_ok"] = bool(ok)
    return out


def section_marlin() -> dict:
    from kzg_snark_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    from kzg_snark_tpu.models.marlin.indexer import Indexer
    from kzg_snark_tpu.models.marlin.prover import Prover
    from kzg_snark_tpu.models.marlin.verifier import Verifier
    from kzg_snark_tpu.utils.fixtures import load_r1cs
    from kzg_snark_tpu.rng import Rng

    out = {}
    inst = load_r1cs("/root/reference/constraint-system/R1CS_INSTANCE.pkl")
    t0 = time.perf_counter()
    indexer = Indexer(curve_type="bn254", backend="tpu", rng=Rng(11))
    ipk, ivk = indexer.preprocess(inst.A, inst.B, inst.C, max_degree=200,
                                  tau=0x5151)
    out["marlin_index_s"] = round(time.perf_counter() - t0, 2)
    x, w = inst.z[:5], inst.z[5:]
    prover = Prover(curve_type="bn254", backend="tpu", rng=Rng(12))
    t0 = time.perf_counter()
    proof = prover.prove(ipk, x, w)
    out["marlin_prove_s"] = round(time.perf_counter() - t0, 2)
    verifier = Verifier(curve_type="bn254", rng=Rng(13))
    t0 = time.perf_counter()
    ok = verifier.verify(ivk, x, proof)
    out["marlin_verify_s"] = round(time.perf_counter() - t0, 3)
    out["marlin_e2e_ok"] = bool(ok)
    return out


# ---------------------------------------------------------------------------
# Orchestrator.
# ---------------------------------------------------------------------------

def _run_section(args: list[str]) -> dict:
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + args,
            capture_output=True, text=True, timeout=SECTION_TIMEOUT_S,
            cwd=os.path.dirname(os.path.abspath(__file__)) or ".")
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {SECTION_TIMEOUT_S}s"}
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-3:]
    return {"error": " | ".join(tail)[-300:]}


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--section":
        name = sys.argv[2]
        try:
            if name == "ntt":
                result = section_ntt()
            elif name == "msm":
                result = section_msm(int(sys.argv[3]))
            elif name == "plonk":
                result = section_plonk()
            elif name == "marlin":
                result = section_marlin()
            else:
                result = {"error": f"unknown section {name}"}
        except Exception as e:  # noqa: BLE001
            import traceback
            traceback.print_exc()
            result = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(result))
        return 0

    extras = {"attempted": {}}
    headline_rate = 0.0
    headline_size = 0
    for size in MSM_SIZES:
        msm = _run_section(["--section", "msm", str(size)])
        extras["attempted"][f"msm_{size}"] = msm
        rate = msm.get("msm_rate", 0.0)
        # headline = the BASELINE size (2^20) if it ran; else best rate
        if size == MSM_SIZES[0] and rate:
            headline_rate, headline_size = rate, size
        elif not headline_rate and rate > headline_rate:
            headline_rate, headline_size = rate, size

    for name in ("ntt", "plonk", "marlin"):
        extras["attempted"][name] = _run_section(["--section", name])

    flat = {}
    for sec in extras["attempted"].values():
        if isinstance(sec, dict):
            flat.update({k: v for k, v in sec.items() if k != "error"})
    flat["headline_msm_size"] = headline_size
    flat["sections"] = {k: ("ok" if "error" not in v else v["error"][:160])
                        for k, v in extras["attempted"].items()}

    print(json.dumps({
        "metric": "g1_msm_points_per_sec_per_chip",
        "value": round(headline_rate, 1),
        "unit": "points/s",
        "vs_baseline": round(headline_rate / TARGET_MSM, 6),
        "extras": flat,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
