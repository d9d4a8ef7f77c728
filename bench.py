#!/usr/bin/env python3
"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: G1 MSM throughput (points/s/chip), against the
BASELINE.json north-star of 1e7 points/s/chip; extras carry the 2^20 NTT
latency and phase timings.  The reference publishes no numbers
(BASELINE.md): its commit loop is pure-Python double-and-add
(/root/reference/kzg.py:112-117).

Process layout: the axon TPU tunnel is single-claim and a faulted program
poisons its process's device for good, so the orchestrator itself never
touches JAX — each section runs in its own subprocess (serially), and MSM
walks down from the target size until one size completes.  Compiled
programs persist across subprocesses via the partitioned compilation cache.
"""

import json
import os
import subprocess
import sys
import time

NTT_SIZE = 1 << 20
MSM_SIZES = [1 << 16, 1 << 14, 1 << 12, 1 << 10]
TARGET_MSM = 1.0e7
SECTION_TIMEOUT_S = 2400


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
    import jax  # noqa: F401
    import jax.numpy as jnp
    from kzg_snark_tpu.ops.ntt import ntt_context

    out = {}
    ctx = ntt_context("bn254", NTT_SIZE)
    be = ctx.backend
    x = jnp.ones((be.num_limbs, NTT_SIZE), dtype=jnp.uint32)

    def run():
        ctx.ntt(x).block_until_ready()

    t0 = time.perf_counter()
    run()
    out["ntt20_first_s"] = round(time.perf_counter() - t0, 3)
    out["ntt20_ms"] = round(best_of(run, reps=3) * 1e3, 2)
    return out


def section_msm(size: int) -> dict:
    from kzg_snark_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import random

    from kzg_snark_tpu.models.kzg import KZG
    from kzg_snark_tpu.ops.msm import msm_context
    from kzg_snark_tpu.ops.srs import setup_g1_powers
    from kzg_snark_tpu.rng import Rng

    out = {}
    rng = random.Random(1234)
    kzg = KZG("bn254", backend="host", rng=Rng(1))

    t0 = time.perf_counter()
    srs = setup_g1_powers(kzg, 0x1234567890ABCDEF1234567, size - 1)
    srs.points.block_until_ready()
    out["srs_setup_s"] = round(time.perf_counter() - t0, 3)

    ctx = msm_context("bn254")
    scalars = [rng.randrange(kzg.curve_order) for _ in range(size)]
    limbs = ctx.scalars_to_limbs(scalars)

    def run():
        ctx.msm(srs.points, limbs).block_until_ready()

    t0 = time.perf_counter()
    run()
    out["msm_first_s"] = round(time.perf_counter() - t0, 3)
    t = best_of(run, reps=3)
    out["msm_steady_s"] = round(t, 4)
    out["msm_size"] = size
    out["msm_rate"] = round(size / t, 1)
    return out


# ---------------------------------------------------------------------------
# Orchestrator.
# ---------------------------------------------------------------------------

def _run_section(args: list[str]) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)] + args,
        capture_output=True, text=True, timeout=SECTION_TIMEOUT_S,
        cwd=os.path.dirname(os.path.abspath(__file__)) or ".")
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
            else:
                result = {"error": f"unknown section {name}"}
        except Exception as e:  # noqa: BLE001
            result = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(result))
        return 0

    extras = {}
    ntt = _run_section(["--section", "ntt"])
    extras.update({("ntt_" + k if k == "error" else k): v
                   for k, v in ntt.items()})

    msm_rate = 0.0
    for size in MSM_SIZES:
        msm = _run_section(["--section", "msm", str(size)])
        if "msm_rate" in msm:
            msm_rate = msm.pop("msm_rate")
            extras.update(msm)
            break
        extras[f"msm_error_{size}"] = msm.get("error", "?")[:160]

    print(json.dumps({
        "metric": "g1_msm_points_per_sec_per_chip",
        "value": round(msm_rate, 1),
        "unit": "points/s",
        "vs_baseline": round(msm_rate / TARGET_MSM, 6),
        "extras": extras,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
