"""PLONK prover, TPU device pipeline.

The scale path for BASELINE config #4 (proofs/s at n = 2^16): protocol
semantics identical to the host prover (``models/plonk/prover.py``, itself a
behavioral equivalent of ``/root/reference/plonk/prover.py``) — same
transcript schedule, same RNG draw order, same proof shape — but every
O(n)-or-larger computation runs on device:

  * wire/permutation polynomial interpolation       -> iNTT (ops.ntt)
  * grand-product accumulator (reference :245-261)  -> blocked prefix scan
  * quotient computation (reference :271-318)       -> 4n *coset* evaluation
    domain: numerators evaluated pointwise, multiplied by a precomputed
    1/v_H table (no polynomial division at all)
  * z(omega X) shift (reference :305)               -> roll by 4 on the 4n
    coset (g = w4^4)
  * commitments                                     -> Pippenger MSM over
    the DeviceSRS
  * openings (X - z division, kzg.py:154)           -> suffix-scan trick:
    w_j = zeta^{-(j+1)} * sum_{i>j} c_i zeta^i

Given the same Rng seed and tau, the device prover emits *byte-identical*
proofs to the host prover (cross-validated in tests/test_plonk_device.py) —
the quotient is the same polynomial whether obtained by exact division or
coset interpolation, because deg t <= 3n+5 < 4n.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...ops.fr import fr_backend
from ...ops.msm import msm_context
from ...ops.ntt import NttContext, ntt_context
from ...ops.host.field import scalar_field
from ...ops.srs import DeviceSRS
from ...rng import Rng
from ...transcript import Transcript


class PlonkDeviceCore:
    """Precomputed constants + jitted kernels for one (curve, n)."""

    _CACHE: dict = {}

    def __new__(cls, curve_type: str, n: int):
        key = (curve_type, n)
        if key in cls._CACHE:
            return cls._CACHE[key]
        self = super().__new__(cls)
        self._init(curve_type, n)
        cls._CACHE[key] = self
        return self

    def _init(self, curve_type: str, n: int) -> None:
        self.curve_type = curve_type
        self.n = n
        self.be = fr_backend(curve_type)
        be = self.be
        p = be.modulus
        Fr = scalar_field(curve_type)

        self.ntt_n = ntt_context(curve_type, n)
        self.ntt_4n = ntt_context(curve_type, 4 * n)
        self.g = self.ntt_n.root                    # |H| generator
        self.w4 = self.ntt_4n.root
        self.shift = Fr.generator                   # coset shift s (gen of Fr*)
        s = self.shift

        # Coset points x_i = s w4^i and derived tables, all (L, 4n).
        self.x4 = be.mul(self.ntt_4n.powers(self.w4), be.scalar(s))
        vh4 = be.sub(be.pow_const(self.x4, n),
                     jnp.broadcast_to(be.one_mont, self.x4.shape))
        self.inv_vh4 = be.inv(vh4)
        # L1(x) = (x^n - 1) / (n (x - 1)) on the coset.
        denom = be.mul(be.sub(self.x4, be.one_mont), be.scalar(n))
        self.L1_4 = be.mul(vh4, be.inv(denom))
        # Powers of the H generator (L, n) for the grand product.
        self.h_pows = self.ntt_n.powers(self.g)

    # ------------------------------------------------------------------
    # Device kernels (methods are traced through cached jit wrappers).
    # ------------------------------------------------------------------
    def wire_poly(self, values: jax.Array, b_hi, b_lo) -> jax.Array:
        """(b_hi X + b_lo) v_H + iNTT(values): coeffs (L, n+2)."""
        be = self.be
        base = self.ntt_n.intt(values)                     # (L, n)
        lo0 = be.sub(base[:, :1], b_lo)
        lo1 = be.sub(base[:, 1:2], b_hi)
        return jnp.concatenate([lo0, lo1, base[:, 2:], b_lo, b_hi], axis=1)

    def z_poly(self, a_v, b_v, c_v, s1_v, s2_v, s3_v, beta, gamma,
               k1, k2, b7, b8, b9) -> jax.Array:
        """Grand product + (b7 X^2 + b8 X + b9) v_H: coeffs (L, n+3)."""
        be = self.be
        h = self.h_pows

        def factor(w_v, mult):
            return be.add(be.add(w_v, be.mul(be.mul(beta, mult), h)), gamma)

        def factor_sig(w_v, sig):
            return be.add(be.add(w_v, be.mul(beta, sig)), gamma)

        one = jnp.broadcast_to(be.one_mont, (be.num_limbs, 1))
        num = be.mul(be.mul(factor(a_v, one), factor(b_v, k1)),
                     factor(c_v, k2))
        den = be.mul(be.mul(factor_sig(a_v, s1_v), factor_sig(b_v, s2_v)),
                     factor_sig(c_v, s3_v))
        ratio = be.mul(num, be.batch_inv(den))
        z_vals = be.exclusive_prefix_prod(ratio)           # z(w^i)
        base = self.ntt_n.intt(z_vals)                     # (L, n)
        # + (b7 X^2 + b8 X + b9)(X^n - 1)
        c0 = be.sub(base[:, :1], b9)
        c1 = be.sub(base[:, 1:2], b8)
        c2 = be.sub(base[:, 2:3], b7)
        return jnp.concatenate([c0, c1, c2, base[:, 3:], b9, b8, b7], axis=1)

    def to_coset_evals(self, coeffs: jax.Array) -> jax.Array:
        """coeffs (L, m<=4n) -> evaluations on the shift*H4 coset (L, 4n)."""
        be = self.be
        L, m = coeffs.shape
        if m < 4 * self.n:
            coeffs = jnp.concatenate(
                [coeffs, jnp.zeros((L, 4 * self.n - m), jnp.uint32)], axis=1)
        return self.ntt_4n.coset_ntt(coeffs, self.shift)

    def quotient_coeffs(self, a4, b4, c4, z4, qM4, qL4, qR4, qO4, qC4,
                        s14, s24, s34, pi4, alpha, beta, gamma,
                        k1, k2) -> jax.Array:
        """t = (gate + alpha perm + alpha^2 L1-term) / v_H, computed
        pointwise on the coset; returns coeffs (L, 4n)."""
        be = self.be
        x4 = self.x4
        gate = be.add(
            be.add(be.add(be.mul(be.mul(a4, b4), qM4), be.mul(a4, qL4)),
                   be.add(be.mul(b4, qR4), be.mul(c4, qO4))),
            be.add(pi4, qC4))

        z4_shift = jnp.roll(z4, -4, axis=1)                # z(g x) on coset
        t1 = be.add(be.add(a4, be.mul(beta, x4)), gamma)
        t2 = be.add(be.add(b4, be.mul(be.mul(beta, k1), x4)), gamma)
        t3 = be.add(be.add(c4, be.mul(be.mul(beta, k2), x4)), gamma)
        u1 = be.add(be.add(a4, be.mul(beta, s14)), gamma)
        u2 = be.add(be.add(b4, be.mul(beta, s24)), gamma)
        u3 = be.add(be.add(c4, be.mul(beta, s34)), gamma)
        perm = be.sub(be.mul(be.mul(be.mul(t1, t2), t3), z4),
                      be.mul(be.mul(be.mul(u1, u2), u3), z4_shift))

        one = jnp.broadcast_to(be.one_mont, z4.shape)
        l1_term = be.mul(be.sub(z4, one), self.L1_4)

        alpha2 = be.mul(alpha, alpha)
        num = be.add(gate, be.add(be.mul(alpha, perm),
                                  be.mul(alpha2, l1_term)))
        t4 = be.mul(num, self.inv_vh4)
        return self.ntt_4n.coset_intt(t4, self.shift)

    def eval_at(self, coeffs: jax.Array, point: int) -> jax.Array:
        """Horner-free evaluation: sum c_i z^i via powers table + tree sum."""
        be = self.be
        pows = be.powers_of(point, coeffs.shape[1])
        return be.sum_reduce(be.mul(coeffs, pows))

    def open_at(self, coeffs: jax.Array, point: int) -> jax.Array:
        """Witness (p - p(z)) / (X - z) via the suffix-scan identity
        w_j = z^{-(j+1)} sum_{i>j} c_i z^i; returns coeffs (L, m-1)."""
        be = self.be
        m = coeffs.shape[1]
        z_int = point % be.modulus
        pows = be.powers_of(z_int, m)
        u = be.mul(coeffs, pows)
        suffix = be.suffix_sums_exclusive(u)               # (L, m)
        z_inv = pow(z_int, -1, be.modulus)
        inv_pows = be.mul(be.powers_of(z_inv, m),
                          be.scalar(z_inv))                # z^{-(j+1)}
        return be.mul(suffix, inv_pows)[:, :m - 1]

    # ------------------------------------------------------------------
    # Device-scalar variants (jitted round kernels).  The axon device
    # tunnel costs ~25-45ms per python-level dispatch; at n = 2^16 a
    # prove() issues hundreds of ops, so each round runs as ONE jitted
    # call with challenges passed as (L, 1) Montgomery device scalars.
    # ------------------------------------------------------------------
    def powers_dev(self, z_scalar: jax.Array, count: int) -> jax.Array:
        """[1, z, ..., z^(count-1)] (L, count) from a (L, 1) scalar:
        exclusive prefix-product of the constant-z vector."""
        be = self.be
        zbc = jnp.broadcast_to(z_scalar, (be.num_limbs, count))
        return be.exclusive_prefix_prod(zbc)

    def eval_dev(self, coeffs: jax.Array, z_scalar: jax.Array) -> jax.Array:
        be = self.be
        return be.sum_reduce(be.mul(coeffs, self.powers_dev(
            z_scalar, coeffs.shape[1])))

    def open_dev(self, coeffs: jax.Array, z_scalar: jax.Array) -> jax.Array:
        be = self.be
        m = coeffs.shape[1]
        u = be.mul(coeffs, self.powers_dev(z_scalar, m))
        suffix = be.suffix_sums_exclusive(u)
        z_inv = be.inv(z_scalar)
        inv_pows = be.mul(self.powers_dev(z_inv, m), z_inv)
        return be.mul(suffix, inv_pows)[:, :m - 1]

    def combine_weighted(self, arrays: list, weights: jax.Array
                         ) -> jax.Array:
        """sum_i weights[i] * arrays[i], arrays zero-padded to the longest;
        weights (k, L, 1) Montgomery scalars."""
        be = self.be
        L = be.num_limbs
        max_len = max(a.shape[1] for a in arrays)
        acc = jnp.zeros((L, max_len), jnp.uint32)
        for i, arr in enumerate(arrays):
            m = arr.shape[1]
            if m < max_len:
                arr = jnp.concatenate(
                    [arr, jnp.zeros((L, max_len - m), jnp.uint32)], axis=1)
            acc = be.add(acc, be.mul(arr, weights[i]))
        return acc

    def round3(self, a_poly, b_poly, c_poly, z_poly, pi_coeffs,
               qM4, qL4, qR4, qO4, qC4, s14, s24, s34,
               alpha, beta, gamma, k1, k2, b10, b11):
        """Quotient + split as one traced computation: coset evaluation of
        the wire/z/PI polynomials, pointwise quotient, iNTT back, and the
        t_lo/t_mid/t_hi split with cross-blinding (reference
        plonk/prover.py:271-356)."""
        be = self.be
        n = self.n
        to4 = self.to_coset_evals
        t_coeffs = self.quotient_coeffs(
            to4(a_poly), to4(b_poly), to4(c_poly), to4(z_poly),
            qM4, qL4, qR4, qO4, qC4, s14, s24, s34, to4(pi_coeffs),
            alpha, beta, gamma, k1, k2)
        t_lo = jnp.concatenate([t_coeffs[:, :n], b10], axis=1)
        t_mid_first = be.sub(t_coeffs[:, n:n + 1], b10)
        t_mid = jnp.concatenate(
            [t_mid_first, t_coeffs[:, n + 1:2 * n], b11], axis=1)
        t_hi_first = be.sub(t_coeffs[:, 2 * n:2 * n + 1], b11)
        t_hi = jnp.concatenate(
            [t_hi_first, t_coeffs[:, 2 * n + 1:3 * n + 6]], axis=1)
        return t_lo, t_mid, t_hi

    def jit_method(self, name: str):
        """Cached jax.jit of a bound method (one compiled program per
        argument-shape set; challenges ride as device scalars).

        Under KZG_TPU_CHECKED=1 every jitted round's *output* is validated
        on host (limbs 16-bit clean, values canonical < p) — this is the
        debug pass that reaches inside the jitted/Pallas paths, which the
        eager CheckedFieldBackend cannot see (VERDICT.md round-2 weak #5).
        """
        key = "_jit_" + name
        if not hasattr(self, key):
            fn = jax.jit(getattr(self, name))
            from ...ops.fr import checked_enabled, validate_tree_canonical
            if checked_enabled():
                inner, be = fn, self.be

                def checked_fn(*args, _inner=inner, _name=name, **kw):
                    return validate_tree_canonical(
                        be, _inner(*args, **kw), f"plonk.{_name}")
                fn = checked_fn
            setattr(self, key, fn)
        return getattr(self, key)


class DeviceProver:
    """PLONK prover with device compute; drop-in for the host Prover when
    ``backend='tpu'`` (same prove() contract, transcript, and proof dict)."""

    def __init__(self, curve_type: str = "bn254", rng: Rng | None = None,
                 collect_timings: bool = False):
        from ..kzg import KZG
        self.kzg = KZG(curve_type=curve_type, backend="tpu", rng=rng)
        self.rng = self.kzg.rng
        self.collect_timings = collect_timings
        self.timings: dict[str, float] = {}

    def _phase(self, name: str, t0: float) -> float:
        """Record elapsed wall time for a prover phase (SURVEY.md §5
        metrics row); returns a fresh timestamp.  Timing forces a device
        sync only when enabled."""
        import time
        if self.collect_timings:
            t = time.perf_counter()
            self.timings[name] = self.timings.get(name, 0.0) + (t - t0)
            return t
        return t0

    # -- helpers --------------------------------------------------------
    def _commit_coeffs(self, ck: DeviceSRS, coeffs_mont: jax.Array):
        """Commit device Montgomery coeff array -> host projective tuple."""
        ctx = msm_context(self.kzg.curve_type)
        be = ctx.scalar_backend
        m = coeffs_mont.shape[1]
        if m >= ctx.fused_threshold:
            # exact-length slice: the fused kernel pads to a 1024-multiple
            # internally, so nearby commit sizes share one compiled kernel
            # (slice_pow2 would double the MSM size at n+epsilon lengths)
            pts = ck.points[..., :m]
        else:
            pts = ck.slice_pow2(m)
        n = pts.shape[-1]
        canonical = be.from_mont(coeffs_mont)
        if n > m:
            canonical = jnp.concatenate(
                [canonical, jnp.zeros((be.num_limbs, n - m), jnp.uint32)],
                axis=1)
        result = ctx.msm(pts, canonical)
        affine = ctx.curve.to_affine_ints(result)[0]
        if affine is None:
            return self.kzg.Z1
        Fp = type(self.kzg.G1[0])
        return (Fp(affine[0]), Fp(affine[1]), Fp(1))

    # -- the prover -----------------------------------------------------
    def prove(self, ipk, x, w):
        kzg = self.kzg
        Fq = kzg.Fq
        ck = ipk["ck"]
        if not isinstance(ck, DeviceSRS):
            raise TypeError("DeviceProver needs an ipk built with backend='tpu'")
        n = ipk["subgroups"]["n"]
        g = ipk["subgroups"]["g"]
        k1 = ipk["subgroups"]["k1"]
        k2 = ipk["subgroups"]["k2"]
        sigma_star = ipk["sigma_star"]

        import time
        self.timings = {}
        t0 = time.perf_counter()
        core = PlonkDeviceCore(kzg.curve_type, n)
        be = core.be
        assert int(g) == core.g, \
            "ipk domain generator differs from the deterministic device domain"

        dev = self._device_index_polys(ipk, core)
        t0 = self._phase("setup", t0)

        transcript = Transcript("plonk-proof", Fq)
        transcript.append_message("public-inputs", list(x))

        full_witness = [int(Fq(int(v))) for v in list(x) + list(w)]

        # The host prover (mirroring reference plonk/prover.py:62-68) builds
        # a throwaway encoder whose update_state rejection-samples coset
        # multipliers from the shared RNG.  Replicate those draws exactly so
        # the blinding stream stays aligned with the host pipeline.
        while True:
            k1_dummy = self.rng.random_element(Fq)
            k2_dummy = self.rng.random_element(Fq)
            if (k1_dummy != 0 and k2_dummy != 0 and k1_dummy ** n != 1
                    and k2_dummy ** n != 1
                    and (k1_dummy / k2_dummy) ** n != 1):
                break

        # PI(X): evals over H are (-x_i at i < len(x), else 0) -> iNTT
        # (identical to the host Lagrange construction).
        pi_vals = [(-Fq(int(v))).n for v in x] + [0] * (n - len(x))
        pi_coeffs = core.ntt_n.intt(be.from_ints(pi_vals))

        # ----- Round 1 (host prover parity: draws b1..b9 in order) -----
        draws = [self.rng.random_element(Fq) for _ in range(9)]
        b1, b2, b3, b4, b5, b6, b7, b8, b9 = draws
        sc = lambda v: be.scalar(int(v))

        a_vals = be.from_ints(full_witness[:n])
        b_vals = be.from_ints(full_witness[n:2 * n])
        c_vals = be.from_ints(full_witness[2 * n:3 * n])

        j_wire = core.jit_method("wire_poly")
        a_poly = j_wire(a_vals, sc(b1), sc(b2))
        b_poly = j_wire(b_vals, sc(b3), sc(b4))
        c_poly = j_wire(c_vals, sc(b5), sc(b6))

        t0 = self._phase("round1_wires", t0)
        a_commit = self._commit_coeffs(ck, a_poly)
        b_commit = self._commit_coeffs(ck, b_poly)
        c_commit = self._commit_coeffs(ck, c_poly)
        wire_commitments = [a_commit, b_commit, c_commit]
        transcript.append_message("round1-commitments", wire_commitments)
        t0 = self._phase("round1_commits_msm", t0)

        # ----- Round 2 -----
        beta = transcript.get_challenge("beta")
        gamma = transcript.get_challenge("gamma")

        z_poly = core.jit_method("z_poly")(
            a_vals, b_vals, c_vals,
            dev["sig1_vals"], dev["sig2_vals"], dev["sig3_vals"],
            sc(beta), sc(gamma), sc(k1), sc(k2),
            sc(b7), sc(b8), sc(b9))
        t0 = self._phase("round2_grand_product", t0)
        z_commit = self._commit_coeffs(ck, z_poly)
        transcript.append_message("round2-commitment", z_commit)
        t0 = self._phase("round2_commit_msm", t0)

        # ----- Round 3 -----
        alpha = transcript.get_challenge("alpha")

        b10 = self.rng.random_element(Fq)
        b11 = self.rng.random_element(Fq)
        t_lo, t_mid, t_hi = core.jit_method("round3")(
            a_poly, b_poly, c_poly, z_poly, pi_coeffs,
            dev["qM4"], dev["qL4"], dev["qR4"], dev["qO4"], dev["qC4"],
            dev["s14"], dev["s24"], dev["s34"],
            sc(alpha), sc(beta), sc(gamma), sc(k1), sc(k2),
            sc(b10), sc(b11))

        t0 = self._phase("round3_quotient_ntt", t0)
        t_lo_commit = self._commit_coeffs(ck, t_lo)
        t_mid_commit = self._commit_coeffs(ck, t_mid)
        t_hi_commit = self._commit_coeffs(ck, t_hi)
        t_commitments = [t_lo_commit, t_mid_commit, t_hi_commit]
        transcript.append_message("round3-commitments", t_commitments)
        t0 = self._phase("round3_commits_msm", t0)

        # ----- Round 4 -----
        zeta = transcript.get_challenge("zeta")
        zeta_i = int(zeta)
        j_eval = core.jit_method("eval_dev")
        ev = lambda coeffs, pt: Fq(be.to_ints(j_eval(coeffs, sc(pt)))[0])
        a_zeta = ev(a_poly, zeta_i)
        b_zeta = ev(b_poly, zeta_i)
        c_zeta = ev(c_poly, zeta_i)
        s_sigma1_zeta = ev(dev["sig1_coeffs"], zeta_i)
        s_sigma2_zeta = ev(dev["sig2_coeffs"], zeta_i)
        z_omega_zeta = ev(z_poly, int(zeta * Fq(int(g))))

        evaluations = [a_zeta, b_zeta, c_zeta, s_sigma1_zeta, s_sigma2_zeta,
                       z_omega_zeta]
        transcript.append_message("round4-evaluations", evaluations)
        t0 = self._phase("round4_evals", t0)

        # ----- Round 5 -----
        v = transcript.get_challenge("v")

        r_poly = self._linearization(core, dev, z_poly, t_lo, t_mid, t_hi,
                                     a_zeta, b_zeta, c_zeta, s_sigma1_zeta,
                                     s_sigma2_zeta, z_omega_zeta,
                                     alpha, beta, gamma, zeta,
                                     Fq(int(k1)), Fq(int(k2)), pi_coeffs, n)

        W_z = self._open(ck, core, [r_poly, a_poly, b_poly, c_poly,
                                    dev["sig1_coeffs"], dev["sig2_coeffs"]],
                         zeta_i, int(v))
        W_zw = self._open(ck, core, [z_poly], int(zeta * Fq(int(g))), int(v))
        t0 = self._phase("round5_openings", t0)

        return {
            "commitments": {
                "a": a_commit, "b": b_commit, "c": c_commit,
                "z": z_commit,
                "t_lo": t_lo_commit, "t_mid": t_mid_commit, "t_hi": t_hi_commit,
            },
            "evaluations": {
                "a": a_zeta, "b": b_zeta, "c": c_zeta,
                "s_sigma1": s_sigma1_zeta, "s_sigma2": s_sigma2_zeta,
                "z_omega": z_omega_zeta,
            },
            "kzg_proofs": {"W_z": W_z, "W_zw": W_zw},
        }

    # ------------------------------------------------------------------
    def _device_index_polys(self, ipk, core: PlonkDeviceCore) -> dict:
        """Convert (and cache) the ipk's index polynomials to device arrays."""
        if "_device_cache" in ipk:
            return ipk["_device_cache"]
        be = core.be
        n = core.n
        polys = ipk["polynomials"]

        def coeffs_of(name):
            return be.from_ints([int(c) for c in polys[name].padded(n)])

        dev = {}
        coeff_key = {"S_sigma1": "sig1_coeffs", "S_sigma2": "sig2_coeffs",
                     "S_sigma3": "sig3_coeffs"}
        for name, key in [("qM", "qM4"), ("qL", "qL4"), ("qR", "qR4"),
                          ("qO", "qO4"), ("qC", "qC4"),
                          ("S_sigma1", "s14"), ("S_sigma2", "s24"),
                          ("S_sigma3", "s34")]:
            coeffs = coeffs_of(name)
            dev[key] = core.to_coset_evals(coeffs)
            dev[coeff_key.get(name, name + "_coeffs")] = coeffs
        # sigma evaluations over H for the grand product (= sigma_star).
        sigma_star = ipk["sigma_star"]
        dev["sig1_vals"] = be.from_ints([int(s) for s in sigma_star[:n]])
        dev["sig2_vals"] = be.from_ints([int(s) for s in sigma_star[n:2 * n]])
        dev["sig3_vals"] = be.from_ints([int(s) for s in sigma_star[2 * n:]])
        ipk["_device_cache"] = dev
        return dev

    # ------------------------------------------------------------------
    def _linearization(self, core, dev, z_poly, t_lo, t_mid, t_hi,
                       a_zeta, b_zeta, c_zeta, s1_z, s2_z, zw_z,
                       alpha, beta, gamma, zeta, k1, k2, pi_coeffs, n):
        """r(X) as a device coeff array: a scalar-weighted combination of
        committed coefficient arrays (reference plonk/prover.py:358-414)."""
        be = core.be
        Fq = self.kzg.Fq

        z_H_zeta = zeta ** n - 1
        L1_zeta = z_H_zeta / (Fq(n) * (zeta - 1))
        pi_zeta = Fq(be.to_ints(core.eval_at(pi_coeffs, int(zeta)))[0])

        # Scalar weights (all exact host Fq arithmetic).
        s_gate_qM = a_zeta * b_zeta
        s_perm_z = alpha * ((a_zeta + beta * zeta + gamma)
                            * (b_zeta + beta * k1 * zeta + gamma)
                            * (c_zeta + beta * k2 * zeta + gamma))
        s3_factor = -alpha * ((a_zeta + beta * s1_z + gamma)
                              * (b_zeta + beta * s2_z + gamma) * zw_z)
        s_copy = alpha ** 2 * L1_zeta
        constant = (pi_zeta + s3_factor * (c_zeta + gamma) - s_copy)

        arrays = [dev["qM_coeffs"], dev["qL_coeffs"], dev["qR_coeffs"],
                  dev["qO_coeffs"], dev["qC_coeffs"], z_poly,
                  dev["sig3_coeffs"], t_lo, t_mid, t_hi]
        weight_ints = [s_gate_qM, a_zeta, b_zeta, c_zeta, Fq(1),
                       s_perm_z + s_copy, s3_factor * beta,
                       -z_H_zeta, -z_H_zeta * zeta ** n,
                       -z_H_zeta * zeta ** (2 * n)]
        weights = be.from_ints([int(v) for v in weight_ints])
        weights = jnp.moveaxis(weights, 1, 0)[:, :, None]   # (k, L, 1)
        acc = core.jit_method("combine_weighted")(arrays, weights)
        # + constant at coefficient 0
        const_col = be.add(acc[:, :1], be.scalar(int(constant)))
        return jnp.concatenate([const_col, acc[:, 1:]], axis=1)

    def preprocess(self, qM, qL, qR, qO, qC, perm, max_degree: int,
                   tau: int | None = None):
        """Device-encoded indexing: same (ipk, ivk) contract and RNG draw
        order as ``models/plonk/indexer.Indexer.preprocess`` (reference
        plonk/indexer.py:26-120 / plonk/encoder.py:37-168), but the eight
        index interpolations run as device iNTTs and the commitments as
        device MSMs — indexing at n = 2^16 takes seconds, not minutes.
        """
        from ...ops.host.poly import Poly
        kzg = self.kzg
        Fq = kzg.Fq
        ck, rk = kzg.setup(max_degree, tau=tau)

        n = 1 << (len(qM) - 1).bit_length()
        core = PlonkDeviceCore(kzg.curve_type, n)
        be = core.be
        g = Fq(core.g)

        # Coset multipliers: identical rejection sampling / draw order to
        # the host encoder (reference plonk/encoder.py:72-97).
        while True:
            k1 = self.rng.random_element(Fq)
            k2 = self.rng.random_element(Fq)
            if (k1 != 0 and k2 != 0 and k1 ** n != 1 and k2 ** n != 1
                    and (k1 / k2) ** n != 1):
                break

        H = [Fq(1)]
        for _ in range(n - 1):
            H.append(H[-1] * g)
        k1H = [k1 * h for h in H]
        k2H = [k2 * h for h in H]
        flat = H + k1H + k2H
        sigma_star = [flat[perm[i]] for i in range(3 * n)]

        def interp(values) -> Poly:
            vals = be.from_ints([int(Fq(int(v))) for v in values]
                                + [0] * (n - len(values)))
            coeffs = be.to_ints(core.ntt_n.intt(vals))
            return Poly(Fq, coeffs)

        polys = {
            "qM": interp(qM), "qL": interp(qL), "qR": interp(qR),
            "qO": interp(qO), "qC": interp(qC),
            "S_sigma1": interp(sigma_star[:n]),
            "S_sigma2": interp(sigma_star[n:2 * n]),
            "S_sigma3": interp(sigma_star[2 * n:]),
        }
        from .indexer import POLY_ORDER
        commitments = dict(zip(
            POLY_ORDER, kzg.commit(ck, [polys[p] for p in POLY_ORDER])))

        subgroups_pk = {"H": H, "n": n, "g": g, "k1": k1, "k2": k2}
        ipk = {
            "ck": ck, "polynomials": polys, "commitments": commitments,
            "subgroups": subgroups_pk,
            "vanishing_poly": Poly.vanishing(Fq, n),
            "sigma_star": sigma_star,
        }
        ivk = {
            "rk": rk, "commitments": commitments,
            "subgroups": {"n": n, "g": g, "k1": k1, "k2": k2},
        }
        return ipk, ivk

    def _open(self, ck, core, coeff_list, point: int, xi: int):
        """Batched opening: combined = sum xi^(i+1) p_i, witness by the
        suffix-scan opening, commit (reference kzg.py:122-159 semantics).
        One jitted combine + one jitted open per call."""
        be = core.be
        Fq = self.kzg.Fq
        xi_f = Fq(xi)
        weights = be.from_ints(
            [int(xi_f ** (i + 1)) for i in range(len(coeff_list))])
        weights = jnp.moveaxis(weights, 1, 0)[:, :, None]
        acc = core.jit_method("combine_weighted")(coeff_list, weights)
        witness = core.jit_method("open_dev")(acc, be.scalar(point % be.modulus))
        return self._commit_coeffs(ck, witness)
