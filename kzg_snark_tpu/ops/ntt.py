"""Radix-2 NTT / iNTT over prime fields on TPU.

L1 of the TPU-native stack (SURVEY.md §7 layer 2): replaces the reference's
recursive pure-Python FFT (``/root/reference/fft_ff.py:3-85``) with staged
vectorized butterflies over Montgomery limb arrays.  Natural-order input and
output; because field arithmetic is exact, results are bit-identical to the
reference's recursion (tested against ``ops.host.fft`` in
``tests/test_ntt.py``).

Arrays follow the limb-major layout of ``ops.fr``: a polynomial of n
coefficients is a uint32 array of shape (L, n).  A butterfly stage is one
batched Montgomery multiply + add/sub over (L, blocks, span) views — the
whole transform is (n/2) log2(n) modular multiplies of full vector width.

* One :class:`NttContext` per (field, n): twiddle tables are built on device
  by log2(n) doubling concatenations and cached.
* The domain generator is the deterministic g^((r-1)/n) of
  ``ops.host.field.FieldElement.nth_root_of_unity`` — identical on host and
  device, so host Poly pipelines and device pipelines interoperate.
* For the multi-chip four-step decomposition see ``parallel/ntt_dist.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .fr import FieldBackend


def _pallas_enabled() -> bool:
    from .pallas_fr import pallas_enabled
    return pallas_enabled()


def _bit_reverse_indices(n: int) -> jnp.ndarray:
    bits = n.bit_length() - 1
    rev = [int(format(i, f"0{bits}b")[::-1], 2) if bits else 0
           for i in range(n)]
    return jnp.array(rev, dtype=jnp.int32)


class NttContext:
    """Twiddle tables and butterfly plan for one (modulus, n, root)."""

    _CACHE: dict = {}

    def __new__(cls, backend: FieldBackend, n: int, root: int):
        key = (backend.modulus, n, root)
        if key in cls._CACHE:
            return cls._CACHE[key]
        self = super().__new__(cls)
        self._init(backend, n, root)
        cls._CACHE[key] = self
        return self

    def _init(self, backend: FieldBackend, n: int, root: int) -> None:
        assert n & (n - 1) == 0, "NTT size must be a power of 2"
        assert pow(root, n, backend.modulus) == 1
        if n > 1:
            assert pow(root, n // 2, backend.modulus) != 1, \
                "root must have order exactly n"
        self.backend = backend
        self.n = n
        self.root = root
        p = backend.modulus

        self.bitrev = _bit_reverse_indices(n)
        self.tw_fwd = self._build_powers(root, max(n // 2, 1))
        self.tw_inv = self._build_powers(pow(root, -1, p) if n > 1 else 1,
                                         max(n // 2, 1))
        self.n_inv = backend.scalar(pow(n, -1, p))

    def _build_powers(self, w: int, count: int) -> jax.Array:
        """[w^0 .. w^(count-1)] (L, count) Montgomery, by doubling concat."""
        be = self.backend
        table = be.one_mont  # (L, 1)
        length = 1
        while length < count:
            w_pow = be.scalar(pow(w, length, be.modulus))
            table = jnp.concatenate([table, be.mul(table, w_pow)], axis=1)
            length *= 2
        return table[:, :count]

    # ------------------------------------------------------------------
    def _transform(self, values: jax.Array, table: jax.Array) -> jax.Array:
        """DIT butterflies after bit-reversal, along the LAST axis; values
        (L, ..., n) -> (L, ..., n) (middle axes are batch dims — used by the
        four-step distributed NTT for row/column transforms)."""
        be = self.backend
        n = self.n
        if n == 1:
            return values
        lead = values.shape[:-1]
        x = values[..., self.bitrev]
        span = 1
        while span < n:
            stride = n // (2 * span)
            tw = table[:, 0:span * stride:stride]       # (L, span)
            tw = tw.reshape((tw.shape[0],) + (1,) * len(lead[1:]) + (1, span))
            x = x.reshape(lead + (n // (2 * span), 2, span))
            a = x[..., 0, :]
            b = be.mul(x[..., 1, :], tw)
            x = jnp.stack([be.add(a, b), be.sub(a, b)], axis=-2)
            span *= 2
        return x.reshape(lead + (n,))

    def _bitrev_2d(self, values: jax.Array) -> jax.Array:
        """Bit-reversal permutation via two small static gathers + one
        transpose: for i = a*2^h2 + b, rev(i) = rev_h1(a)*2^h2 + rev_h2(b),
        so permuting each half-index and swapping axes realizes the full
        permutation without an n-wide gather."""
        n = self.n
        bits = n.bit_length() - 1
        h1 = bits // 2
        h2 = bits - h1
        A, B = 1 << h1, 1 << h2
        revA = _bit_reverse_indices(A)
        revB = _bit_reverse_indices(B)
        L = values.shape[0]
        x2d = values.reshape(L, A, B)
        permuted = x2d[:, revA][:, :, revB]
        return permuted.transpose(0, 2, 1).reshape(L, n)

    def _stage_twiddles(self, table: jax.Array) -> jax.Array:
        """(stages, L, n) per-stage full-width twiddle rows:
        row t[i] = w^((i mod span) * n/(2 span)) with span = 2^t —
        trades HBM (stages * n elements) for a gather-free stage body."""
        n = self.n
        L = table.shape[0]
        stages = n.bit_length() - 1
        rows = []
        for t in range(stages):
            span = 1 << t
            stride = n // (2 * span)
            base = table[:, 0:span * stride:stride]        # (L, span)
            rows.append(jnp.tile(base, (1, n // span)))
        return jnp.stack(rows, axis=0)

    def _transform_scan(self, values: jax.Array, stage_tws: jax.Array
                        ) -> jax.Array:
        """Gather-free compile-light transform: lax.scan over stages whose
        body uses two dynamic rolls (fast lane permutations on TPU) and the
        precomputed per-stage twiddle rows.  The butterfly combine runs as
        a fused Pallas VMEM kernel when enabled (KZG_TPU_PALLAS, default on
        for non-CPU backends).  (L, n) operands only."""
        be = self.backend
        n = self.n
        if n == 1:
            return values
        x = self._bitrev_2d(values)
        idx = jnp.arange(n, dtype=jnp.int32)
        stages = n.bit_length() - 1
        spans = jnp.array([1 << t for t in range(stages)], dtype=jnp.int32)
        use_pallas = _pallas_enabled()
        if use_pallas:
            from .pallas_fr import fused_butterfly

        def stage(x, inp):
            span, tw = inp
            upper = (idx & span) != 0
            xl = jnp.where(upper[None], jnp.roll(x, span, axis=1), x)
            xu = jnp.where(upper[None], x, jnp.roll(x, -span, axis=1))
            if use_pallas:
                mask = upper[None].astype(jnp.uint32)
                out = fused_butterfly(be, xl, xu, tw, mask)
            else:
                prod = be.mul(xu, tw)
                out = jnp.where(upper[None], be.sub(xl, prod),
                                be.add(xl, prod))
            return out, None

        x, _ = jax.lax.scan(stage, x, (spans, stage_tws))
        return x

    def _get_stage_tws(self, forward: bool) -> jax.Array:
        attr = "_stage_tw_fwd" if forward else "_stage_tw_inv"
        if not hasattr(self, attr):
            setattr(self, attr, self._stage_twiddles(
                self.tw_fwd if forward else self.tw_inv))
        return getattr(self, attr)

    def _transform_light(self, values: jax.Array, table: jax.Array
                         ) -> jax.Array:
        """Compile-light variant: one fori_loop whose body does a full
        butterfly stage with dynamic gathers (x[l], x[l|span], twiddle
        lookup).  ~100x smaller compiled graph than the unrolled form at
        large n (log2(n) iterations of one shared body); runtime trades
        slice/reshape data movement for three gathers per stage.  Only for
        (L, n) operands."""
        be = self.backend
        n = self.n
        if n == 1:
            return values
        x = values[:, self.bitrev]
        idx = jnp.arange(n, dtype=jnp.int32)
        stages = n.bit_length() - 1

        def stage(t, x):
            span = jnp.int32(1) << t
            upper = (idx & span) != 0
            lo_idx = idx & ~span
            hi_idx = idx | span
            stride = jnp.int32(n) >> (t + 1)          # n // (2*span)
            tw_idx = (idx & (span - 1)) * stride
            xl = x[:, lo_idx]
            xu = x[:, hi_idx]
            twf = table[:, tw_idx]
            prod = be.mul(xu, twf)
            return jnp.where(upper[None], be.sub(xl, prod), be.add(xl, prod))

        return jax.lax.fori_loop(0, stages, stage, x)

    def _transform_staged(self, values: jax.Array, forward: bool
                          ) -> jax.Array:
        """Stage-unrolled Pallas path: one kernel per stage with in-kernel
        pairing (no XLA roll/select passes); see ops/ntt_stage.py."""
        from .ntt_stage import StagedNtt
        from . import pallas_fr

        if not hasattr(self, "_staged"):
            self._staged = StagedNtt(self.backend.modulus, self.n)
        table = self.tw_fwd if forward else self.tw_inv
        x = self._bitrev_2d(values)
        return self._staged.transform(x, table,
                                      interpret=pallas_fr._INTERPRET)

    def ntt(self, coeffs: jax.Array, light: bool | None = None) -> jax.Array:
        """Evaluate: out[:, i] = p(w^i).  coeffs (L, n) Montgomery form."""
        mode = self._mode(light, coeffs)
        if mode == "staged":
            return self._transform_staged(coeffs, True)
        if mode == "scan":
            return self._transform_scan(coeffs, self._get_stage_tws(True))
        if mode == "gather":
            return self._transform_light(coeffs, self.tw_fwd)
        return self._transform(coeffs, self.tw_fwd)

    def intt(self, evals: jax.Array, light: bool | None = None) -> jax.Array:
        """Interpolate: inverse transform scaled by n^-1."""
        mode = self._mode(light, evals)
        if mode == "staged":
            out = self._transform_staged(evals, False)
        elif mode == "scan":
            out = self._transform_scan(evals, self._get_stage_tws(False))
        elif mode == "gather":
            out = self._transform_light(evals, self.tw_inv)
        else:
            out = self._transform(evals, self.tw_inv)
        return self._scale_n_inv(out)

    def _scale_n_inv(self, out: jax.Array) -> jax.Array:
        """Final n^-1 scale.  At full width this is the ONLY XLA-level
        be.mul in the transform (every butterfly mul runs inside Pallas
        kernels), and the XLA schoolbook's (L, L, n) intermediates make it
        ~175 ms at n = 2^20 — 8x the whole staged transform (measured r5).
        Route it through the fused VMEM mul kernel when the shape tiles."""
        if out.ndim == 2 and _pallas_enabled():
            from .pallas_fr import fused_mul
            n_inv_full = jnp.broadcast_to(self.n_inv, out.shape)
            return fused_mul(self.backend, out, n_inv_full)
        return self.backend.mul(out, self.n_inv)

    def _mode(self, light: bool | None, values: jax.Array) -> str:
        """'staged' (per-stage Pallas kernels with in-kernel pairing: the
        fast path at scale), 'unrolled' (per-stage XLA graphs: fastest
        small-n, pathological compile at scale), 'scan' (roll-based shared
        body: compile-light, gather-free), or 'gather' (legacy shared
        body).  (L, n) operands only for the shared-body/staged forms."""
        if values.ndim != 2:
            return "unrolled"
        if light is True:
            return "gather"
        if light is False:
            return "unrolled"
        import os
        mode = os.environ.get("KZG_TPU_NTT_MODE", "auto")
        if mode in ("staged", "scan", "gather", "unrolled"):
            return mode
        if self.n >= (1 << 11):
            from . import pallas_fr
            if self._staged_ok() and (pallas_fr.pallas_enabled()):
                return "staged"
            return "scan"
        return "unrolled"

    def _staged_ok(self) -> bool:
        return self.n % (128 * 16) == 0

    # ------------------------------------------------------------------
    def powers(self, c: int) -> jax.Array:
        """[1, c, ..., c^(n-1)] (L, n) Montgomery (coset shifts, xi/r
        power combinations)."""
        return self._build_powers(c % self.backend.modulus, self.n)

    def _ewise_mul(self, a: jax.Array, b: jax.Array) -> jax.Array:
        """Full-width elementwise modmul via the fused VMEM kernel when
        the shape tiles (see _scale_n_inv for why the XLA path is slow)."""
        if a.ndim == 2 and a.shape == b.shape and _pallas_enabled():
            from .pallas_fr import fused_mul
            return fused_mul(self.backend, a, b)
        return self.backend.mul(a, b)

    def coset_ntt(self, coeffs: jax.Array, shift: int) -> jax.Array:
        """Evaluate on the coset shift*H: NTT of coeffs[i] * shift^i."""
        return self.ntt(self._ewise_mul(coeffs, self.powers(shift)))

    def coset_intt(self, evals: jax.Array, shift: int) -> jax.Array:
        coeffs = self.intt(evals)
        inv_shift = pow(shift, -1, self.backend.modulus)
        return self._ewise_mul(coeffs, self.powers(inv_shift))


@functools.lru_cache(maxsize=None)
def ntt_context(curve_type: str, n: int) -> NttContext:
    """Context over the curve's scalar field with the framework's
    deterministic domain generator."""
    from .fr import fr_backend
    from .host.field import scalar_field
    be = fr_backend(curve_type)
    root = int(scalar_field(curve_type).nth_root_of_unity(n)) if n > 1 else 1
    return NttContext(be, n, root)
