"""Device polynomial toolkit over the scalar field.

Shared building blocks for the device protocol pipelines (PLONK and Marlin
device provers): NTT-based multiplication, vanishing-polynomial division in
coefficient blocks, point evaluation, the (X - z) opening division, and a
modular segment-sum for index-grouped accumulations (Marlin's t(X)).

All polynomials are limb-major Montgomery coefficient arrays (L, m) as in
``ops.fr``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .fr import FieldBackend, fr_backend, LIMB_BITS
from .ntt import ntt_context


class PolyDev:
    """Per-curve device polynomial operations (stateless; NTT contexts are
    cached per size)."""

    _CACHE: dict = {}

    def __new__(cls, curve_type: str):
        if curve_type in cls._CACHE:
            return cls._CACHE[curve_type]
        self = super().__new__(cls)
        self.curve_type = curve_type
        self.be = fr_backend(curve_type)
        from .host.field import scalar_field
        self.shift = scalar_field(curve_type).generator
        cls._CACHE[curve_type] = self
        return self

    # ------------------------------------------------------------------
    def pad(self, coeffs: jax.Array, m: int) -> jax.Array:
        L, cur = coeffs.shape
        if cur >= m:
            return coeffs[:, :m]
        return jnp.concatenate(
            [coeffs, jnp.zeros((L, m - cur), jnp.uint32)], axis=1)

    def mul(self, a: jax.Array, b: jax.Array, out_len: int | None = None
            ) -> jax.Array:
        """Polynomial product via NTT on the next power-of-two domain."""
        la, lb = a.shape[1], b.shape[1]
        need = la + lb - 1
        n = 1
        while n < need:
            n *= 2
        ctx = ntt_context(self.curve_type, n)
        ea = ctx.ntt(self.pad(a, n))
        eb = ctx.ntt(self.pad(b, n))
        prod = ctx.intt(self.be.mul(ea, eb))
        return prod[:, :out_len if out_len is not None else need]

    def mul_many_evals(self, factors: list, n: int, shift: int | None = None):
        """Evaluate each factor on a size-n (coset) domain and return the
        pointwise product of the evaluations (one iNTT away from the
        product polynomial)."""
        ctx = ntt_context(self.curve_type, n)
        s = self.shift if shift is None else shift
        acc = None
        for f in factors:
            ev = ctx.coset_ntt(self.pad(f, n), s)
            acc = ev if acc is None else self.be.mul(acc, ev)
        return acc

    def from_coset_evals(self, evals: jax.Array, shift: int | None = None,
                         out_len: int | None = None) -> jax.Array:
        n = evals.shape[1]
        ctx = ntt_context(self.curve_type, n)
        s = self.shift if shift is None else shift
        coeffs = ctx.coset_intt(evals, s)
        return coeffs[:, :out_len] if out_len else coeffs

    # ------------------------------------------------------------------
    def divide_by_vanishing(self, p: jax.Array, n: int):
        """(quotient, remainder) of p by X^n - 1, exactly:
        working top-down in n-wide blocks, h_{i-n} = p_i + h_i.

        p (L, m); returns h (L, max(m-n, 0)) and r (L, n).
        """
        be = self.be
        L, m = p.shape
        if m <= n:
            return jnp.zeros((L, 0), jnp.uint32), self.pad(p, n)
        num_blocks = -(-(m - n) // n)
        p = self.pad(p, n * (num_blocks + 1))
        h_top = jnp.zeros((L, n), jnp.uint32)
        blocks = []
        carry = h_top
        for b in range(num_blocks, 0, -1):
            blk = p[:, b * n:(b + 1) * n]
            carry = be.add(blk, carry) if b < num_blocks else blk
            blocks.append(carry)
        h = jnp.concatenate(list(reversed(blocks)), axis=1)[:, :m - n]
        r = be.add(p[:, :n], self.pad(h, n))
        return h, r

    # ------------------------------------------------------------------
    def eval_at(self, coeffs: jax.Array, point: int) -> jax.Array:
        be = self.be
        pows = be.powers_of(point, coeffs.shape[1])
        return be.sum_reduce(be.mul(coeffs, pows))

    def eval_int(self, coeffs: jax.Array, point: int) -> int:
        return self.be.to_ints(self.eval_at(coeffs, point))[0]

    def open_div(self, coeffs: jax.Array, point: int) -> jax.Array:
        """(p - p(z)) / (X - z) via the suffix-scan identity."""
        be = self.be
        m = coeffs.shape[1]
        z = point % be.modulus
        u = be.mul(coeffs, be.powers_of(z, m))
        suffix = be.suffix_sums_exclusive(u)
        z_inv = pow(z, -1, be.modulus)
        inv_pows = be.mul(be.powers_of(z_inv, m), be.scalar(z_inv))
        return be.mul(suffix, inv_pows)[:, :m - 1]

    # ------------------------------------------------------------------
    def segment_sum_mod(self, values: jax.Array, seg_ids: jax.Array,
                        num_segments: int) -> jax.Array:
        """Field-element segment sum: values (L, m) Montgomery grouped by
        seg_ids (m,) -> (L, num_segments).

        Because Montgomery addition is plain modular addition, raw 16-bit
        limbs can be accumulated with integer segment_sum in chunks of
        <= 2^12 values (column sums < 2^28, no uint32 overflow), each chunk
        then modular-carried and combined with field adds.
        """
        be = self.be
        L, m = values.shape
        chunk = 1 << 12
        result = None
        for start in range(0, m, chunk):
            end = min(start + chunk, m)
            part = jax.ops.segment_sum(
                values[:, start:end].T, seg_ids[start:end],
                num_segments=num_segments)          # (num_segments, L)
            part = part.T                            # (L, num_segments)
            # Raw column sums < 2^28: carry once, then reduce mod p by
            # folding the (at most 12-bit) overflow beyond limb L-1...
            # Simpler exact route: split into limbs' lo/hi and reduce via
            # repeated conditional subtraction is wrong for large sums, so
            # normalize through the Montgomery machinery: treat the raw sum
            # as a (2L) wide value with top limbs zero after carrying.
            part = self._reduce_raw(part)
            result = part if result is None else be.add(result, part)
        return result

    def _reduce_raw(self, raw: jax.Array) -> jax.Array:
        """Carry a raw limb accumulation (values < 2^28 per column, value
        < 2^12 * p overall) and reduce below p."""
        be = self.be
        L = be.num_limbs
        carried = be._carry(jnp.concatenate(
            [raw, jnp.zeros((1,) + raw.shape[1:], jnp.uint32)], axis=0))
        # carried has L+1 limbs; value < 2^12 p < 2^16 p. Montgomery-reduce
        # by multiplying with R^2/R... cheapest exact: widen to 2L and run
        # REDC with a correction factor R (value * R^{-1}), then multiply
        # by R^2 -> back to Montgomery of the same value... Avoid the
        # gymnastics: subtract p conditionally up to 16 times is bounded
        # but value/p can be ~2^12.  Use REDC route:
        widened = jnp.concatenate(
            [carried, jnp.zeros((2 * L - (L + 1),) + raw.shape[1:],
                                jnp.uint32)], axis=0)
        reduced = be._mont_reduce(widened)     # value * R^{-1} mod p
        return be.mul(reduced, be.r2_limbs)    # * R^2 * R^{-1} = value * R...
