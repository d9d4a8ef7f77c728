"""Register-limb field arithmetic for Pallas kernel bodies.

The production modmul kernel built on ``FieldBackend``'s (L, N) limb-matrix
ops reaches only ~4-7% of the VPU's measured 2.7 Tops/s u32-multiply rate:
the limb-axis shifts (pad/reshape/concat) and Kogge-Stone carry plumbing
lower to Mosaic *relayouts* — VMEM copies — that swamp the arithmetic.

This module represents one batch of field elements as a **python list of L
uint32 arrays**, each a natively-tileable 2D block (e.g. (8k, 128)): the
batch occupies both minor axes, every op is an exact native vector op, and
*limb shifts become list indexing* — free at trace time.  All loops are
unrolled statically; there are no reshapes, pads, or concats anywhere.

The same functions run unchanged outside kernels (they're plain jnp ops),
which is how the CPU test oracle exercises them; inside a ``pallas_call``
they lower to straight-line Mosaic vector code.  Modulus constants are
python ints baked in as scalar immediates — no captured-constant hazards.

Cost model per Montgomery multiply (L=16 limbs of 16 bits): ~256 + 136 +
256 u32 multiplies for wide/low/p products plus splits, accumulates and
ripple carries — ~3100 vector ops, a ~700M modmuls/s ceiling at the
measured VPU rates (vs 68M for the relayout-bound kernel).

Values are canonical (< p) on entry and exit of every public op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1


def _int_limbs(x: int, count: int) -> list[int]:
    return [(x >> (LIMB_BITS * i)) & MASK for i in range(count)]


def _tree_sum(xs: list):
    """Balanced pairwise sum: log-depth dependency chains expose ILP to
    the Mosaic scheduler (a running-accumulator loop serializes one ~5-cycle
    instruction latency per term — measured ~10x off peak)."""
    n = len(xs)
    if n == 1:
        return xs[0]
    while len(xs) > 1:
        nxt = [xs[i] + xs[i + 1] for i in range(0, len(xs) - 1, 2)]
        if len(xs) % 2:
            nxt.append(xs[-1])
        xs = nxt
    return xs[0]


class RegField:
    """Field ops over lists of per-limb uint32 arrays (one modulus)."""

    _CACHE: dict = {}

    def __new__(cls, modulus: int):
        if modulus in cls._CACHE:
            return cls._CACHE[modulus]
        self = super().__new__(cls)
        self._init(modulus)
        cls._CACHE[modulus] = self
        return self

    def _init(self, modulus: int) -> None:
        self.modulus = modulus
        self.L = -(-modulus.bit_length() // LIMB_BITS)
        L = self.L
        self.R = 1 << (LIMB_BITS * L)
        self.R_mod_p = self.R % modulus
        self.p_limbs = _int_limbs(modulus, L)
        self.one_limbs = _int_limbs(self.R_mod_p, L)
        n_prime = (-pow(modulus, -1, self.R)) % self.R
        self.np_limbs = _int_limbs(n_prime, L)

    # -- constructors ---------------------------------------------------
    def const(self, value_mont_limbs: list[int], like: jax.Array) -> list:
        """Limb-int list -> register list broadcast to ``like``'s shape."""
        return [jnp.full_like(like, v) for v in value_mont_limbs]

    def zero(self, like: jax.Array) -> list:
        return [jnp.zeros_like(like) for _ in range(self.L)]

    def one(self, like: jax.Array) -> list:
        return self.const(self.one_limbs, like)

    # -- raw helpers ----------------------------------------------------
    def _resolve(self, cols: list):
        """Parallel carry resolution: cols values < 2^31 -> (canonical
        16-bit limbs, carry_out in {0,1}).  Local split + one deferred-carry
        add + Kogge-Stone lookahead over *register indices* (the shifts are
        list indexing — free), so the dependency depth is ~log2(L) instead
        of a length-L ripple.  Callers guarantee the true carry past the
        top limb is < 2 (canonical-operand sums / products)."""
        n = len(cols)
        d = [v & MASK for v in cols]
        c = [v >> LIMB_BITS for v in cols]          # < 2^15
        t = [d[0]] + [d[i] + c[i - 1] for i in range(1, n)]
        g = [v >> LIMB_BITS for v in t]             # {0, 1}
        p = [((v & MASK) == MASK).astype(jnp.uint32) for v in t]
        shift = 1
        while shift < n:
            g = g[:shift] + [g[i] | (p[i] & g[i - shift])
                             for i in range(shift, n)]
            p = p[:shift] + [p[i] & p[i - shift] for i in range(shift, n)]
            shift *= 2
        out = [t[0] & MASK] + [(t[i] + g[i - 1]) & MASK for i in range(1, n)]
        # carry out of the top limb: top deferred carry c[n-1] is folded
        # into t only for i < n; callers with exact-width results rely on
        # g[n-1] (plus c[n-1] which must be zero for them).
        return out, g[n - 1] + c[n - 1]

    def _ripple(self, cols: list, carry_in_zero: bool = True) -> list:
        """Carry propagation: cols values < 2^31 -> canonical 16-bit limbs
        (the final carry must vanish by construction of the callers)."""
        return self._resolve(cols)[0]

    def _sub_raw(self, a: list, b: list):
        """a - b mod 2^(16L) via complement add; returns (limbs, borrow)
        with borrow an array in {0, 1}."""
        s = [a[i] + (MASK - b[i]) + (1 if i == 0 else 0)
             for i in range(self.L)]
        out, carry = self._resolve(s)
        return out, 1 - carry

    def _sub_const_raw(self, a: list, k: list[int]):
        s = [a[i] + ((MASK - k[i]) + (1 if i == 0 else 0))
             for i in range(self.L)]
        out, carry = self._resolve(s)
        return out, 1 - carry

    def _cond_sub_p(self, a: list) -> list:
        diff, borrow = self._sub_const_raw(a, self.p_limbs)
        keep = borrow.astype(jnp.bool_)
        return [jnp.where(keep, a[i], diff[i]) for i in range(self.L)]

    # -- ring ops -------------------------------------------------------
    def add(self, a: list, b: list) -> list:
        s = self._ripple([a[i] + b[i] for i in range(self.L)])
        return self._cond_sub_p(s)

    def sub(self, a: list, b: list) -> list:
        d, borrow = self._sub_raw(a, b)
        # borrow == 1: add p back (cannot overflow: d + p < 2^(16L))
        corr = self._ripple([d[i] + self.p_limbs[i] for i in range(self.L)])
        neg = borrow.astype(jnp.bool_)
        return [jnp.where(neg, corr[i], d[i]) for i in range(self.L)]

    def double(self, a: list) -> list:
        return self.add(a, a)

    def _accum_product(self, a: list, b: list, out_limbs: int,
                       b_const: list[int] | None = None):
        """Uncarried column sums of a*b (or a*b_const): returns ``cols``
        of length out_limbs with values < 2^22.

        Column-major accumulation: only the current column's lo-sum and the
        next column's hi-sum are live at any point (plus the operands), so
        the register footprint stays small enough to avoid VMEM spills in
        fused kernels."""
        L = self.L
        cols = []
        hi_pending = None          # hi parts destined for column k
        for k in range(out_limbs):
            lo_terms = [] if hi_pending is None else [hi_pending]
            hi_terms = []
            for i in range(max(0, k - L + 1), min(L, k + 1)):
                j = k - i
                if b_const is not None:
                    bj = b_const[j]
                    if bj == 0:
                        continue
                    p = a[i] * jnp.uint32(bj)
                else:
                    p = a[i] * b[j]
                lo_terms.append(p & MASK)
                hi_terms.append(p >> LIMB_BITS)
            cols.append(_tree_sum(lo_terms) if lo_terms
                        else jnp.zeros_like(a[0]))
            hi_pending = _tree_sum(hi_terms) if hi_terms else None
        return cols

    def mul(self, a: list, b: list | None = None,
            b_const: list[int] | None = None) -> list:
        """Montgomery product a*b*R^-1 mod p (b or the constant limbs)."""
        L = self.L
        # wide product, carried -> 2L canonical limbs
        t = self._ripple(self._accum_product(a, b, 2 * L, b_const))
        return self._redc(t)

    def square(self, a: list) -> list:
        """Montgomery square: symmetric-product saving (~half the
        off-diagonal multiplies), column-major accumulation (see
        _accum_product for the register-pressure rationale).  Cross terms
        are split before doubling so column sums stay < 2^22."""
        L = self.L
        cols = []
        hi_pending = None
        for k in range(2 * L):
            lo_terms = [] if hi_pending is None else [hi_pending]
            hi_terms = []
            for i in range(max(0, k - L + 1), min(L, k + 1)):
                j = k - i
                if i > j:
                    continue
                p = a[i] * a[j]
                lo_p = p & MASK
                hi_p = p >> LIMB_BITS
                if i != j:
                    lo_p = lo_p * jnp.uint32(2)
                    hi_p = hi_p * jnp.uint32(2)
                lo_terms.append(lo_p)
                hi_terms.append(hi_p)
            cols.append(_tree_sum(lo_terms) if lo_terms
                        else jnp.zeros_like(a[0]))
            hi_pending = _tree_sum(hi_terms) if hi_terms else None
        t = self._ripple(cols)
        return self._redc(t)

    def _redc(self, t: list) -> list:
        """Montgomery reduction of carried 2L-limb t (< pR) -> tR^-1 mod p."""
        L = self.L
        # m = (t mod R) * n' mod R
        m = self._ripple(self._accum_product(t[:L], None, L,
                                             b_const=self.np_limbs))
        # u = t + m*p: one parallel resolve over all 2L columns; the low L
        # limbs vanish by construction of m, and u/R < 2p < 2^(16L) means
        # no carry escapes the top limb.
        mp_cols = self._accum_product(m, None, 2 * L, b_const=self.p_limbs)
        u = [mp_cols[i] + t[i] for i in range(2 * L)]
        u_limbs = self._ripple(u)
        return self._cond_sub_p(u_limbs[L:])

    # -- predicates / select -------------------------------------------
    def is_zero(self, a: list) -> jax.Array:
        acc = a[0]
        for i in range(1, self.L):
            acc = acc | a[i]
        return acc == 0

    def eq(self, a: list, b: list) -> jax.Array:
        acc = a[0] ^ b[0]
        for i in range(1, self.L):
            acc = acc | (a[i] ^ b[i])
        return acc == 0

    def select(self, cond: jax.Array, a: list, b: list) -> list:
        """where(cond, a, b) elementwise over the batch block."""
        return [jnp.where(cond, a[i], b[i]) for i in range(self.L)]

    def neg(self, a: list) -> list:
        """p - a for canonical a; -0 = 0."""
        carry = None
        out = []
        for i in range(self.L):
            # p + (~a + 1): complement-add, no net borrow since a <= p
            s = self.p_limbs[i] + (MASK - a[i]) + (1 if i == 0 else 0) \
                if carry is None else \
                self.p_limbs[i] + (MASK - a[i]) + carry
            out.append(s & MASK)
            carry = s >> LIMB_BITS
        z = self.is_zero(a)
        return [jnp.where(z, a[i], out[i]) for i in range(self.L)]

    # -- io -------------------------------------------------------------
    def from_ref(self, ref, idx=None) -> list:
        """Split a (L, ...) block ref/array into a register list."""
        if idx is None:
            return [ref[i] for i in range(self.L)]
        return [ref[(idx, i)] for i in range(self.L)]

    def to_stack(self, regs: list) -> jax.Array:
        return jnp.stack(regs, axis=0)


@functools.lru_cache(maxsize=None)
def reg_field(modulus: int) -> RegField:
    return RegField(modulus)
