"""Batched prime-field arithmetic on TPU: fixed-limb Montgomery kernels.

This is the L0 of the TPU-native stack (SURVEY.md §7 layer 1): the role
SageMath's C backends play for the reference's field arithmetic
(``/root/reference/kzg.py:52``), re-designed for TPU vector units.

Representation — limb-major
---------------------------
A batch of field elements is ``num_limbs`` little-endian 16-bit limbs held
in uint32 lanes, with the **limb axis first**: shape ``(L, ...)`` where
``L = ceil(bits/16)`` (16 for the 254/255-bit BN254 fields, 24 for
BLS12-381's Fq).  Why limb-major: the TPU vector unit tiles the two minor
axes as (8 sublanes x 128 lanes); with batch on the minor axis a batch of
elements is a dense (L, N) tile — full lane utilization — whereas (N, L)
would waste 7/8 of each lane row.  Why 16-bit limbs:

* a single limb product fits uint32 exactly ((2^16-1)^2 < 2^32), so the
  VPU's 32-bit integer multiply is exact;
* schoolbook column sums, accumulated as split hi/lo 16-bit halves, stay
  below 2^21 — far from uint32 overflow — so carries propagate once per
  multiply, not per partial product.

Values are kept in Montgomery form (R = 2^(16 L)) so a modular multiply is
one schoolbook product + one Montgomery (REDC) reduction, built from
shift-align-sum patterns only (no scatters — cheap to compile, VPU-only to
run).  All ops are jittable and shape-polymorphic over the trailing batch
dims.

``to_ints``/``from_ints`` bridge to the exact host layer
(``ops.host.field``), which doubles as the oracle in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def _int_to_limbs(x: int, num_limbs: int) -> list[int]:
    return [(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(num_limbs)]


def _limbs_to_int(limbs) -> int:
    acc = 0
    for i, limb in enumerate(limbs):
        acc |= int(limb) << (LIMB_BITS * i)
    return acc


def ints_to_limb_array(values, num_limbs: int) -> np.ndarray:
    """Canonical ints -> (num_limbs, N) uint32 limb matrix, via a single
    bytes buffer (fast path for large scalar vectors)."""
    nbytes = num_limbs * 2
    buf = b"".join(int(v).to_bytes(nbytes, "little") for v in values)
    mat = np.frombuffer(buf, dtype="<u2").reshape(len(values), num_limbs)
    return mat.astype(np.uint32).T.copy()


class FieldBackend:
    """Montgomery-limb arithmetic for one prime modulus.

    All public methods take/return uint32 arrays of shape (L, ...) holding
    Montgomery-form elements unless stated otherwise.  Scalars have shape
    (L, 1) so they broadcast against (L, N) batches.
    """

    _CACHE: dict[int, "FieldBackend"] = {}

    def __new__(cls, modulus: int):
        if modulus in cls._CACHE:
            return cls._CACHE[modulus]
        self = super().__new__(cls)
        self._init(modulus)
        cls._CACHE[modulus] = self
        return self

    def _init(self, modulus: int) -> None:
        self.modulus = modulus
        bits = modulus.bit_length()
        self.num_limbs = -(-bits // LIMB_BITS)
        L = self.num_limbs
        self.R = 1 << (LIMB_BITS * L)
        self.R_mod_p = self.R % modulus
        self.R2_mod_p = (self.R * self.R) % modulus
        self.n_prime = (-pow(modulus, -1, self.R)) % self.R

        as_col = lambda v: jnp.array(_int_to_limbs(v, L), dtype=jnp.uint32)[:, None]
        self.p_limbs = as_col(modulus)            # (L, 1)
        self.n_prime_limbs = as_col(self.n_prime)
        self.r2_limbs = as_col(self.R2_mod_p)
        self.one_mont = as_col(self.R_mod_p)
        self.zero_limbs = jnp.zeros((L, 1), dtype=jnp.uint32)

    # ------------------------------------------------------------------
    # Host <-> device conversion (canonical ints at the boundary).
    # ------------------------------------------------------------------
    def from_ints(self, values) -> jax.Array:
        """Python ints -> Montgomery limb array (L, N).

        Bulk path: canonical reduction on host (cheap bigint mod), limb
        split via one bytes buffer, Montgomery conversion (* R^2, REDC) on
        device — ~100x faster than per-value Python limb loops for the
        n = 2^16+ witness/selector arrays the provers feed in.
        """
        p = self.modulus
        canon = [int(v) % p for v in values]
        raw = jnp.asarray(ints_to_limb_array(canon, self.num_limbs))
        return self.to_mont(raw)

    def to_ints(self, arr) -> list[int]:
        """Montgomery limb array (L, ...) -> flat list of canonical ints."""
        mat = np.asarray(jax.device_get(arr))
        flat = mat.reshape(self.num_limbs, -1)
        r_inv = pow(self.R, -1, self.modulus)
        return [(_limbs_to_int(flat[:, j]) * r_inv) % self.modulus
                for j in range(flat.shape[1])]

    def scalar(self, value: int) -> jax.Array:
        """One element in Montgomery form, shape (L, 1)."""
        return self.from_ints([value])

    # ------------------------------------------------------------------
    # Limb plumbing.  All raw helpers treat axis 0 as the limb axis.
    # Carry propagation is Kogge-Stone (parallel-prefix carry-lookahead):
    # log2(limbs) combine steps instead of a length-limbs sequential ripple
    # — both far fewer HLO ops and far shallower dependency chains on the
    # VPU.
    # ------------------------------------------------------------------
    @staticmethod
    def _shift_up(x: jax.Array, k: int) -> jax.Array:
        """Shift limbs toward higher indices by k (zero fill)."""
        if k == 0:
            return x
        z = jnp.zeros((k,) + x.shape[1:], dtype=x.dtype)
        return jnp.concatenate([z, x[:-k]], axis=0)

    @classmethod
    def _ks_resolve(cls, s: jax.Array):
        """Resolve binary carries of a digit vector with values < 2^17:
        returns (canonical limbs, carry_out_of_top_limb)."""
        n = s.shape[0]
        g = s >> LIMB_BITS                      # in {0, 1}
        p = ((s & LIMB_MASK) == LIMB_MASK).astype(jnp.uint32)
        shift = 1
        while shift < n:
            g_prev = cls._shift_up(g, shift)
            p_prev = cls._shift_up(p, shift)
            g = g | (p & g_prev)
            p = p & p_prev
            shift *= 2
        carry_in = cls._shift_up(g, 1)
        out = (s + carry_in) & LIMB_MASK
        # positive index: a literal -1 lowers to dynamic_slice, which the
        # Mosaic (Pallas TPU) backend cannot lower
        return out, g[n - 1]

    @classmethod
    def _carry(cls, acc: jax.Array) -> jax.Array:
        """Full carry propagation along axis 0 for digit values < 2^32
        (final carry out of the top limb must be zero by construction)."""
        lo = acc & LIMB_MASK
        c = acc >> LIMB_BITS
        s = lo + cls._shift_up(c, 1)            # < 2^17
        return cls._ks_resolve(s)[0]

    @staticmethod
    def _align_batch(a: jax.Array, b: jax.Array):
        """Broadcast two limb-first arrays to a common batch shape while
        keeping the limb axis at position 0 (trailing-dim numpy broadcasting
        would misplace it when batch ranks differ)."""
        batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])

        def ali(x):
            x = x.reshape((x.shape[0],) + (1,) * (len(batch) - (x.ndim - 1))
                          + x.shape[1:])
            return jnp.broadcast_to(x, (x.shape[0],) + batch)

        return ali(a), ali(b)

    def _add_raw(self, a: jax.Array, b: jax.Array):
        a, b = self._align_batch(a, b)
        s = a + b                                # < 2^17
        out, carry = self._ks_resolve(s)
        return out, carry

    def _sub_raw(self, a: jax.Array, b: jax.Array):
        """(a - b) mod 2^(16L) plus borrow flag, via base-2^16 complement
        addition: a + (mask - b) + 1; borrow = 1 - carry_out."""
        a, b = self._align_batch(a, b)
        comp = LIMB_MASK - b                     # b canonical (limbs <= mask)
        s = a + comp
        first = s[0:1] + 1
        s = jnp.concatenate([first, s[1:]], axis=0)
        out, carry = self._ks_resolve(s)
        return out, (1 - carry).astype(jnp.uint32)

    def _cond_sub_p(self, a: jax.Array) -> jax.Array:
        """a - p if a >= p else a (caller guarantees a < 2p)."""
        diff, borrow = self._sub_raw(a, self.p_limbs)
        return jnp.where((borrow == 0)[None], diff, a)

    # ------------------------------------------------------------------
    # Modular ring ops.
    # ------------------------------------------------------------------
    def add(self, a: jax.Array, b: jax.Array) -> jax.Array:
        s, _ = self._add_raw(a, b)  # p < 2^(16L-1) => no top carry
        return self._cond_sub_p(s)

    def sub(self, a: jax.Array, b: jax.Array) -> jax.Array:
        d, borrow = self._sub_raw(a, b)
        corrected, _ = self._add_raw(d, self.p_limbs)
        return jnp.where((borrow == 1)[None], corrected, d)

    def neg(self, a: jax.Array) -> jax.Array:
        return self.sub(jnp.zeros_like(a), a)

    def double(self, a: jax.Array) -> jax.Array:
        return self.add(a, a)

    # -- schoolbook multiply, scatter-free ------------------------------
    def _school_cols(self, a: jax.Array, b: jax.Array, out_limbs: int):
        """Column sums of the product, limbs 0..out_limbs-1, NOT carried:
        cols[k] = sum_{i+j=k} lo(a_i b_j) + sum_{i+j=k-1} hi(a_i b_j).

        Anti-diagonal sums are computed with a *skew-reshape*: pad each
        partial-product row to width K+1 and reinterpret the flat buffer as
        rows of width K, which shifts row i right by exactly i — the whole
        schoolbook is ~17 HLO ops (one multiply, two pads, a few reshapes,
        two reductions) regardless of limb count.  Column values stay below
        2 L 2^16 <= 2^22, far from uint32 overflow.
        """
        L = self.num_limbs
        K = out_limbs
        batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])

        def align(x):
            # Keep the limb axis at position 0; broadcast batch dims
            # positionally (trailing-dim numpy broadcasting would otherwise
            # misplace the limb axis when operand batch ranks differ).
            x = x.reshape((x.shape[0],) + (1,) * (len(batch) - (x.ndim - 1))
                          + x.shape[1:])
            return jnp.broadcast_to(x, (x.shape[0],) + batch)

        a = align(a)
        b = align(b)
        prod = a[:, None] * b[None, :]            # (L, L, ...) exact uint32
        # Halves fit int32; sums below stay < 2^22.  int32 keeps the
        # reduction Mosaic-lowerable (no unsigned reductions on TPU Pallas).
        lo = (prod & LIMB_MASK).astype(jnp.int32)
        hi = (prod >> LIMB_BITS).astype(jnp.int32)

        pad_cfg = [(0, 0), (0, K + 1 - L)] + [(0, 0)] * len(batch)

        def skew(m, extra_shift):
            """rows[i] shifted right by i (+extra_shift), width K."""
            p = jnp.pad(m, pad_cfg)                # (L, K+1, ...)
            flat = p.reshape((L * (K + 1),) + batch)
            if extra_shift:
                z = jnp.zeros((extra_shift,) + batch, dtype=m.dtype)
                flat = jnp.concatenate([z, flat[:L * K - extra_shift]], axis=0)
            else:
                flat = flat[:L * K]
            return flat.reshape((L, K) + batch)

        lo_sk = skew(lo, 0)
        hi_sk = skew(hi, 1)
        if K < 2 * L:
            # Truncated (mod-R) product: wrapped rows alias real data where
            # j < i (lo) / j <= i (hi); mask them out.
            col = jnp.arange(K)[None, :]
            row = jnp.arange(L)[:, None]
            shape_mask = lambda m: m.reshape((L, K) + (1,) * len(batch))
            lo_sk = lo_sk * shape_mask((col >= row).astype(jnp.int32))
            hi_sk = hi_sk * shape_mask((col > row).astype(jnp.int32))
        total = jnp.sum(lo_sk, axis=0) + jnp.sum(hi_sk, axis=0)
        return total.astype(jnp.uint32)

    def _mul_wide(self, a: jax.Array, b: jax.Array) -> jax.Array:
        """Full product -> 2L fully-carried limbs (axis 0)."""
        return self._carry(self._school_cols(a, b, 2 * self.num_limbs))

    def _mul_low(self, a: jax.Array, b: jax.Array) -> jax.Array:
        """Low L limbs of the product (mod R)."""
        return self._carry(self._school_cols(a, b, self.num_limbs))

    def _mont_reduce(self, t: jax.Array) -> jax.Array:
        """REDC: t (2L carried limbs, t < pR) -> t R^{-1} mod p."""
        L = self.num_limbs
        m = self._mul_low(t[:L], self.n_prime_limbs)
        mp_cols = self._school_cols(m, self.p_limbs, 2 * L)
        u = self._carry(mp_cols + t)               # t + m p, divisible by R
        return self._cond_sub_p(u[L:])

    def mul(self, a: jax.Array, b: jax.Array) -> jax.Array:
        """Montgomery product: (a b R^{-1}) mod p."""
        return self._mont_reduce(self._mul_wide(a, b))

    def square(self, a: jax.Array) -> jax.Array:
        return self.mul(a, a)

    # ------------------------------------------------------------------
    def pow_const(self, a: jax.Array, exponent: int) -> jax.Array:
        """a^e for a *static* exponent via an LSB-first scan: the compiled
        graph is one small scan body regardless of exponent size."""
        if exponent < 0:
            raise ValueError("negative exponents: use inv() then pow_const")
        ones = jnp.broadcast_to(self.one_mont, a.shape)
        if exponent == 0:
            return ones
        nbits = exponent.bit_length()
        bits = jnp.array([(exponent >> i) & 1 for i in range(nbits)],
                         dtype=jnp.uint32)

        def step(carry, bit):
            result, base = carry
            taken = self.mul(result, base)
            result = jnp.where((bit == 1)[None], taken, result)
            base = self.square(base)
            return (result, base), None

        (result, _), _ = jax.lax.scan(step, (ones, a), bits)
        return result

    def inv(self, a: jax.Array) -> jax.Array:
        """Batched inversion by Fermat: a^(p-2).  inv(0) = 0."""
        return self.pow_const(a, self.modulus - 2)

    def batch_inv(self, a: jax.Array, lanes: int = 128) -> jax.Array:
        """Montgomery-trick batched inversion of a (L, N) array: one Fermat
        inversion + ~5 multiplies per element.  Zero entries map to zero.

        Blocked layout: the batch is split into ``lanes`` parallel chains;
        prefix/suffix products run as lax.scan over N/lanes steps (small
        compiled graph, VPU-wide steps), and only the ``lanes`` chain totals
        go through Fermat.
        """
        L, n = a.shape
        lanes = max(1, min(lanes, n))
        steps = -(-n // lanes)
        pad = steps * lanes - n

        is_zero = self.is_zero(a)
        safe = jnp.where(is_zero[None], jnp.broadcast_to(self.one_mont, a.shape), a)
        if pad:
            safe = jnp.concatenate(
                [safe, jnp.broadcast_to(self.one_mont, (L, pad))], axis=1)
        x = safe.reshape(L, steps, lanes).transpose(1, 0, 2)  # (steps, L, lanes)

        ones_lane = jnp.broadcast_to(self.one_mont, (L, lanes))

        def pre_step(carry, xt):
            return self.mul(carry, xt), carry  # exclusive prefix

        chain_total, pre_excl = jax.lax.scan(pre_step, ones_lane, x)

        def suf_step(carry, xt):
            return self.mul(carry, xt), carry  # exclusive suffix

        _, suf_excl = jax.lax.scan(suf_step, ones_lane, x, reverse=True)

        chain_inv = self.inv(chain_total)      # (L, lanes) Fermat, parallel
        # inv(x[t, lane]) = pre_excl[t] * suf_excl[t] * chain_inv[lane].
        # Scan outputs carry the step axis first; flatten back to limb-major
        # (L, steps*lanes) before multiplying.
        flat = lambda v: v.transpose(1, 0, 2).reshape(L, steps * lanes)
        chain_rep = jnp.broadcast_to(chain_inv[:, None, :], (L, steps, lanes)) \
            .reshape(L, steps * lanes)
        inv_x = self.mul(self.mul(flat(pre_excl), flat(suf_excl)), chain_rep)
        out = inv_x[:, :n]
        return jnp.where(is_zero[None], jnp.zeros_like(a), out)

    def exclusive_prefix_prod(self, a: jax.Array, lanes: int = 128) -> jax.Array:
        """out[j] = prod_{i<j} a[i] for a (L, N); out[0] = 1.

        Blocked two-level scan (the PLONK grand-product accumulator,
        plonk/prover.py:245-261, parallelized): lane-chains of N/lanes
        sequential steps, then an exclusive scan over the ~lanes chain
        totals.
        """
        L, n = a.shape
        lanes = max(1, min(lanes, n))
        steps = -(-n // lanes)
        pad = steps * lanes - n
        x = a
        if pad:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(self.one_mont, (L, pad))], axis=1)
        # chain c = contiguous block [c*steps, (c+1)*steps)
        x = x.reshape(L, lanes, steps)
        xs = jnp.moveaxis(x, 2, 0)                 # (steps, L, lanes)
        ones_lane = jnp.broadcast_to(self.one_mont, (L, lanes))

        def pre_step(carry, xt):
            return self.mul(carry, xt), carry      # exclusive within chain

        chain_tot, pre_excl = jax.lax.scan(pre_step, ones_lane, xs)

        def chain_step(carry, tot):
            # tot (L,): running exclusive product across chains
            return self.mul(carry, tot[:, None])[:, 0], carry

        chain_init = self.one_mont[:, 0]
        _, chain_excl = jax.lax.scan(chain_step, chain_init,
                                     jnp.moveaxis(chain_tot, 1, 0))
        chain_excl = jnp.moveaxis(chain_excl, 0, 1)    # (L, lanes)

        out = self.mul(jnp.moveaxis(pre_excl, 0, 2),   # (L, lanes, steps)
                       chain_excl[:, :, None])
        return out.reshape(L, steps * lanes)[:, :n]

    def sum_reduce(self, a: jax.Array) -> jax.Array:
        """Sum a (L, N) batch along the last axis -> (L, 1), via a padded
        halving tree of adds."""
        L, n = a.shape
        while n > 1:
            if n % 2:
                a = jnp.concatenate([a, jnp.zeros((L, 1), jnp.uint32)], axis=1)
                n += 1
            half = n // 2
            a = self.add(a[:, :half], a[:, half:])
            n = half
        return a

    def suffix_sums_exclusive(self, a: jax.Array) -> jax.Array:
        """out[j] = sum_{i>j} a[i] for a (L, N): one shift + inclusive
        Hillis-Steele ladder (log2 N adds of full width)."""
        L, n = a.shape
        shifted = jnp.concatenate(
            [a[:, 1:], jnp.zeros((L, 1), jnp.uint32)], axis=1)
        steps = max(n - 1, 0).bit_length()
        idx = jnp.arange(n)

        def body(t, x):
            shift = 1 << t
            rolled = jnp.roll(x, -shift, axis=1)
            rolled = jnp.where((idx < n - shift)[None], rolled, 0)
            return self.add(x, rolled)

        return jax.lax.fori_loop(0, steps, body, shifted)

    def powers_of(self, c: int, count: int) -> jax.Array:
        """[1, c, c^2, ..., c^(count-1)] (L, count) Montgomery, by doubling
        concatenation (log2(count) device muls)."""
        c = c % self.modulus
        table = self.one_mont
        length = 1
        while length < count:
            c_pow = self.scalar(pow(c, length, self.modulus))
            table = jnp.concatenate([table, self.mul(table, c_pow)], axis=1)
            length *= 2
        return table[:, :count]

    # ------------------------------------------------------------------
    def is_zero(self, a: jax.Array) -> jax.Array:
        return jnp.all(a == 0, axis=0)

    def equal(self, a: jax.Array, b: jax.Array) -> jax.Array:
        return jnp.all(a == b, axis=0)

    def select(self, cond: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
        """where(cond, a, b) with cond broadcast over the limb axis."""
        return jnp.where(cond[None], a, b)

    # ------------------------------------------------------------------
    def to_mont(self, a_canonical: jax.Array) -> jax.Array:
        return self.mul(a_canonical, self.r2_limbs)

    def from_mont(self, a: jax.Array) -> jax.Array:
        L = self.num_limbs
        widened = jnp.concatenate(
            [a, jnp.zeros((L,) + a.shape[1:], dtype=jnp.uint32)], axis=0)
        return self._mont_reduce(widened)


class CheckedFieldBackend(FieldBackend):
    """Debug variant (SURVEY.md §5 sanitizers): every public ring op
    validates its output on host — limbs must be 16-bit clean and the
    value canonical (< p).  A silent limb overflow or missed conditional
    subtraction, which in production only surfaces as a wrong proof far
    downstream, traps here at the op that produced it.

    Enabled via ``KZG_TPU_CHECKED=1`` (fr_backend/fq_backend return this
    class) or by constructing it directly in tests.  Host-syncs per op —
    debug/CI only.
    """

    _CACHE: dict = {}

    def validate(self, x, op: str):
        import numpy as np
        from jax import core as jcore
        if isinstance(x, jcore.Tracer):
            # Inside jit/pallas traces values are abstract; checked mode
            # validates only the eager paths (tests run ops eagerly).
            return x
        mat = np.asarray(jax.device_get(x))
        flat = mat.reshape(self.num_limbs, -1)
        assert (flat <= LIMB_MASK).all(), f"{op}: limb overflow (>16 bits)"
        for j in range(flat.shape[1]):
            v = _limbs_to_int(flat[:, j])
            assert v < self.modulus, \
                f"{op}: non-canonical output {v} >= p at column {j}"
        return x

    def add(self, a, b):
        return self.validate(super().add(a, b), "add")

    def sub(self, a, b):
        return self.validate(super().sub(a, b), "sub")

    def mul(self, a, b):
        return self.validate(super().mul(a, b), "mul")

    def square(self, a):
        return self.validate(super().square(a), "square")


def _checked() -> bool:
    import os
    return os.environ.get("KZG_TPU_CHECKED", "0") in ("1", "true", "on")


def checked_enabled() -> bool:
    """Public alias: KZG_TPU_CHECKED debug validation is on."""
    return _checked()


def validate_canonical(backend: "FieldBackend", x, op: str = "kernel"):
    """Host-side validation of a CONCRETE device array of field elements
    (limb axis first): every limb 16-bit clean, every value < p.

    Complements :class:`CheckedFieldBackend`, which skips tracer values
    and therefore never sees inside jit or Pallas (VERDICT.md round-2
    weak #5).  This runs on the *outputs* of jitted rounds and kernels —
    where limb-overflow risk actually lives — vectorized in numpy so a
    2^16-column round output validates in milliseconds.
    """
    mat = np.asarray(jax.device_get(x))
    L = backend.num_limbs
    assert mat.shape[0] == L, f"{op}: leading axis {mat.shape[0]} != L={L}"
    flat = mat.reshape(L, -1)
    if (flat > LIMB_MASK).any():
        bad = int(np.argwhere((flat > LIMB_MASK).any(axis=0))[0][0])
        raise AssertionError(
            f"{op}: limb overflow (>16 bits) at column {bad}: "
            f"{[hex(int(v)) for v in flat[:, bad]]}")
    mod_limbs = np.asarray(_int_to_limbs(backend.modulus, L),
                           dtype=np.uint32)
    # Lexicographic x < p from the most-significant limb down.
    undecided = np.ones(flat.shape[1], dtype=bool)
    lt = np.zeros(flat.shape[1], dtype=bool)
    for i in range(L - 1, -1, -1):
        lt |= undecided & (flat[i] < mod_limbs[i])
        undecided &= flat[i] == mod_limbs[i]
    if not lt.all():
        bad = int(np.argwhere(~lt)[0][0])
        raise AssertionError(
            f"{op}: non-canonical output >= p at column {bad}: "
            f"{_limbs_to_int(flat[:, bad])}")
    return x


def validate_tree_canonical(backend: "FieldBackend", tree, op: str):
    """validate_canonical over every array leaf of a pytree."""
    for leaf in jax.tree_util.tree_leaves(tree):
        validate_canonical(backend, leaf, op)
    return tree


@functools.lru_cache(maxsize=None)
def fr_backend(curve_type: str = "bn254") -> FieldBackend:
    from .. import constants as C
    modulus = C.BN254_R if curve_type == "bn254" else C.BLS12_381_R
    cls = CheckedFieldBackend if _checked() else FieldBackend
    return cls(modulus)


@functools.lru_cache(maxsize=None)
def fq_backend(curve_type: str = "bn254") -> FieldBackend:
    from .. import constants as C
    modulus = C.BN254_P if curve_type == "bn254" else C.BLS12_381_P
    cls = CheckedFieldBackend if _checked() else FieldBackend
    return cls(modulus)
