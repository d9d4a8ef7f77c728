"""Multi-scalar multiplication (MSM) on TPU: vectorized Pippenger.

L2' of the TPU-native stack: replaces the reference's naive per-coefficient
double-and-add commit loop (``/root/reference/kzg.py:112-117``) with a
bucketed windowed method designed for the TPU's execution model:

* **Lane-parallel bucket accumulation, all windows at once.**  The N
  points are split across ``lanes`` vector lanes and the W scalar windows
  ride in the batch width: one ``lax.scan`` over N/lanes steps whose body
  is a single complete *mixed* add (madd-2007-bl; incoming points are
  affine SRS entries) of width W*lanes + a take_along_axis/scatter pair on
  the (3, L, W, B, lanes) bucket table.  Work-optimal (one add per point
  per window), sequential depth N/lanes, compiled once.
* **Tree reductions.**  Lane-table merging and the weighted bucket sum
  (suffix trick: sum_k k B_k = sum_{j>=1} S_j with S_j = sum_{k>=j} B_k,
  suffix sums via a fori_loop Hillis-Steele ladder) keep both the work
  and the compiled graph small: the merge is ~W*B*lanes adds total, the
  suffix ladder ~W*B*log(B).
* **One compiled program.**  Nested scans keep compile cost independent of
  N and the window count, and the same traced core is reused inside
  ``shard_map`` for the multi-chip variant.

Scalars arrive as *canonical* (non-Montgomery) 16-bit limb arrays; windows
are ``window_bits`` wide (must divide 16).  Zero scalars land in bucket 0,
which is discarded — matching the reference's zero-coefficient skip
semantics by value.  Lane padding pairs the curve *generator* with digit 0
(the mixed add requires finite points; the padded lanes die in bucket 0).

The multi-chip variant (points sharded, per-chip partial MSMs combined with
a collective) lives in ``parallel/msm_dist.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .fr import FieldBackend, LIMB_BITS
from .g1 import CurveOps


def _vary(x: jax.Array, axis: str | None) -> jax.Array:
    """Mark a replicated constant as device-varying under shard_map (scan
    carries must match the varying-manual-axes type of their updates)."""
    if axis is None:
        return x
    return jax.lax.pcast(x, (axis,), to="varying")


def _halve_sum_last(curve: CurveOps, pts: jax.Array) -> jax.Array:
    """Tree-sum along the last axis (power-of-two length): each level adds
    the two halves, so total work is ~axis_len adds of geometrically
    shrinking width (vs axis_len * log(axis_len) for a roll ladder).
    (3, L, ..., n) -> (3, L, ...)."""
    n = pts.shape[-1]
    assert n & (n - 1) == 0, "halving tree needs a power-of-two length"
    while n > 1:
        half = n // 2
        pts = curve.add(pts[..., :half], pts[..., half:])
        n = half
    return pts[..., 0]


def _suffix_ladder(curve: CurveOps, pts: jax.Array) -> jax.Array:
    """Inclusive suffix sums S_j = sum_{k>=j} pts[..., k] along the last
    axis (power-of-two length): Hillis-Steele with identity fill, one
    fori_loop body."""
    n = pts.shape[-1]
    steps = max(n - 1, 0).bit_length()
    idx = jnp.arange(n)

    def body(t, x):
        shift = 1 << t
        rolled = jnp.roll(x, -shift, axis=-1)
        # Out-of-range slots become all-zero (Z = 0 -> identity for add).
        rolled = jnp.where(idx < n - shift, rolled, 0)
        return curve.add(x, rolled)

    return jax.lax.fori_loop(0, steps, body, pts)


def _msm_core(curve: CurveOps, points: jax.Array, digits: jax.Array,
              window_bits: int, vary_axis: str | None = None) -> jax.Array:
    """Full Pippenger MSM as one traced computation.

    points: (3, L, steps, lanes) Jacobian with Z = 1 — affine points;
        padding lanes must hold a real curve point (the generator), never
        the identity, paired with digit 0 so they land in the discarded
        bucket.  The accumulation step then uses the cheap complete *mixed*
        add (madd-2007-bl, ~35% fewer field muls than Jacobian-Jacobian).
    digits: (W, steps, lanes) uint32 bucket ids in [0, 2^window_bits).

    Structure (all windows processed together — the VPU sees W*lanes-wide
    batches and the sequential depth is steps, not W*steps):
      1. one lax.scan over ``steps``: gather the (W, lanes) addressed
         buckets, one mixed add of width W*lanes, scatter back;
      2. lane-table merge by a halving tree (work ~ W*B*lanes adds);
      3. weighted bucket sum per window via an inclusive suffix-sum
         ladder + halving tree;
      4. Horner fold over windows (W * window_bits doublings, width 1).

    Returns the (3, L) Jacobian total.
    """
    f = curve.f
    L = f.num_limbs
    W, steps, lanes = digits.shape
    B = 1 << window_bits

    ident_x = jnp.broadcast_to(
        f.one_mont.reshape(L, 1, 1, 1), (L, W, B, lanes))
    buckets0 = _vary(jnp.stack(
        [ident_x, ident_x, jnp.zeros_like(ident_x)], axis=0), vary_axis)

    w_idx = jnp.arange(W)[:, None]
    lane_idx = jnp.arange(lanes)[None, :]

    def step(buckets, inp):
        pts_t, dig_t = inp       # (3, L, lanes), (W, lanes)
        dig_e = dig_t[None, None, :, None, :].astype(jnp.int32)
        cur = jnp.take_along_axis(buckets, dig_e, axis=3)[:, :, :, 0, :]
        new = curve.add_mixed(cur, pts_t[0][:, None, :], pts_t[1][:, None, :])
        buckets = buckets.at[:, :, w_idx, dig_t, lane_idx].set(
            new, unique_indices=True)
        return buckets, None

    xs = (jnp.moveaxis(points, 2, 0), jnp.moveaxis(digits, 1, 0))
    buckets, _ = jax.lax.scan(step, buckets0, xs)

    # Drop bucket 0 (zero digits and padding) by forcing it to the identity.
    buckets = buckets.at[2, :, :, 0, :].set(0)

    # Merge the per-lane tables: (3, L, W, B, lanes) -> (3, L, W, B).
    merged = _halve_sum_last(curve, buckets)

    # Weighted sum over buckets: sum_k k B_k = sum_{j>=1} S_j with
    # S_j = sum_{k>=j} B_k (inclusive suffix sums).  Hillis-Steele ladder
    # in a fori_loop: B log B adds of work but a single small compiled body
    # (an unrolled work-efficient scan would inline the ~700-op group add
    # at every node — measured 166k jaxpr equations at B=256).
    suffix = _suffix_ladder(curve, merged)
    suffix = suffix.at[2, :, :, 0].set(0)        # exclude the j=0 term
    window_sums = _halve_sum_last(curve, suffix)             # (3, L, W)

    def fold(acc, gw):
        def dbl(_, a):
            return curve.double(a)
        acc = jax.lax.fori_loop(0, window_bits, dbl, acc)
        return curve.add(acc, gw[..., None]), None

    init = _vary(curve.identity(), vary_axis)    # (3, L, 1)
    acc, _ = jax.lax.scan(fold, init, jnp.moveaxis(window_sums, -1, 0),
                          reverse=True)
    return acc[..., 0]


_msm_jit = jax.jit(_msm_core, static_argnums=(0, 3, 4))


def _small_msm_core(curve: CurveOps, points: jax.Array,
                    bits: jax.Array) -> jax.Array:
    """Direct batched double-and-add for small N (the Pippenger bucket
    machinery costs more than it saves below a few hundred points).
    points (3, L, N); bits (nbits, N) LSB-first -> (3, L, 1)."""
    def step(carry, bit_row):
        acc, base = carry
        taken = curve.add(acc, base)
        acc = jnp.where((bit_row == 1)[None, None, :], taken, acc)
        base = curve.double(base)
        return (acc, base), None

    acc0 = curve.identity(tuple(points.shape[2:]))
    (acc, _), _ = jax.lax.scan(step, (acc0, points), bits)
    return curve.tree_sum(acc)


_small_msm_jit = jax.jit(_small_msm_core, static_argnums=(0,))


class MsmContext:
    """Pippenger MSM over one curve's G1."""

    def __init__(self, curve_type: str = "bn254", window_bits: int = 8):
        assert LIMB_BITS % window_bits == 0, \
            "window size must divide the 16-bit limb width"
        from .fr import fq_backend, fr_backend
        self.curve_type = curve_type
        self.curve = CurveOps(fq_backend(curve_type))
        self.scalar_backend = fr_backend(curve_type)
        self.window_bits = window_bits
        self.small_threshold = 256
        # n >= fused_threshold uses the VMEM-bucket kernel
        # (ops/msm_kernel.py) when fused kernels are enabled.
        self.fused_threshold = 2048

    # ------------------------------------------------------------------
    def _choose_lanes(self, n: int) -> int:
        # All W windows ride in the vector width, so each scan step is a
        # W*lanes-wide add; lanes trades lane-merge work (W*B*lanes extra
        # adds) against sequential depth (n/lanes steps).
        if n >= 32768:
            return 128
        if n >= 4096:
            return 64
        return 32

    def _generator_pad(self, pad: int) -> jax.Array:
        """(3, L, pad) copies of the curve generator (affine, Z=1) — the
        required padding for _msm_core (paired with digit 0, discarded via
        bucket 0; identity padding would poison the mixed add)."""
        from .. import constants as C
        gx, gy = (C.BN254_G1 if self.curve_type == "bn254"
                  else C.BLS12_381_G1)
        g = self.curve.from_affine_ints([gx], [gy])     # (3, L, 1)
        return jnp.broadcast_to(g, g.shape[:2] + (pad,))

    def _digits(self, scalars_limbs: jax.Array, steps: int, lanes: int):
        """(Ls, N) canonical limbs -> (W, steps, lanes) window digits."""
        c = self.window_bits
        per_limb = LIMB_BITS // c
        Ls, n = scalars_limbs.shape
        mask = (1 << c) - 1
        windows = []
        for limb in range(Ls):
            for j in range(per_limb):
                windows.append((scalars_limbs[limb] >> (c * j)) & mask)
        dig = jnp.stack(windows, axis=0)            # (W, N)
        pad = steps * lanes - n
        if pad:
            dig = jnp.concatenate(
                [dig, jnp.zeros((dig.shape[0], pad), dtype=dig.dtype)], axis=1)
        return dig.reshape(dig.shape[0], steps, lanes)

    # ------------------------------------------------------------------
    def msm(self, points: jax.Array, scalars_limbs: jax.Array,
            complete: bool | None = None) -> jax.Array:
        """sum_i scalars[i] * points[i].

        points: (3, L, N) with Z = 1 (affine; SRS entries are never the
            identity — the Pippenger path's mixed add requires finite
            points, see _msm_core).
        scalars_limbs: (Ls, N) canonical (non-Montgomery) 16-bit limbs.
        complete: bucket-add variant for the fused-kernel path (n >=
            fused_threshold).  The default (None -> KZG_TPU_COMPLETE_ADD,
            read at call time) is the *incomplete* fast mixed add — sound
            only when the point basis is duplicate-free and unstructured
            (SRS powers of a random tau, or random-multiplier bases; see
            ops/benchpoints.py).  A structured basis such as [(i+1) G] can
            hit the dropped p == q doubling case and return a silently
            wrong sum: pass ``complete=True`` for such inputs (ADVICE r4
            medium).  Sub-threshold paths always use complete adds.
        Returns (3, L, 1) Jacobian result.
        """
        curve = self.curve
        f = curve.f
        L = f.num_limbs
        n = points.shape[-1]

        # Fused VMEM-bucket kernel.  Window size adapts to the limb count
        # (ops/msm_kernel.window_bits_for): BN254 L=16 runs c=7 (65-bucket
        # table, 12.8 MB VMEM); BLS12-381 L=24 runs c=6 (33 buckets,
        # 9.5 MB) — c=7 there would need 19.2 MB > the 16 MB scoped VMEM.
        if n >= self.fused_threshold:
            from .pallas_fr import curve_kernels_enabled, _INTERPRET
            if curve_kernels_enabled():
                from .msm_kernel import fused_msm
                return fused_msm(self.curve_type).msm(
                    points, scalars_limbs, interpret=_INTERPRET,
                    complete=complete)

        if n <= self.small_threshold:
            # bits (16 Ls, N) -> (16*Ls, N) LSB-first
            Ls = scalars_limbs.shape[0]
            bit_rows = [(scalars_limbs[i] >> j) & 1
                        for i in range(Ls) for j in range(LIMB_BITS)]
            bits = jnp.stack(bit_rows, axis=0).astype(jnp.uint32)
            return _small_msm_jit(curve, points, bits)

        lanes = self._choose_lanes(n)
        steps = -(-n // lanes)
        pad = steps * lanes - n

        if pad:
            points = jnp.concatenate(
                [points, self._generator_pad(pad)], axis=-1)
        pts = points.reshape(3, L, steps, lanes)

        digits = self._digits(scalars_limbs, steps, lanes)
        return _msm_jit(curve, pts, digits, self.window_bits)[..., None]

    # ------------------------------------------------------------------
    def scalars_to_limbs(self, scalar_ints) -> jax.Array:
        """Canonical ints -> (Ls, N) uint32 device array."""
        from .fr import ints_to_limb_array
        r = self.scalar_backend.modulus
        return jnp.asarray(ints_to_limb_array(
            [int(s) % r for s in scalar_ints], self.scalar_backend.num_limbs))

    def msm_ints(self, affine_points: list, scalar_ints: list) -> jax.Array:
        """Convenience: host-int affine points + int scalars -> device MSM."""
        xs = [p[0] for p in affine_points]
        ys = [p[1] for p in affine_points]
        pts = self.curve.from_affine_ints(xs, ys)
        return self.msm(pts, self.scalars_to_limbs(scalar_ints))


@functools.lru_cache(maxsize=None)
def msm_context(curve_type: str = "bn254", window_bits: int = 8) -> MsmContext:
    return MsmContext(curve_type, window_bits)


def commit(kzg, ck, poly) -> tuple:
    """KZG "tpu"-backend commitment: MSM of the polynomial's coefficients
    against the device SRS, returned as the host-side canonical projective
    tuple (x, y, 1) / (1, 1, 0) the transcript serializes
    (kzg.py:80-120 semantics; see models/kzg.py backend notes)."""
    from .srs import DeviceSRS

    if not isinstance(ck, DeviceSRS):
        raise TypeError("tpu backend requires a DeviceSRS commitment key")
    coeffs = poly.list()
    if not coeffs:
        return kzg.Z1
    ctx = msm_context(kzg.curve_type)
    pts = ck.slice_pow2(len(coeffs))
    n = pts.shape[-1]
    ints = [int(c) for c in coeffs] + [0] * (n - len(coeffs))
    result = ctx.msm(pts, ctx.scalars_to_limbs(ints))
    affine = ctx.curve.to_affine_ints(result)[0]
    if affine is None:
        return kzg.Z1
    Fp = type(kzg.G1[0])
    return (Fp(affine[0]), Fp(affine[1]), Fp(1))
