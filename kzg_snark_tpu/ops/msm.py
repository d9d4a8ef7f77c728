"""Multi-scalar multiplication (MSM) on TPU: vectorized Pippenger.

L2' of the TPU-native stack: replaces the reference's naive per-coefficient
double-and-add commit loop (``/root/reference/kzg.py:112-117``) with a
bucketed windowed method designed for the TPU's execution model:

* **Lane-parallel bucket accumulation.**  The N points are split across
  ``lanes`` vector lanes; each lane serially accumulates its N/lanes points
  into a private bucket table via one ``lax.scan`` whose body is a single
  complete Jacobian add + gather/scatter — work-optimal (one add per point
  per window) and compiled once.
* **Fixed-width reductions.**  Lane-table merging, the weighted bucket sum
  (suffix-scan trick: sum_k k B_k = sum_j S_j with S_j = sum_{k>=j} B_k)
  and final folds run as ``fori_loop`` roll-and-add ladders, so the
  compiled graph stays small no matter the problem size.
* **One compiled program.**  Windows are a ``lax.scan`` around the bucket
  body, so the whole MSM is a single small jit — nested scans keep compile
  cost independent of N and the window count, and the same traced core is
  reused inside ``shard_map`` for the multi-chip variant.

Scalars arrive as *canonical* (non-Montgomery) 16-bit limb arrays; windows
are ``window_bits`` wide (must divide 16).  Zero scalars land in bucket 0,
which is discarded — matching the reference's zero-coefficient skip
semantics by value.

The multi-chip variant (points sharded, per-chip partial MSMs combined with
a collective) lives in ``parallel/msm_dist.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .fr import FieldBackend, LIMB_BITS
from .g1 import CurveOps


def _roll_reduce_sum(curve: CurveOps, pts: jax.Array, axis_len: int):
    """Sum ``pts`` (3, L, ..., axis_len) along the last axis into slot 0
    using a fixed-width roll-and-add ladder (log2 steps, body compiled
    once).  Returns (3, L, ..., axis_len) with the total in [..., 0]."""
    steps = max(axis_len - 1, 0).bit_length()

    def body(t, x):
        shift = 1 << t
        return curve.add(x, jnp.roll(x, -shift, axis=-1))

    return jax.lax.fori_loop(0, steps, body, pts)


def _suffix_scan(curve: CurveOps, pts: jax.Array, axis_len: int):
    """Inclusive suffix sums S_j = sum_{k>=j} B_k along the last axis
    (Hillis-Steele ladder with identity fill)."""
    steps = max(axis_len - 1, 0).bit_length()
    idx = jnp.arange(axis_len)

    def body(t, x):
        shift = 1 << t
        rolled = jnp.roll(x, -shift, axis=-1)
        valid = (idx < axis_len - shift)
        rolled = jnp.where(valid[None, None], rolled * 1,
                           jnp.zeros_like(rolled))
        # invalid slots: rolled Z forced to 0 => identity for complete add
        return curve.add(x, rolled)

    return jax.lax.fori_loop(0, steps, body, pts)


def _vary(x: jax.Array, axis: str | None) -> jax.Array:
    """Mark a replicated constant as device-varying under shard_map (scan
    carries must match the varying-manual-axes type of their updates)."""
    if axis is None:
        return x
    return jax.lax.pcast(x, (axis,), to="varying")


def _window_body(curve: CurveOps, points: jax.Array, digits_w: jax.Array,
                 lane_idx: jax.Array, num_buckets: int,
                 vary_axis: str | None = None) -> jax.Array:
    """One Pippenger window (traced inline; see _msm_core for the scan
    over windows).

    points: (3, L, steps, lanes) Jacobian (identity-padded)
    digits_w: (steps, lanes) uint32 bucket ids in [0, num_buckets)
    returns (3, L) window sum  sum_i digit_i * P_i.
    """
    f = curve.f
    L = f.num_limbs
    lanes = points.shape[-1]

    ident_x = jnp.broadcast_to(f.one_mont, (L, num_buckets * lanes)) \
        .reshape(L, num_buckets, lanes)
    buckets0 = _vary(jnp.stack(
        [ident_x, ident_x, jnp.zeros_like(ident_x)], axis=0), vary_axis)

    def step(buckets, inp):
        pts_t, dig_t = inp       # (3, L, lanes), (lanes,)
        cur = buckets[:, :, dig_t, lane_idx]
        new = curve.add(cur, pts_t)
        buckets = buckets.at[:, :, dig_t, lane_idx].set(new,
                                                        unique_indices=True)
        return buckets, None

    xs = (jnp.moveaxis(points, 2, 0), digits_w)   # leading steps axis
    buckets, _ = jax.lax.scan(step, buckets0, xs)

    # Drop bucket 0 (zero digits) by forcing it to the identity.
    buckets = buckets.at[2, :, 0, :].set(0)

    # Merge the per-lane tables: (3, L, B, lanes) -> (3, L, B).
    merged = _roll_reduce_sum(curve, buckets, lanes)[..., 0]

    # Weighted sum over buckets: sum_k k B_k = sum_{j>=1} S_j where
    # S_j = sum_{k>=j} B_k.
    suffix = _suffix_scan(curve, merged, num_buckets)
    suffix = suffix.at[2, :, 0].set(0)
    total = _roll_reduce_sum(curve, suffix, num_buckets)[..., 0]
    return total


def _msm_core(curve: CurveOps, points: jax.Array, digits: jax.Array,
              window_bits: int, vary_axis: str | None = None) -> jax.Array:
    """Full Pippenger MSM as one traced computation: lax.scan over windows
    (each window body itself a scan over point chunks), then a Horner fold.
    points (3, L, steps, lanes); digits (W, steps, lanes) -> (3, L)."""
    lanes = points.shape[-1]
    lane_idx = jnp.arange(lanes)
    num_buckets = 1 << window_bits

    def per_window(_, digits_w):
        return None, _window_body(curve, points, digits_w, lane_idx,
                                  num_buckets, vary_axis)

    _, window_sums = jax.lax.scan(per_window, None, digits)   # (W, 3, L)

    def fold(acc, gw):
        def dbl(_, a):
            return curve.double(a)
        acc = jax.lax.fori_loop(0, window_bits, dbl, acc)
        return curve.add(acc, gw[..., None]), None

    init = _vary(curve.identity(), vary_axis)    # (3, L, 1)
    acc, _ = jax.lax.scan(fold, init, window_sums, reverse=True)
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
        self.curve = CurveOps(fq_backend(curve_type))
        self.scalar_backend = fr_backend(curve_type)
        self.window_bits = window_bits
        self.small_threshold = 256

    # ------------------------------------------------------------------
    def _choose_lanes(self, n: int) -> int:
        # Bucket table = 3 * L * B * lanes * 4 bytes; keep it ~<= 64 MB
        # while giving the VPU full lanes.
        for lanes in (512, 256, 128, 64, 32, 16, 8):
            if n >= lanes * 4 or lanes == 8:
                return lanes
        return 8

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
    def msm(self, points: jax.Array, scalars_limbs: jax.Array) -> jax.Array:
        """sum_i scalars[i] * points[i].

        points: (3, L, N) Jacobian batch (affine Z=1 typical).
        scalars_limbs: (Ls, N) canonical (non-Montgomery) 16-bit limbs.
        Returns (3, L, 1) Jacobian result.
        """
        curve = self.curve
        f = curve.f
        L = f.num_limbs
        n = points.shape[-1]

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
            ident = curve.identity()                 # (3, L, 1)
            pad_pts = jnp.broadcast_to(ident, (3, L, pad))
            points = jnp.concatenate([points, pad_pts], axis=-1)
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
