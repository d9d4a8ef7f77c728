"""Pseudo-random G1 point bases for MSM benchmarks and tests.

The fused MSM's incomplete mixed add (``regcurve.add_mixed_fast``) requires
that no bucket's partial sum ever equal an incoming point.  For an SRS
basis [tau^i G] that holds by Schwartz-Zippel over the secret random tau
(a collision means tau is a root of a specific small-support polynomial).
But *structured* test bases like [(i+1) G] break it measurably: signed
digits make bucket contents small integer combinations sum +-(i_k+1), and
e.g. 128 G + 256 G followed by 384 G (all lane 127 at n = 1024) is the
p == q doubling case the fast formula drops — measured ~0.8 expected
collisions for 3 x 2^20-scalar MSMs over an (i+1) G basis.

This module builds the safe equivalent: P_i = k_i G with k_i independent
128-bit values from a seeded host PRNG, so any bucket collision needs a
subset-sum match among random 128-bit integers (< 2^-100 over all pairs).
The multipliers are returned to the caller, which makes the exact MSM
oracle cheap: sum_i s_i P_i = (sum_i s_i k_i mod r) G — one host scalar
multiplication checks any scalar window.

Device build: one jitted scan over the 128 multiplier bits — the scan body
is a width-n *complete* mixed add of the host-precomputed base 2^j G plus
a lane select (the accumulator can legitimately equal 2^j G mid-build), so
the compile cost is one small body.  Z-normalization uses a product-tree
Montgomery batch inversion (~3 muls/element instead of the ~380 of a
full-width Fermat inverse).

Replaces the round-3 bench basis (512 distinct points tiled to size, only
sound for the complete-add kernel).  Reference displaced:
/root/reference/kzg.py:112-117 commits against py_ecc points one at a time.
"""

from __future__ import annotations

import functools
import random

import jax
import jax.numpy as jnp

from .fr import FieldBackend, ints_to_limb_array
from .g1 import CurveOps

K_BITS = 128


def batch_inv(f: FieldBackend, x: jax.Array) -> jax.Array:
    """Elementwise inverse of a (L, n) batch via a product tree: ~2
    muls/element up, one width-1 Fermat inverse at the root, ~2
    muls/element down — vs ~380 muls/element for full-width Fermat.  n is
    padded to a power of two with ones.

    Zero-safe (ADVICE r4 low): zero inputs map to zero outputs instead of
    poisoning the root product (which would corrupt every inverse in the
    batch).  Zeros are substituted with ones inside the tree and masked
    back out at the end — same semantics as FieldBackend.batch_inv."""
    L, n = x.shape
    is_zero = jnp.all(x == 0, axis=0, keepdims=True)   # (1, n)
    ones_n = jnp.broadcast_to(f.one_mont, (L, n))
    x = jnp.where(is_zero, ones_n, x)
    m = 1
    while m < n:
        m *= 2
    if m > n:
        ones = jnp.broadcast_to(f.one_mont, (L, m - n))
        x = jnp.concatenate([x, ones], axis=-1)
    levels = []
    v = x
    while v.shape[-1] > 1:
        levels.append(v)
        half = v.shape[-1] // 2
        v = f.mul(v[..., :half], v[..., half:])
    inv = f.inv(v)                     # (L, 1)
    for lvl in reversed(levels):
        half = lvl.shape[-1] // 2
        left = f.mul(inv, lvl[..., half:])
        right = f.mul(inv, lvl[..., :half])
        inv = jnp.concatenate([left, right], axis=-1)
    return jnp.where(is_zero, jnp.zeros_like(inv[..., :n]), inv[..., :n])


@functools.lru_cache(maxsize=None)
def _build_jit(curve_type: str, size: int):
    from .fr import fq_backend
    curve = CurveOps(fq_backend(curve_type))
    f = curve.f
    L = f.num_limbs

    def build(bxs, bys, klimbs):
        # bxs/bys (K_BITS, L) Montgomery affine 2^j G; klimbs (Ls, size)
        acc = curve.identity((size,))

        def step(acc, inp):
            bx, by, limb_idx, shift = inp
            row = jax.lax.dynamic_index_in_dim(
                klimbs, limb_idx, axis=0, keepdims=False)
            bit = ((row >> shift) & 1) == 1
            qx = jnp.broadcast_to(bx[:, None], (L, size))
            qy = jnp.broadcast_to(by[:, None], (L, size))
            taken = curve.add_mixed(acc, qx, qy)   # complete: acc can hit 2^j G
            return jnp.where(bit[None, None, :], taken, acc), None

        idxs = jnp.arange(K_BITS, dtype=jnp.int32)
        acc, _ = jax.lax.scan(
            step, acc, (bxs, bys, idxs >> 4,
                        (idxs & 15).astype(jnp.uint32)))
        zinv = batch_inv(f, acc[2])
        zinv2 = f.mul(zinv, zinv)
        ax = f.mul(acc[0], zinv2)
        ay = f.mul(acc[1], f.mul(zinv2, zinv))
        ones = jnp.broadcast_to(f.one_mont, ax.shape)
        return jnp.stack([ax, ay, ones], axis=0)

    return jax.jit(build)


def random_point_basis(curve_type: str, size: int, seed: int,
                       cache_dir: str | None = ".build/benchbasis"
                       ) -> tuple[jax.Array, list[int]]:
    """(points (3, L, size) Jacobian Z=1 on device, multipliers k_i).

    P_i = k_i G, k_i odd 128-bit from ``random.Random(seed)`` (odd so no
    k_i is 0; top bit forced so all have full length).

    The normalized points are disk-cached per (curve, size, seed) under
    ``cache_dir`` (gitignored .build/): the device build costs ~60-150 s
    per bench section on the tunnel and the same basis is shared by the
    single-MSM and batch-8 sections; the multipliers are deterministic
    from the seed either way, so the cache only skips device work.
    """
    import os

    import numpy as np

    from .host import curve as hc
    from .host.field import base_field
    from .. import constants as C

    cache_path = None
    if cache_dir is not None:
        cache_path = os.path.join(
            cache_dir, f"{curve_type}_{size}_{seed}.npz")

    rng = random.Random(seed)
    ks = [(rng.getrandbits(K_BITS) | (1 << (K_BITS - 1)) | 1)
          for _ in range(size)]

    if cache_path is not None and os.path.exists(cache_path):
        data = np.load(cache_path)
        return jnp.asarray(data["points"]), ks

    Fp = base_field(curve_type)
    gen = C.BN254_G1 if curve_type == "bn254" else C.BLS12_381_G1
    G = (Fp(gen[0]), Fp(gen[1]), Fp(1))
    from .fr import fq_backend
    curve = CurveOps(fq_backend(curve_type))
    bx, by = [], []
    P = G
    for _ in range(K_BITS):
        a = hc.normalize(P)
        bx.append(int(a[0]))
        by.append(int(a[1]))
        P = hc.double(P)
    bpts = curve.from_affine_ints(bx, by)            # (3, L, K_BITS)
    bxs = jnp.transpose(bpts[0], (1, 0))             # (K_BITS, L)
    bys = jnp.transpose(bpts[1], (1, 0))
    Ls = -(-K_BITS // 16)
    klimbs = jnp.asarray(ints_to_limb_array(ks, Ls))
    points = _build_jit(curve_type, size)(bxs, bys, klimbs)
    if cache_path is not None:
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(cache_path, points=np.asarray(jax.device_get(points)))
    return points, ks
