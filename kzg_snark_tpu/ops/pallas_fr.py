"""Pallas TPU kernels for the limb field arithmetic.

The XLA lowering of the modmul (ops/fr.py) fragments into ~50 unfused
elementwise passes (pads/reshapes/concats break TPU fusion regions), each
round-tripping HBM: measured ~210 ms per (16, 2^20) multiply — ~2% of
HBM-bound speed — and minutes of compile per shape.  These kernels run the
whole schoolbook + Montgomery reduction on VMEM tiles: one HBM read per
operand, one write per result, compiled once per tile shape.

The kernel bodies reuse FieldBackend's traced ops (they lower to Mosaic
vector ops inside the kernel), so the arithmetic is bit-identical to the
XLA path and covered by the same oracles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .fr import FieldBackend

_INTERPRET = False  # flipped by tests on CPU


def _tile_for(n: int) -> int:
    for tile in (512, 256, 128):
        if n % tile == 0:
            return tile
    return 0


def _shim(be: FieldBackend, p_vals, np_vals) -> FieldBackend:
    """A FieldBackend view whose modulus/REDC constants are kernel inputs
    (Pallas kernels may not capture device-array constants)."""
    shim = object.__new__(FieldBackend)
    shim.__dict__.update(be.__dict__)
    shim.p_limbs = p_vals
    shim.n_prime_limbs = np_vals
    return shim


@functools.lru_cache(maxsize=None)
def _mul_call(modulus: int, L: int, n: int, tile: int,
              interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    be = FieldBackend(modulus)

    def kernel(a_ref, b_ref, p_ref, np_ref, o_ref):
        sb = _shim(be, p_ref[...], np_ref[...])
        o_ref[...] = sb.mul(a_ref[...], b_ref[...])

    spec = pl.BlockSpec((L, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[spec, spec, cspec, cspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        interpret=interpret,
    )

    def apply(a, b):
        return call(a, b, be.p_limbs, be.n_prime_limbs)

    return apply


def fused_mul(be: FieldBackend, a: jax.Array, b: jax.Array) -> jax.Array:
    """Montgomery product via one fused VMEM kernel; falls back to the XLA
    path for shapes that don't tile (or non-2D operands)."""
    if a.ndim != 2 or a.shape != b.shape:
        return be.mul(a, b)
    L, n = a.shape
    tile = _tile_for(n)
    if tile == 0:
        return be.mul(a, b)
    return _mul_call(be.modulus, L, n, tile, _INTERPRET)(a, b)


@functools.lru_cache(maxsize=None)
def _butterfly_call(modulus: int, L: int, n: int, tile: int,
                    interpret: bool = False):
    """Fused NTT stage butterfly: given pre-gathered lower/upper operand
    rows and the stage twiddle row, produce the new row:
    out = where(upper_mask, xl - tw*xu, xl + tw*xu)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    be = FieldBackend(modulus)

    def kernel(xl_ref, xu_ref, tw_ref, mask_ref, p_ref, np_ref, o_ref):
        sb = _shim(be, p_ref[...], np_ref[...])
        xl = xl_ref[...]
        xu = xu_ref[...]
        prod = sb.mul(xu, tw_ref[...])
        upper = mask_ref[...] != 0
        o_ref[...] = jnp.where(upper, sb.sub(xl, prod), sb.add(xl, prod))

    spec = pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[spec, spec, spec, mspec, cspec, cspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((L, n), jnp.uint32),
        interpret=interpret,
    )

    def apply(xl, xu, tw, mask):
        return call(xl, xu, tw, mask, be.p_limbs, be.n_prime_limbs)

    return apply


def fused_butterfly(be: FieldBackend, xl, xu, tw, upper_mask) -> jax.Array:
    """One NTT stage combine on pre-aligned rows; upper_mask (1, n) uint32."""
    L, n = xl.shape
    tile = _tile_for(n)
    if tile == 0:
        prod = be.mul(xu, tw)
        upper = upper_mask != 0
        return jnp.where(upper, be.sub(xl, prod), be.add(xl, prod))
    return _butterfly_call(be.modulus, L, n, tile, _INTERPRET)(
        xl, xu, tw, upper_mask)
