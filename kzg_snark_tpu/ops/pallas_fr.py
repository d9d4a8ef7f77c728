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


def pallas_enabled() -> bool:
    """Whether fused Pallas kernels are used (KZG_TPU_PALLAS=1/0 overrides;
    default: on for non-CPU backends, plus interpret mode for tests)."""
    import os
    flag = os.environ.get("KZG_TPU_PALLAS", "auto")
    if flag in ("1", "true", "on"):
        return True
    if flag in ("0", "false", "off"):
        return False
    if _INTERPRET:
        return True
    import jax
    return jax.default_backend() != "cpu"


def curve_kernels_enabled() -> bool:
    return pallas_enabled()


def _tile_for(n: int) -> int:
    for tile in (512, 256, 128):
        if n % tile == 0:
            return tile
    return 0


def _shim(be: FieldBackend, p_vals, np_vals, one_vals=None) -> FieldBackend:
    """A FieldBackend view whose modulus/REDC constants are kernel inputs
    (Pallas kernels may not capture constants — even trace-time literals).
    ``one_vals`` (the Montgomery one) is needed by formulas that build the
    curve identity inside the kernel (the complete-add selects)."""
    shim = object.__new__(FieldBackend)
    shim.__dict__.update(be.__dict__)
    shim.p_limbs = p_vals
    shim.n_prime_limbs = np_vals
    if one_vals is not None:
        shim.one_mont = one_vals
    shim.zero_limbs = jnp.zeros((be.num_limbs, 1), dtype=jnp.uint32)
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


# ---------------------------------------------------------------------------
# Fused curve group law.  A complete Jacobian add / mixed add / double is
# ~20-40 field muls; through XLA each mul fragments into dozens of unfused
# elementwise passes that round-trip HBM (measured ~20-40x off the ALU
# roofline inside the MSM bucket scan).  These kernels run the whole group
# formula from kzg_snark_tpu.ops.g1.CurveOps on VMEM tiles.  The kernel
# bodies call back into CurveOps with a shimmed FieldBackend, so the
# arithmetic is bit-identical to the XLA path.
# ---------------------------------------------------------------------------

def _curve_shim(modulus: int, p_vals, np_vals, one_vals):
    from .g1 import CurveOps
    return CurveOps(_shim(FieldBackend(modulus), p_vals, np_vals, one_vals))


@functools.lru_cache(maxsize=None)
def _add_call(modulus: int, L: int, n: int, tile: int,
              interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    be = FieldBackend(modulus)

    def kernel(p_ref, q_ref, p_mod, np_mod, one_ref, o_ref):
        curve = _curve_shim(modulus, p_mod[...], np_mod[...], one_ref[...])
        o_ref[...] = curve.add_xla(p_ref[...], q_ref[...])

    spec = pl.BlockSpec((3, L, tile), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[spec, spec, cspec, cspec, cspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((3, L, n), jnp.uint32),
        interpret=interpret,
    )

    def apply(p, q):
        return call(p, q, be.p_limbs, be.n_prime_limbs, be.one_mont)

    return apply


@functools.lru_cache(maxsize=None)
def _add_mixed_call(modulus: int, L: int, n: int, tile: int,
                    interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    be = FieldBackend(modulus)

    def kernel(p_ref, qx_ref, qy_ref, p_mod, np_mod, one_ref, o_ref):
        curve = _curve_shim(modulus, p_mod[...], np_mod[...], one_ref[...])
        o_ref[...] = curve.add_mixed_xla(p_ref[...], qx_ref[...],
                                         qy_ref[...])

    pspec = pl.BlockSpec((3, L, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((L, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[pspec, qspec, qspec, cspec, cspec, cspec],
        out_specs=pspec,
        out_shape=jax.ShapeDtypeStruct((3, L, n), jnp.uint32),
        interpret=interpret,
    )

    def apply(p, qx, qy):
        return call(p, qx, qy, be.p_limbs, be.n_prime_limbs, be.one_mont)

    return apply


@functools.lru_cache(maxsize=None)
def _double_call(modulus: int, L: int, n: int, tile: int,
                 interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    be = FieldBackend(modulus)

    def kernel(p_ref, p_mod, np_mod, one_ref, o_ref):
        curve = _curve_shim(modulus, p_mod[...], np_mod[...], one_ref[...])
        o_ref[...] = curve.double_xla(p_ref[...])

    spec = pl.BlockSpec((3, L, tile), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[spec, cspec, cspec, cspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((3, L, n), jnp.uint32),
        interpret=interpret,
    )

    def apply(p):
        return call(p, be.p_limbs, be.n_prime_limbs, be.one_mont)

    return apply


def _flat3(x: jax.Array):
    """(3, L, ...batch) -> ((3, L, M), batch_shape)."""
    return x.reshape(x.shape[0], x.shape[1], -1), x.shape[2:]


def fused_curve_add(curve, p: jax.Array, q: jax.Array) -> jax.Array:
    """Complete Jacobian add as one fused kernel; any batch shape (the
    batch dims are flattened to one tiled axis).  Falls back to the XLA
    path when the flat batch doesn't tile."""
    if p.shape != q.shape:
        return curve.add_xla(p, q)
    pf, batch = _flat3(p)
    n = pf.shape[-1]
    tile = _tile_for(n)
    if tile == 0:
        return curve.add_xla(p, q)
    qf = q.reshape(pf.shape)
    out = _add_call(curve.f.modulus, pf.shape[1], n, tile, _INTERPRET)(pf, qf)
    return out.reshape(p.shape)


def fused_curve_add_mixed(curve, p: jax.Array, qx: jax.Array,
                          qy: jax.Array) -> jax.Array:
    batch = p.shape[2:]
    if qx.shape[1:] != batch:
        qx = jnp.broadcast_to(qx, (qx.shape[0],) + batch)
        qy = jnp.broadcast_to(qy, (qy.shape[0],) + batch)
    pf, _ = _flat3(p)
    n = pf.shape[-1]
    tile = _tile_for(n)
    if tile == 0:
        return curve.add_mixed_xla(p, qx, qy)
    qxf = qx.reshape(qx.shape[0], -1)
    qyf = qy.reshape(qy.shape[0], -1)
    out = _add_mixed_call(curve.f.modulus, pf.shape[1], n, tile,
                          _INTERPRET)(pf, qxf, qyf)
    return out.reshape(p.shape)


def fused_curve_double(curve, p: jax.Array) -> jax.Array:
    pf, _ = _flat3(p)
    n = pf.shape[-1]
    tile = _tile_for(n)
    if tile == 0:
        return curve.double_xla(p)
    out = _double_call(curve.f.modulus, pf.shape[1], n, tile, _INTERPRET)(pf)
    return out.reshape(p.shape)
