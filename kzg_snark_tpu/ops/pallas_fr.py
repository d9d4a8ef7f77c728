"""Pallas TPU kernels for field and curve arithmetic.

Two generations of design informed these kernels (measured on v5e):

* The XLA lowering of the (L, N) limb-matrix modmul fragments into ~50
  unfused elementwise passes — ~2% of the roofline, minutes of compile.
* A first Pallas port of the same (L, N) ops reached only ~68M modmuls/s
  (~5% of the VPU's measured 2.7 Tops/s u32-multiply rate): the limb-axis
  pad/reshape/concat plumbing lowers to Mosaic relayouts (VMEM copies).

The kernels here use the **register-limb** representation
(``ops.regfield`` / ``ops.regcurve``): blocks are (L, S, 128) with the
batch on both minor axes, each limb a separate natively-tiled 2D value,
every loop unrolled, limb shifts free.  Modulus constants are baked-in
python ints, so kernels take no constant operands.

All kernels are bit-identical to the XLA FieldBackend/CurveOps paths
(same formula and canonicalization order), which interpret-mode tests
check against the host oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .fr import FieldBackend
from .regfield import RegField, reg_field
from .regcurve import RegCurve

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


LANES = 128


CHUNK = 8          # native (8, 128) sublane tile — one vreg per limb temp


def _block_rows(rows: int, cap: int) -> int:
    """Rows per grid block: as fat as VMEM allows (``cap``), a multiple of
    the 8-row chunk.  Two measured failure modes shape this: tiny blocks
    pay a fixed ~10-20us per grid step (1024 steps -> 20 ms for a 2^20
    modmul), while fat *tiles* (S=32 values) blow vector registers for the
    ~30-50 live limb temps and spill to VMEM (~10x).  So: fat blocks, and
    an in-kernel fori_loop over 8-row chunks — few grid steps, one-vreg
    temps, and a body compiled once."""
    if rows % CHUNK:
        # Mosaic requires the sublane block dim to be a multiple of 8 (or
        # the full array dim); sub-8 blocks are rejected — fall back to XLA.
        return 0
    blk = min(rows, cap)
    while rows % blk:
        blk //= 2
    return blk


def _blockable(n: int, cap: int = 256):
    """n -> (rows, block_rows) if the flat batch tiles as (rows, 128).
    Caps keep each kernel's double-buffered working set under the 16MB
    scoped-VMEM limit (measured hard error beyond it): 256 rows for
    2-operand field kernels, 128 for the 4-operand butterfly, 64 for
    curve kernels (points are 3x16 limb rows each)."""
    if n % LANES:
        return None
    rows = n // LANES
    return rows, _block_rows(rows, cap)


def _foreach_chunk(nrows: int, body) -> None:
    """In-kernel loop over 8-row chunks; falls back to a single direct
    call for sub-chunk blocks (small batches)."""
    import jax as _jax
    from jax.experimental import pallas as pl

    if nrows < CHUNK:
        body(0, nrows)
        return
    G = nrows // CHUNK

    def it(c, carry):
        body(pl.multiple_of(c * CHUNK, CHUNK), CHUNK)
        return carry

    _jax.lax.fori_loop(0, G, it, 0)


# ---------------------------------------------------------------------------
# Field kernels.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _mul_call(modulus: int, rows: int, S: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rf = reg_field(modulus)
    L = rf.L

    def kernel(a_ref, b_ref, o_ref):
        def chunk(r0, h):
            a = [a_ref[i, pl.ds(r0, h), :] for i in range(L)]
            b = [b_ref[i, pl.ds(r0, h), :] for i in range(L)]
            out = rf.mul(a, b)
            for i in range(L):
                o_ref[i, pl.ds(r0, h), :] = out[i]
        _foreach_chunk(S, chunk)

    spec = pl.BlockSpec((L, S, LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(rows // S,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((L, rows, LANES), jnp.uint32),
        interpret=interpret,
    )


def fused_mul(be: FieldBackend, a: jax.Array, b: jax.Array) -> jax.Array:
    """Montgomery product via one fused VMEM kernel; falls back to the XLA
    path for shapes that don't tile (or non-2D operands)."""
    if a.ndim != 2 or a.shape != b.shape:
        return be.mul(a, b)
    L, n = a.shape
    blk = _blockable(n)
    if not blk or blk[1] == 0:
        return be.mul(a, b)
    rows, S = blk
    call = _mul_call(be.modulus, rows, S, _INTERPRET)
    out = call(a.reshape(L, rows, LANES), b.reshape(L, rows, LANES))
    return out.reshape(L, n)


@functools.lru_cache(maxsize=None)
def _butterfly_call(modulus: int, rows: int, S: int, interpret: bool = False):
    """Fused NTT stage butterfly: out = where(mask, xl - tw*xu, xl + tw*xu)
    on pre-aligned rows."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rf = reg_field(modulus)
    L = rf.L

    def kernel(xl_ref, xu_ref, tw_ref, mask_ref, o_ref):
        def chunk(r0, h):
            xl = [xl_ref[i, pl.ds(r0, h), :] for i in range(L)]
            xu = [xu_ref[i, pl.ds(r0, h), :] for i in range(L)]
            tw = [tw_ref[i, pl.ds(r0, h), :] for i in range(L)]
            upper = mask_ref[0, pl.ds(r0, h), :] != 0
            prod = rf.mul(xu, tw)
            lo = rf.add(xl, prod)
            hi = rf.sub(xl, prod)
            out = rf.select(upper, hi, lo)
            for i in range(L):
                o_ref[i, pl.ds(r0, h), :] = out[i]
        _foreach_chunk(S, chunk)

    spec = pl.BlockSpec((L, S, LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, S, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(rows // S,),
        in_specs=[spec, spec, spec, mspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((L, rows, LANES), jnp.uint32),
        interpret=interpret,
    )


def fused_butterfly(be: FieldBackend, xl, xu, tw, upper_mask) -> jax.Array:
    """One NTT stage combine on pre-aligned rows; upper_mask (1, n) uint32."""
    L, n = xl.shape
    blk = _blockable(n, cap=128)
    if not blk or blk[1] == 0:
        prod = be.mul(xu, tw)
        upper = upper_mask != 0
        return jnp.where(upper, be.sub(xl, prod), be.add(xl, prod))
    rows, S = blk
    call = _butterfly_call(be.modulus, rows, S, _INTERPRET)
    out = call(xl.reshape(L, rows, LANES), xu.reshape(L, rows, LANES),
               tw.reshape(L, rows, LANES),
               upper_mask.reshape(1, rows, LANES))
    return out.reshape(L, n)


# ---------------------------------------------------------------------------
# Curve kernels (complete group law; see ops.regcurve).
# ---------------------------------------------------------------------------

def _point_in(ref, L, r0, h):
    from jax.experimental import pallas as pl
    return ([ref[0, i, pl.ds(r0, h), :] for i in range(L)],
            [ref[1, i, pl.ds(r0, h), :] for i in range(L)],
            [ref[2, i, pl.ds(r0, h), :] for i in range(L)])


def _point_out(ref, L, r0, h, P):
    from jax.experimental import pallas as pl
    X, Y, Z = P
    for i in range(L):
        ref[0, i, pl.ds(r0, h), :] = X[i]
        ref[1, i, pl.ds(r0, h), :] = Y[i]
        ref[2, i, pl.ds(r0, h), :] = Z[i]


@functools.lru_cache(maxsize=None)
def _add_call(modulus: int, rows: int, S: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    curve = RegCurve(reg_field(modulus))
    L = curve.f.L

    def kernel(p_ref, q_ref, o_ref):
        def chunk(r0, h):
            _point_out(o_ref, L, r0, h,
                       curve.add(_point_in(p_ref, L, r0, h),
                                 _point_in(q_ref, L, r0, h)))
        _foreach_chunk(S, chunk)

    spec = pl.BlockSpec((3, L, S, LANES), lambda i: (0, 0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(rows // S,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((3, L, rows, LANES), jnp.uint32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _add_mixed_call(modulus: int, rows: int, S: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    curve = RegCurve(reg_field(modulus))
    L = curve.f.L

    def kernel(p_ref, qx_ref, qy_ref, o_ref):
        def chunk(r0, h):
            qx = [qx_ref[i, pl.ds(r0, h), :] for i in range(L)]
            qy = [qy_ref[i, pl.ds(r0, h), :] for i in range(L)]
            _point_out(o_ref, L, r0, h,
                       curve.add_mixed(_point_in(p_ref, L, r0, h), qx, qy))
        _foreach_chunk(S, chunk)

    pspec = pl.BlockSpec((3, L, S, LANES), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM)
    qspec = pl.BlockSpec((L, S, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(rows // S,),
        in_specs=[pspec, qspec, qspec],
        out_specs=pspec,
        out_shape=jax.ShapeDtypeStruct((3, L, rows, LANES), jnp.uint32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _double_call(modulus: int, rows: int, S: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    curve = RegCurve(reg_field(modulus))
    L = curve.f.L

    def kernel(p_ref, o_ref):
        def chunk(r0, h):
            _point_out(o_ref, L, r0, h,
                       curve.double(_point_in(p_ref, L, r0, h)))
        _foreach_chunk(S, chunk)

    spec = pl.BlockSpec((3, L, S, LANES), lambda i: (0, 0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(rows // S,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((3, L, rows, LANES), jnp.uint32),
        interpret=interpret,
    )


def _flat3(x: jax.Array):
    """(3, L, ...batch) -> (3, L, M)."""
    return x.reshape(x.shape[0], x.shape[1], -1)


def fused_curve_add(curve, p: jax.Array, q: jax.Array) -> jax.Array:
    """Complete Jacobian add as one fused kernel; any batch shape (the
    batch dims are flattened to one tiled axis).  Falls back to the XLA
    path when the flat batch doesn't tile."""
    if p.shape != q.shape:
        return curve.add_xla(p, q)
    pf = _flat3(p)
    L = pf.shape[1]
    n = pf.shape[-1]
    blk = _blockable(n, cap=64)
    if not blk or blk[1] == 0:
        return curve.add_xla(p, q)
    rows, S = blk
    call = _add_call(curve.f.modulus, rows, S, _INTERPRET)
    out = call(pf.reshape(3, L, rows, LANES),
               _flat3(q).reshape(3, L, rows, LANES))
    return out.reshape(p.shape)


def fused_curve_add_mixed(curve, p: jax.Array, qx: jax.Array,
                          qy: jax.Array) -> jax.Array:
    batch = p.shape[2:]
    if qx.shape[1:] != batch:
        qx = jnp.broadcast_to(qx, (qx.shape[0],) + batch)
        qy = jnp.broadcast_to(qy, (qy.shape[0],) + batch)
    pf = _flat3(p)
    L = pf.shape[1]
    n = pf.shape[-1]
    blk = _blockable(n, cap=64)
    if not blk or blk[1] == 0:
        return curve.add_mixed_xla(p, qx, qy)
    rows, S = blk
    call = _add_mixed_call(curve.f.modulus, rows, S, _INTERPRET)
    out = call(pf.reshape(3, L, rows, LANES),
               qx.reshape(L, rows, LANES), qy.reshape(L, rows, LANES))
    return out.reshape(p.shape)


def fused_curve_double(curve, p: jax.Array) -> jax.Array:
    pf = _flat3(p)
    L = pf.shape[1]
    n = pf.shape[-1]
    blk = _blockable(n, cap=64)
    if not blk or blk[1] == 0:
        return curve.double_xla(p)
    rows, S = blk
    call = _double_call(curve.f.modulus, rows, S, _INTERPRET)
    out = call(pf.reshape(3, L, rows, LANES))
    return out.reshape(p.shape)
