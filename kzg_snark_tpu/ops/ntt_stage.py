"""Per-stage NTT butterfly kernels with in-kernel pairing.

The scan-mode NTT (ops/ntt.py) builds each stage's aligned operand rows
with XLA rolls/selects — four full HBM passes per stage before the fused
butterfly even runs.  These kernels do the pairing *inside* VMEM, one
pallas call per stage (spans are static), so a stage costs one read + one
write of the coefficient array plus a compact twiddle read:

* **Paired stages** (span >= 1024 elements = 8 sublane rows): the flat
  (L, rows, 128) array is reshaped (free) to (L, groups, 2, span_rows,
  128); a block holds both halves of a pair group, the kernel combines
  lo/hi chunks directly.  The twiddle table is compact (L, span) — the
  pattern within a group is group-invariant.
* **Local stages** (span < 1024): pairing happens within an (8, 128)
  chunk via sublane/lane rolls + selects (the roll distance and masks are
  static per stage); the twiddle pattern has period 2*span <= 1024 and is
  passed as one (L, 8, 128) tile.

Input is bit-reversed (natural-order DIT), identical butterflies and
twiddle schedule to NttContext._transform_scan — bit-exact outputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .regfield import reg_field

LANES = 128
CHUNK = 8


def _butterfly_regs(rf, lo, hi, tw):
    prod = rf.mul(hi, tw)
    return rf.add(lo, prod), rf.sub(lo, prod)


@functools.lru_cache(maxsize=None)
def _paired_stage_call(modulus: int, groups: int, span_rows: int,
                       Gb: int, S: int, interpret: bool = False):
    """Stage with span_rows >= 8: x (L, groups, 2, span_rows, LANES),
    tw (L, span_rows, LANES) -> same-shape x."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rf = reg_field(modulus)
    L = rf.L

    def kernel(x_ref, tw_ref, o_ref):
        def chunk(idx, carry):
            g = idx // (S // CHUNK)
            c = idx % (S // CHUNK)
            r0 = pl.multiple_of(c * CHUNK, CHUNK)
            lo = [x_ref[i, g, 0, pl.ds(r0, CHUNK), :] for i in range(L)]
            hi = [x_ref[i, g, 1, pl.ds(r0, CHUNK), :] for i in range(L)]
            tw = [tw_ref[i, pl.ds(r0, CHUNK), :] for i in range(L)]
            out_lo, out_hi = _butterfly_regs(rf, lo, hi, tw)
            for i in range(L):
                o_ref[i, g, 0, pl.ds(r0, CHUNK), :] = out_lo[i]
                o_ref[i, g, 1, pl.ds(r0, CHUNK), :] = out_hi[i]
            return carry

        jax.lax.fori_loop(0, Gb * (S // CHUNK), chunk, 0)

    xspec = pl.BlockSpec((L, Gb, 2, S, LANES),
                         lambda g, c: (0, g, 0, c, 0),
                         memory_space=pltpu.VMEM)
    twspec = pl.BlockSpec((L, S, LANES), lambda g, c: (0, c, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(groups // Gb, span_rows // S),
        in_specs=[xspec, twspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(
            (L, groups, 2, span_rows, LANES), jnp.uint32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _local_stage_call(modulus: int, rows: int, span: int, blk: int,
                      interpret: bool = False):
    """Stage with span < 1024 elements: pairing within an (8, 128) chunk.
    x (L, rows, LANES); tw (L, 8, LANES) — the twiddle pattern repeats
    every 2*span <= 1024 elements = <= 8 rows."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax.experimental.pallas import tpu as _tpu

    rf = reg_field(modulus)
    L = rf.L
    span_rows = span // LANES              # 0 for lane-local spans

    def kernel(x_ref, tw_ref, o_ref):
        # upper-position mask for one (8, 128) chunk (static per stage)
        flat = (jax.lax.broadcasted_iota(jnp.uint32, (CHUNK, LANES), 0)
                * LANES
                + jax.lax.broadcasted_iota(jnp.uint32, (CHUNK, LANES), 1))
        upper = (flat & span) != 0

        tw = [tw_ref[i] for i in range(L)]

        def chunk(c, carry):
            r0 = pl.multiple_of(c * CHUNK, CHUNK)
            x = [x_ref[i, pl.ds(r0, CHUNK), :] for i in range(L)]
            if span_rows:
                fwd = [_tpu.roll(v, span_rows, 0) for v in x]
                bwd = [_tpu.roll(v, -span_rows % CHUNK, 0) for v in x]
            else:
                fwd = [_tpu.roll(v, span, 1) for v in x]
                bwd = [_tpu.roll(v, -span % LANES, 1) for v in x]
            lo = rf.select(upper, fwd, x)      # lower partner everywhere
            hi = rf.select(upper, x, bwd)      # upper partner everywhere
            out_lo, out_hi = _butterfly_regs(rf, lo, hi, tw)
            out = rf.select(upper, out_hi, out_lo)
            for i in range(L):
                o_ref[i, pl.ds(r0, CHUNK), :] = out[i]
            return carry

        jax.lax.fori_loop(0, blk // CHUNK, chunk, 0)

    xspec = pl.BlockSpec((L, blk, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    twspec = pl.BlockSpec((L, CHUNK, LANES), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(rows // blk,),
        in_specs=[xspec, twspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((L, rows, LANES), jnp.uint32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _local_pair_call(modulus: int, rows: int, span: int, blk: int,
                     interpret: bool = False):
    """TWO fused local stages (spans ``span`` and ``2*span``, both < 1024):
    one read + one write of the coefficient array for two butterfly
    levels.  tw_a (L, 8, 128) period 2*span; tw_b (L, 8, 128) period
    4*span <= 1024 (what makes the fusion tile-local)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax.experimental.pallas import tpu as _tpu

    rf = reg_field(modulus)
    L = rf.L

    def level(x, upper, sp, tw):
        sp_rows = sp // LANES
        if sp_rows:
            fwd = [_tpu.roll(v, sp_rows, 0) for v in x]
            bwd = [_tpu.roll(v, -sp_rows % CHUNK, 0) for v in x]
        else:
            fwd = [_tpu.roll(v, sp, 1) for v in x]
            bwd = [_tpu.roll(v, -sp % LANES, 1) for v in x]
        lo = rf.select(upper, fwd, x)
        hi = rf.select(upper, x, bwd)
        out_lo, out_hi = _butterfly_regs(rf, lo, hi, tw)
        return rf.select(upper, out_hi, out_lo)

    def kernel(x_ref, twa_ref, twb_ref, o_ref):
        flat = (jax.lax.broadcasted_iota(jnp.uint32, (CHUNK, LANES), 0)
                * LANES
                + jax.lax.broadcasted_iota(jnp.uint32, (CHUNK, LANES), 1))
        upper_a = (flat & span) != 0
        upper_b = (flat & (2 * span)) != 0
        twa = [twa_ref[i] for i in range(L)]
        twb = [twb_ref[i] for i in range(L)]

        def chunk(c, carry):
            r0 = pl.multiple_of(c * CHUNK, CHUNK)
            x = [x_ref[i, pl.ds(r0, CHUNK), :] for i in range(L)]
            y = level(x, upper_a, span, twa)
            z = level(y, upper_b, 2 * span, twb)
            for i in range(L):
                o_ref[i, pl.ds(r0, CHUNK), :] = z[i]
            return carry

        jax.lax.fori_loop(0, blk // CHUNK, chunk, 0)

    xspec = pl.BlockSpec((L, blk, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    twspec = pl.BlockSpec((L, CHUNK, LANES), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(rows // blk,),
        in_specs=[xspec, twspec, twspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((L, rows, LANES), jnp.uint32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _paired_pair_call(modulus: int, groups: int, span_rows: int,
                      Gb: int, S: int, interpret: bool = False):
    """TWO fused paired stages (spans s and 2s, s >= 1024 elements = 8+
    rows): x (L, groups, 4, span_rows, LANES); tw_a (L, span_rows, LANES);
    tw_b (L, 2, span_rows, LANES) (the two halves of the 2s-period
    pattern).  One read + one write for two levels."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rf = reg_field(modulus)
    L = rf.L

    def kernel(x_ref, twa_ref, twb_ref, o_ref):
        def chunk(idx, carry):
            g = idx // (S // CHUNK)
            c = idx % (S // CHUNK)
            r0 = pl.multiple_of(c * CHUNK, CHUNK)
            xs = [[x_ref[i, g, q, pl.ds(r0, CHUNK), :] for i in range(L)]
                  for q in range(4)]
            twa = [twa_ref[i, pl.ds(r0, CHUNK), :] for i in range(L)]
            tb0 = [twb_ref[i, 0, pl.ds(r0, CHUNK), :] for i in range(L)]
            tb1 = [twb_ref[i, 1, pl.ds(r0, CHUNK), :] for i in range(L)]
            # level A: (x0,x1), (x2,x3) with tw_a
            y0, y1 = _butterfly_regs(rf, xs[0], xs[1], twa)
            y2, y3 = _butterfly_regs(rf, xs[2], xs[3], twa)
            # level B: (y0,y2) with tw_b[0], (y1,y3) with tw_b[1]
            z0, z2 = _butterfly_regs(rf, y0, y2, tb0)
            z1, z3 = _butterfly_regs(rf, y1, y3, tb1)
            for i in range(L):
                o_ref[i, g, 0, pl.ds(r0, CHUNK), :] = z0[i]
                o_ref[i, g, 1, pl.ds(r0, CHUNK), :] = z1[i]
                o_ref[i, g, 2, pl.ds(r0, CHUNK), :] = z2[i]
                o_ref[i, g, 3, pl.ds(r0, CHUNK), :] = z3[i]
            return carry

        jax.lax.fori_loop(0, Gb * (S // CHUNK), chunk, 0)

    xspec = pl.BlockSpec((L, Gb, 4, S, LANES),
                         lambda g, c: (0, g, 0, c, 0),
                         memory_space=pltpu.VMEM)
    taspec = pl.BlockSpec((L, S, LANES), lambda g, c: (0, c, 0),
                          memory_space=pltpu.VMEM)
    tbspec = pl.BlockSpec((L, 2, S, LANES), lambda g, c: (0, 0, c, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(groups // Gb, span_rows // S),
        in_specs=[xspec, taspec, tbspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(
            (L, groups, 4, span_rows, LANES), jnp.uint32),
        interpret=interpret,
    )


class StagedNtt:
    """Stage-unrolled transform for one (modulus, n): one pallas call per
    stage with in-kernel pairing.  Requires n >= 2048 (rows multiple of
    16); smaller sizes stay on the scan path."""

    def __init__(self, modulus: int, n: int):
        assert n % (LANES * 2 * CHUNK) == 0
        self.modulus = modulus
        self.n = n
        self.rows = n // LANES
        self.rf = reg_field(modulus)

    def _compact_tw(self, table: jax.Array, span: int) -> jax.Array:
        """Per-stage compact twiddle tile from the (L, n/2) power table:
        value at flat index e is w^((e mod span) * stride)."""
        L = table.shape[0]
        stride = self.n // (2 * span)
        base = table[:, 0:span * stride:stride]          # (L, span)
        if span >= 1024:
            return base.reshape(L, span // LANES, LANES)
        reps = 1024 // (2 * span)
        tile = jnp.concatenate([base, base], axis=1)     # period 2*span
        return jnp.tile(tile, (1, reps)).reshape(L, CHUNK, LANES)

    def transform(self, x_flat: jax.Array, table: jax.Array,
                  interpret: bool = False) -> jax.Array:
        """x_flat (L, n) bit-reversed input -> transformed (L, n).

        Stages are fused in PAIRS where both fit the same class (two local
        spans < 512, or two block spans >= 1024 with 4*span <= n): one
        read + one write of the array per two butterfly levels — half the
        HBM passes and grid overhead of single-stage execution.
        """
        L = x_flat.shape[0]
        rows = self.rows
        n = self.n
        x = x_flat.reshape(L, rows, LANES)
        span = 1
        while span < n:
            pair_local = span < 512 and 2 * span < 1024 and 4 * span <= n
            pair_big = (span >= 1024 and 4 * span <= n)
            if pair_local:
                twa = self._compact_tw(table, span)
                twb = self._compact_tw(table, 2 * span)
                blk = min(rows, 256)
                while rows % blk:
                    blk //= 2
                call = _local_pair_call(self.modulus, rows, span, blk,
                                        interpret)
                x = call(x, twa, twb)
                span *= 4
            elif pair_big:
                span_rows = span // LANES
                groups = rows // (4 * span_rows)
                S = min(span_rows, 64)
                Gb = max(1, min(groups, 64 // S))
                twa = self._compact_tw(table, span)
                stride2 = n // (4 * span)
                twb = table[:, 0:2 * span * stride2:stride2].reshape(
                    L, 2, span_rows, LANES)
                call = _paired_pair_call(self.modulus, groups, span_rows,
                                         Gb, S, interpret)
                x6 = x.reshape(L, groups, 4, span_rows, LANES)
                x = call(x6, twa, twb).reshape(L, rows, LANES)
                span *= 4
            elif span >= 1024:
                tw = self._compact_tw(table, span)
                span_rows = span // LANES
                groups = rows // (2 * span_rows)
                S = min(span_rows, 128)
                Gb = max(1, min(groups, 128 // S))
                call = _paired_stage_call(self.modulus, groups, span_rows,
                                          Gb, S, interpret)
                x5 = x.reshape(L, groups, 2, span_rows, LANES)
                x = call(x5, tw).reshape(L, rows, LANES)
                span *= 2
            else:
                tw = self._compact_tw(table, span)
                blk = min(rows, 256)
                while rows % blk:
                    blk //= 2
                call = _local_stage_call(self.modulus, rows, span, blk,
                                         interpret)
                x = call(x, tw)
                span *= 2
        return x.reshape(L, self.n)
