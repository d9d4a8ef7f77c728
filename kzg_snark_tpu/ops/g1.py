"""Batched short-Weierstrass (a = 0) curve arithmetic on TPU.

L2 of the TPU-native stack (SURVEY.md §7 layer 3): the device-side
counterpart of py_ecc's point arithmetic (``/root/reference/kzg.py:40-49``),
operating on *batches* of points in Jacobian coordinates over limb-major
field arrays (``ops.fr.FieldBackend``).

Representation: a batch of points is a uint32 array of shape (3, L, ...) —
(X, Y, Z) Jacobian coordinates (x = X/Z^2, y = Y/Z^3), identity encoded as
Z = 0.  The formulas are *complete via select*: both the general-addition
and doubling candidates are computed and the correct one chosen lane-wise,
so any combination of identity/equal/inverse inputs is handled branchlessly
(a requirement for vectorized MSM bucket accumulation).

These Jacobian formulas are standard (dbl-2009-l / add-2007-bl families);
they produce *different projective representatives* than the host compat
path — MSM results are normalized to affine before entering the transcript
(see ``models/kzg.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .fr import FieldBackend


class CurveOps:
    """Jacobian ops over one base field; a = 0 curves (BN254, BLS12-381)."""

    def __init__(self, backend: FieldBackend):
        self.f = backend

    # -- constructors ---------------------------------------------------
    def _ones(self, batch_shape) -> jax.Array:
        """Montgomery 1 broadcast to (L,) + batch_shape."""
        f = self.f
        col = f.one_mont.reshape((f.num_limbs,) + (1,) * len(batch_shape))
        return jnp.broadcast_to(col, (f.num_limbs,) + tuple(batch_shape))

    def identity(self, batch_shape=(1,)) -> jax.Array:
        x = self._ones(batch_shape)
        return jnp.stack([x, x, jnp.zeros_like(x)], axis=0)

    def from_affine_ints(self, xs, ys) -> jax.Array:
        """Host ints -> (3, L, N) Jacobian with Z = 1."""
        f = self.f
        x = f.from_ints(xs)
        y = f.from_ints(ys)
        z = jnp.broadcast_to(f.one_mont, x.shape)
        return jnp.stack([x, y, z], axis=0)

    def to_affine_ints(self, pts) -> list:
        """(3, L, ...) -> list of (x, y) int tuples or None for identity."""
        f = self.f
        X, Y, Z = pts[0], pts[1], pts[2]
        zinv = f.inv(Z)
        zinv2 = f.mul(zinv, zinv)
        zinv3 = f.mul(zinv2, zinv)
        ax = f.to_ints(f.mul(X, zinv2))
        ay = f.to_ints(f.mul(Y, zinv3))
        inf = jax.device_get(f.is_zero(Z)).reshape(-1)
        return [None if inf[i] else (ax[i], ay[i]) for i in range(len(ax))]

    def is_identity(self, pts) -> jax.Array:
        return self.f.is_zero(pts[2])

    # -- group law ------------------------------------------------------
    # Public entry points (`add`, `add_mixed`, `double`) dispatch to fused
    # Pallas kernels on TPU (one VMEM round-trip for the whole formula; the
    # XLA lowering fragments the ~20-40 field muls into HBM-round-tripping
    # passes, measured 20-40x off the ALU roofline).  The `*_xla` variants
    # are the raw traced formulas — used on CPU, for non-tiling shapes, and
    # *inside* the Pallas kernel bodies themselves.

    def double(self, pts: jax.Array) -> jax.Array:
        from .pallas_fr import curve_kernels_enabled, fused_curve_double
        if curve_kernels_enabled():
            return fused_curve_double(self, pts)
        return self.double_xla(pts)

    def add(self, p: jax.Array, q: jax.Array) -> jax.Array:
        from .pallas_fr import curve_kernels_enabled, fused_curve_add
        if curve_kernels_enabled():
            return fused_curve_add(self, p, q)
        return self.add_xla(p, q)

    def add_mixed(self, p: jax.Array, qx: jax.Array, qy: jax.Array
                  ) -> jax.Array:
        from .pallas_fr import curve_kernels_enabled, fused_curve_add_mixed
        if curve_kernels_enabled():
            return fused_curve_add_mixed(self, p, qx, qy)
        return self.add_mixed_xla(p, qx, qy)

    def double_xla(self, pts: jax.Array) -> jax.Array:
        """Jacobian doubling (a = 0).  Identity (Z=0) maps to Z3=0."""
        f = self.f
        X, Y, Z = pts[0], pts[1], pts[2]
        A = f.square(X)
        B = f.square(Y)
        C = f.square(B)
        t = f.square(f.add(X, B))
        D = f.double(f.sub(f.sub(t, A), C))          # 2((X+B)^2 - A - C)
        E = f.add(f.double(A), A)                     # 3A
        F = f.square(E)
        X3 = f.sub(F, f.double(D))
        eight_c = f.double(f.double(f.double(C)))
        Y3 = f.sub(f.mul(E, f.sub(D, X3)), eight_c)
        Z3 = f.double(f.mul(Y, Z))
        return jnp.stack([X3, Y3, Z3], axis=0)

    def add_xla(self, p: jax.Array, q: jax.Array) -> jax.Array:
        """Complete Jacobian addition via lane-wise select.

        Cases resolved per lane: p infinite -> q; q infinite -> p;
        p == q -> double(p); p == -q -> identity; else general addition.
        """
        f = self.f
        X1, Y1, Z1 = p[0], p[1], p[2]
        X2, Y2, Z2 = q[0], q[1], q[2]

        Z1Z1 = f.square(Z1)
        Z2Z2 = f.square(Z2)
        U1 = f.mul(X1, Z2Z2)
        U2 = f.mul(X2, Z1Z1)
        S1 = f.mul(f.mul(Y1, Z2), Z2Z2)
        S2 = f.mul(f.mul(Y2, Z1), Z1Z1)
        H = f.sub(U2, U1)
        Rr = f.sub(S2, S1)

        HH = f.square(H)
        I = f.double(f.double(HH))                    # (2H)^2
        J = f.mul(H, I)
        r2 = f.double(Rr)
        V = f.mul(U1, I)
        X3 = f.sub(f.sub(f.square(r2), J), f.double(V))
        Y3 = f.sub(f.mul(r2, f.sub(V, X3)), f.double(f.mul(S1, J)))
        zs = f.square(f.add(Z1, Z2))
        Z3 = f.mul(f.sub(f.sub(zs, Z1Z1), Z2Z2), H)
        general = jnp.stack([X3, Y3, Z3], axis=0)

        dbl = self.double_xla(p)

        p_inf = f.is_zero(Z1)
        q_inf = f.is_zero(Z2)
        h_zero = f.is_zero(H)
        r_zero = f.is_zero(Rr)
        same_point = h_zero & r_zero & ~p_inf & ~q_inf
        opposite = h_zero & ~r_zero & ~p_inf & ~q_inf

        out = general
        out = jnp.where(same_point[None, None], dbl, out)
        # p == -q: identity (zero Z; X/Y arbitrary but set to 1 for hygiene)
        ones = self._ones(X3.shape[1:])
        ident = jnp.stack([ones, ones, jnp.zeros_like(Z3)], axis=0)
        out = jnp.where(opposite[None, None], ident, out)
        out = jnp.where(q_inf[None, None], p, out)
        out = jnp.where(p_inf[None, None], q, out)
        return out

    def add_mixed_xla(self, p: jax.Array, qx: jax.Array, qy: jax.Array
                      ) -> jax.Array:
        """Complete mixed addition p + (qx, qy, 1): q affine and **never the
        identity** (callers pad with a real curve point, e.g. the generator,
        and discard the padded lanes via Pippenger's bucket 0).

        madd-2007-bl: 7M + 4S for the general case (vs 11M + 5S for the
        Jacobian-Jacobian path in :meth:`add`) — the workhorse of bucket
        accumulation where the incoming point is always an affine SRS entry.
        Cases resolved per lane: p infinite -> q; p == q -> double(p);
        p == -q -> identity; else mixed addition.
        """
        f = self.f
        X1, Y1, Z1 = p[0], p[1], p[2]

        Z1Z1 = f.square(Z1)
        U2 = f.mul(qx, Z1Z1)
        S2 = f.mul(f.mul(qy, Z1), Z1Z1)
        H = f.sub(U2, X1)
        Rr = f.sub(S2, Y1)

        HH = f.square(H)
        I = f.double(f.double(HH))                    # 4 HH
        J = f.mul(H, I)
        r2 = f.double(Rr)
        V = f.mul(X1, I)
        X3 = f.sub(f.sub(f.square(r2), J), f.double(V))
        Y3 = f.sub(f.mul(r2, f.sub(V, X3)), f.double(f.mul(Y1, J)))
        Z3 = f.sub(f.sub(f.square(f.add(Z1, H)), Z1Z1), HH)
        general = jnp.stack([X3, Y3, Z3], axis=0)

        dbl = self.double_xla(p)

        p_inf = f.is_zero(Z1)
        h_zero = f.is_zero(H)
        r_zero = f.is_zero(Rr)
        same_point = h_zero & r_zero & ~p_inf
        opposite = h_zero & ~r_zero & ~p_inf

        out = general
        out = jnp.where(same_point[None, None], dbl, out)
        ones = self._ones(X3.shape[1:])
        ident = jnp.stack([ones, ones, jnp.zeros_like(Z3)], axis=0)
        out = jnp.where(opposite[None, None], ident, out)
        qxb = jnp.broadcast_to(qx, X3.shape) if qx.shape != X3.shape else qx
        qyb = jnp.broadcast_to(qy, Y3.shape) if qy.shape != Y3.shape else qy
        qpt = jnp.stack([qxb, qyb, ones], axis=0)
        out = jnp.where(p_inf[None, None], qpt, out)
        return out

    def add_mixed_xla_fast(self, p: jax.Array, qx: jax.Array, qy: jax.Array
                           ) -> jax.Array:
        """Incomplete mixed add — XLA twin of ``RegCurve.add_mixed_fast``
        (identical formula order, bit-identical representatives).  Correct
        for p infinite (select) and p == -q (Z3 = 2*Z1*H = 0 = identity);
        the p == q doubling case yields the identity instead of 2q —
        excluded by callers (distinct-point MSMs; see add_mixed_fast notes).
        7M + 4S vs 9M + 9S for the complete :meth:`add_mixed_xla`."""
        f = self.f
        X1, Y1, Z1 = p[0], p[1], p[2]

        Z1Z1 = f.square(Z1)
        U2 = f.mul(qx, Z1Z1)
        S2 = f.mul(f.mul(qy, Z1), Z1Z1)
        H = f.sub(U2, X1)
        Rr = f.sub(S2, Y1)

        HH = f.square(H)
        I = f.double(f.double(HH))
        J = f.mul(H, I)
        r2 = f.double(Rr)
        V = f.mul(X1, I)
        X3 = f.sub(f.sub(f.square(r2), J), f.double(V))
        Y3 = f.sub(f.mul(r2, f.sub(V, X3)), f.double(f.mul(Y1, J)))
        Z3 = f.sub(f.sub(f.square(f.add(Z1, H)), Z1Z1), HH)
        general = jnp.stack([X3, Y3, Z3], axis=0)

        p_inf = f.is_zero(Z1)
        ones = self._ones(X3.shape[1:])
        qxb = jnp.broadcast_to(qx, X3.shape) if qx.shape != X3.shape else qx
        qyb = jnp.broadcast_to(qy, Y3.shape) if qy.shape != Y3.shape else qy
        qpt = jnp.stack([qxb, qyb, ones], axis=0)
        return jnp.where(p_inf[None, None], qpt, general)

    # -- scalar multiplication -----------------------------------------
    def scale(self, pts: jax.Array, scalar_bits: jax.Array) -> jax.Array:
        """Batched double-and-add with shared *traced* bit array
        (LSB-first, shape (nbits,)).  One fori-style scan, body compiled
        once."""
        def step(carry, bit):
            acc, base = carry
            taken = self.add(acc, base)
            acc = jnp.where((bit == 1)[None, None, None], taken, acc)
            base = self.double(base)
            return (acc, base), None

        acc0 = self.identity(tuple(pts.shape[2:]))
        (acc, _), _ = jax.lax.scan(step, (acc0, pts), scalar_bits)
        return acc

    def scale_const(self, pts: jax.Array, k: int) -> jax.Array:
        """Scalar multiple by a static int."""
        if k == 0:
            return self.identity(tuple(pts.shape[2:]))
        nbits = k.bit_length()
        bits = jnp.array([(k >> i) & 1 for i in range(nbits)], dtype=jnp.uint32)
        return self.scale(pts, bits)

    # -- reductions -----------------------------------------------------
    def tree_sum(self, pts: jax.Array) -> jax.Array:
        """Sum a (3, L, N) batch along the last axis -> (3, L, 1); padded
        halving tree (log2 N instantiations of add)."""
        n = pts.shape[-1]
        while n > 1:
            if n % 2:
                pts = jnp.concatenate([pts, self.identity()], axis=-1)
                n += 1
            half = n // 2
            pts = self.add(pts[..., :half], pts[..., half:])
            n = half
        return pts

    # -- validation -----------------------------------------------------
    def on_curve(self, pts: jax.Array, b_int: int) -> jax.Array:
        """Jacobian curve membership: Y^2 == X^3 + b Z^6 (or identity)."""
        f = self.f
        X, Y, Z = pts[0], pts[1], pts[2]
        lhs = f.square(Y)
        z2 = f.square(Z)
        z6 = f.mul(f.square(z2), z2)
        rhs = f.add(f.mul(f.square(X), X), f.mul(f.scalar(b_int), z6))
        return f.equal(lhs, rhs) | f.is_zero(Z)


def curve_ops(curve_type: str = "bn254") -> CurveOps:
    from .fr import fq_backend
    return CurveOps(fq_backend(curve_type))
