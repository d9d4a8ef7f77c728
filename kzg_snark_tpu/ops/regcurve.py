"""Short-Weierstrass (a = 0) group law over register-limb field elements.

The same complete formulas as ``ops.g1.CurveOps`` (dbl-2009-l /
add-2007-bl / madd-2007-bl with lane-wise case selects), re-expressed over
``ops.regfield.RegField`` register lists so Pallas kernel bodies lower to
straight-line native vector code with zero relayouts.  Representatives are
bit-identical to the CurveOps XLA path (same formula order), which the
interpret-mode tests check directly.

A point batch is a tuple (X, Y, Z) of register lists; identity is Z = 0.
"""

from __future__ import annotations

from .regfield import RegField


class RegCurve:
    def __init__(self, field: RegField):
        self.f = field

    def identity_like(self, like):
        f = self.f
        return (f.one(like), f.one(like), f.zero(like))

    # ------------------------------------------------------------------
    def double(self, P):
        """Jacobian doubling (a = 0); identity -> identity (Z3 = 0)."""
        f = self.f
        X, Y, Z = P
        A = f.square(X)
        B = f.square(Y)
        C = f.square(B)
        t = f.square(f.add(X, B))
        D = f.double(f.sub(f.sub(t, A), C))
        E = f.add(f.double(A), A)
        F = f.square(E)
        X3 = f.sub(F, f.double(D))
        eight_c = f.double(f.double(f.double(C)))
        Y3 = f.sub(f.mul(E, f.sub(D, X3)), eight_c)
        Z3 = f.double(f.mul(Y, Z))
        return (X3, Y3, Z3)

    # ------------------------------------------------------------------
    def add(self, P, Q):
        """Complete Jacobian + Jacobian (cases: inf/inf, same, opposite)."""
        f = self.f
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q

        Z1Z1 = f.square(Z1)
        Z2Z2 = f.square(Z2)
        U1 = f.mul(X1, Z2Z2)
        U2 = f.mul(X2, Z1Z1)
        S1 = f.mul(f.mul(Y1, Z2), Z2Z2)
        S2 = f.mul(f.mul(Y2, Z1), Z1Z1)
        H = f.sub(U2, U1)
        Rr = f.sub(S2, S1)

        HH = f.square(H)
        I = f.double(f.double(HH))
        J = f.mul(H, I)
        r2 = f.double(Rr)
        V = f.mul(U1, I)
        X3 = f.sub(f.sub(f.square(r2), J), f.double(V))
        Y3 = f.sub(f.mul(r2, f.sub(V, X3)), f.double(f.mul(S1, J)))
        zs = f.square(f.add(Z1, Z2))
        Z3 = f.mul(f.sub(f.sub(zs, Z1Z1), Z2Z2), H)

        dX, dY, dZ = self.double(P)

        p_inf = f.is_zero(Z1)
        q_inf = f.is_zero(Z2)
        h_zero = f.is_zero(H)
        r_zero = f.is_zero(Rr)
        finite = ~p_inf & ~q_inf
        same = h_zero & r_zero & finite
        opposite = h_zero & ~r_zero & finite

        one = f.one(X3[0])
        zero = f.zero(X3[0])

        X3 = f.select(same, dX, X3)
        Y3 = f.select(same, dY, Y3)
        Z3 = f.select(same, dZ, Z3)
        X3 = f.select(opposite, one, X3)
        Y3 = f.select(opposite, one, Y3)
        Z3 = f.select(opposite, zero, Z3)
        X3 = f.select(q_inf, X1, X3)
        Y3 = f.select(q_inf, Y1, Y3)
        Z3 = f.select(q_inf, Z1, Z3)
        X3 = f.select(p_inf, X2, X3)
        Y3 = f.select(p_inf, Y2, Y3)
        Z3 = f.select(p_inf, Z2, Z3)
        return (X3, Y3, Z3)

    # ------------------------------------------------------------------
    def add_mixed_fast(self, P, qx, qy):
        """Incomplete mixed add p + (qx, qy, 1) — the MSM bucket workhorse.

        Drops :meth:`add_mixed`'s unconditional doubling branch (2M + 5S of
        extra field work per add, ~60% of the madd itself, paid on *every*
        add just to cover the p == q case).  Case analysis:

        * p infinite (empty bucket — common): handled by the select below.
        * p == -q: H = 0 makes Z3 = 2*Z1*H = 0, i.e. the identity — the
          formula is already correct with no select.
        * p == q (needs doubling): H = 0 yields Z3 = 0, silently dropping
          2q.  A bucket equals the incoming point only when a partial
          subset sum of *distinct* points collides with it — probability
          ~2^-254 for SRS/protocol inputs (and the bench constructs its
          points distinct for exactly this reason).  Callers that cannot
          exclude duplicates use the complete variant (KZG_TPU_COMPLETE_ADD).

        Cost: 7M + 4S (madd-2007-bl) vs 9M + 9S for the complete form —
        measured 1.55x on the fused MSM kernel (see ops/msm_kernel.py).
        """
        f = self.f
        X1, Y1, Z1 = P

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

        p_inf = f.is_zero(Z1)
        one = f.one(X3[0])
        X3 = f.select(p_inf, qx, X3)
        Y3 = f.select(p_inf, qy, Y3)
        Z3 = f.select(p_inf, one, Z3)
        return (X3, Y3, Z3)

    # ------------------------------------------------------------------
    def add_mixed(self, P, qx, qy):
        """Complete Jacobian + affine (q finite; see CurveOps.add_mixed)."""
        f = self.f
        X1, Y1, Z1 = P

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

        dX, dY, dZ = self.double(P)

        p_inf = f.is_zero(Z1)
        h_zero = f.is_zero(H)
        r_zero = f.is_zero(Rr)
        same = h_zero & r_zero & ~p_inf
        opposite = h_zero & ~r_zero & ~p_inf

        one = f.one(X3[0])
        zero = f.zero(X3[0])

        X3 = f.select(same, dX, X3)
        Y3 = f.select(same, dY, Y3)
        Z3 = f.select(same, dZ, Z3)
        X3 = f.select(opposite, one, X3)
        Y3 = f.select(opposite, one, Y3)
        Z3 = f.select(opposite, zero, Z3)
        X3 = f.select(p_inf, qx, X3)
        Y3 = f.select(p_inf, qy, Y3)
        Z3 = f.select(p_inf, one, Z3)
        return (X3, Y3, Z3)
