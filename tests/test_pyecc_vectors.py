"""py_ecc representative-parity vectors (VERDICT.md round-2 item #3).

The reference transcript hashes ``str()`` of *non-normalized projective
tuples* produced by py_ecc ``optimized_bn128`` (/root/reference/
transcript.py:80-85), so byte-exact proof parity requires
``ops/host/curve.py`` to reproduce py_ecc's exact projective
representatives — not merely the group law.  py_ecc is not installed in
this environment, so this file carries an *independent* reimplementation
of py_ecc's published optimized projective formulas on plain ints
(``_pyecc``), plus literal pinned SHA-256 digests of the resulting tuples.
A deviation in either the compat curve path or the transcript
serialization fails these tests even if both sides drift together
(the digests are frozen literals, derived once from the formulas).

Chain coverage: double/add/multiply representatives, the reference's
commit loop semantics (zero-coefficient skip + add into Z1,
/root/reference/kzg.py:108-117), setup's ``multiply(G1, int(tau**i))``
chain (/root/reference/kzg.py:70-75), and a full transcript state with a
point absorption + ">q" int + challenge derivation
(/root/reference/transcript.py:36-100).

PROVENANCE CAVEAT (VERDICT r3 weak #5): the pinned digests were computed
by running THIS file's ``_py_*`` helpers, not an actual py_ecc
installation (py_ecc cannot be installed here — zero egress, not in the
baked image).  The helpers were written from py_ecc's published
optimized-projective formulas independently of ``ops/host/curve.py``, so
the tests do catch either side drifting — but the residual risk that
both implementations misread the same published formula the same way is
real and cannot be discharged in this environment.  Anyone with py_ecc
available should regenerate: each digest is ``sha256(str(tuple))`` of
the corresponding ``optimized_bn128`` result (see the per-test comments).
"""

import hashlib
import struct

import pytest

from kzg_snark_tpu.constants import BN254_P, BN254_R
from kzg_snark_tpu.ops.host import curve as hc
from kzg_snark_tpu.ops.host.field import base_field, scalar_field
from kzg_snark_tpu.transcript import Transcript

P = BN254_P
R = BN254_R


# ---------------------------------------------------------------------------
# Independent oracle: py_ecc optimized_bn128 projective formulas on ints.
# ---------------------------------------------------------------------------

def _py_double(pt):
    x, y, z = pt
    W = 3 * x * x % P
    S = y * z % P
    B = x * y % P * S % P
    H = (W * W - 8 * B) % P
    S_sq = S * S % P
    return (2 * H * S % P,
            (W * (4 * B - H) - 8 * y * y % P * S_sq) % P,
            8 * S * S_sq % P)


def _py_add(p1, p2):
    if p1[2] == 0 or p2[2] == 0:
        return p1 if p2[2] == 0 else p2
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    U1, U2 = y2 * z1 % P, y1 * z2 % P
    V1, V2 = x2 * z1 % P, x1 * z2 % P
    if V1 == V2 and U1 == U2:
        return _py_double(p1)
    if V1 == V2:
        return (1, 1, 0)
    U, V = (U1 - U2) % P, (V1 - V2) % P
    V_sq = V * V % P
    V_sq_V2 = V_sq * V2 % P
    V_cu = V * V_sq % P
    W = z1 * z2 % P
    A = (U * U % P * W - V_cu - 2 * V_sq_V2) % P
    return (V * A % P,
            (U * (V_sq_V2 - A) - V_cu * U2) % P,
            V_cu * W % P)


def _py_multiply(pt, n):
    # Iterative form of py_ecc's recursion
    # mult(P, n) = add(mult(double(P), n // 2), P if n odd).
    if n == 0:
        return (1, 1, 0)
    if n == 1:
        return pt
    pending = []
    q = pt
    while n > 1:
        if n & 1:
            pending.append(q)
        q = _py_double(q)
        n >>= 1
    out = q
    for point in reversed(pending):
        out = _py_add(out, point)
    return out


G_INT = (1, 2, 1)

# Frozen digests of str(projective tuple) for multiply(G1, k) — computed
# once from the formulas above; they pin the *representatives*, so a drift
# in either implementation (or in how tuples stringify) fails loudly.
MULTIPLY_DIGESTS = {
    2: "444c1b33d84bf88038e1b823f3bbcb21ab0476a3cd494282f933226c8649cf5a",
    3: "35e8fd76344ad1234627b5d5f2e3bb91109cb822da549ddd47f23d51579b8112",
    5: "cdc20755fed19ffe8a53718be2f208d86bb81e1b016b9c2dab1243fe775b7e3e",
    31337: "ac7720e5051df2424afb702ea6218c084a0fecc43284c836de7326ad6cf42ea0",
    (1 << 130) + 3:
        "af2030899653f8c553c78a4e39a676199dc76dec27e5042ec56f27f5b077399f",
    R - 1:
        "62394449b8dff1197463e3545c8409bdbdfdf0f055548c1a65949ee85e5f67b0",
}

COMMIT_DIGEST = \
    "6012d0a3431b059ebcdf533fd9059c91254e01f79c013203781ad53fbb81515d"
XI_CHALLENGE = \
    21461185896884366544551632680048265293113215026262927254038088807329245165642


def _ints(pt):
    return tuple(int(c) for c in pt)


@pytest.fixture(scope="module")
def Fp():
    return base_field("bn254")


@pytest.fixture(scope="module")
def G(Fp):
    return (Fp(1), Fp(2), Fp(1))


def test_double_add_representatives(Fp, G):
    """Exact projective coordinates of short chains match the oracle."""
    d = hc.double(G)
    assert _ints(d) == _py_double(G_INT)
    dd = hc.double(d)
    assert _ints(dd) == _py_double(_py_double(G_INT))
    s = hc.add(dd, G)
    assert _ints(s) == _py_add(_py_double(_py_double(G_INT)), G_INT)
    # mixed-branch coverage: add with identity, equal points, negatives
    ident = hc.identity(Fp)
    assert _ints(hc.add(G, ident)) == G_INT
    assert _ints(hc.add(ident, G)) == G_INT
    assert _ints(hc.add(G, G)) == _py_double(G_INT)
    assert _ints(hc.add(G, hc.neg(G))) == (1, 1, 0)


@pytest.mark.parametrize("k", sorted(MULTIPLY_DIGESTS, key=int))
def test_multiply_representatives(Fp, G, k):
    got = hc.multiply(G, k)
    oracle = _py_multiply(G_INT, k)
    assert _ints(got) == oracle
    digest = hashlib.sha256(str(tuple(int(c) for c in got)).encode())
    assert digest.hexdigest() == MULTIPLY_DIGESTS[k]


def test_multiply_matches_oracle_randomized(Fp, G):
    import random
    rng = random.Random(20260819)
    for _ in range(8):
        k = rng.randrange(1, R)
        assert _ints(hc.multiply(G, k)) == _py_multiply(G_INT, k)


def test_commit_chain_representative(Fp, G):
    """The reference commit loop (zero-coeff skip, add into Z1 —
    /root/reference/kzg.py:108-117) over a setup chain
    ck[i] = multiply(G1, int(tau**i)) (kzg.py:70-75) lands on the pinned
    non-normalized representative."""
    from kzg_snark_tpu.models.kzg import KZG
    from kzg_snark_tpu.rng import Rng

    tau = 1000003
    kzg = KZG("bn254", backend="host", rng=Rng(0))
    ck, _ = kzg.setup(3, tau=tau)
    # setup chain parity: every SRS entry is the exact py_ecc representative
    for i in range(1, 4):
        assert _ints(ck[i]) == _py_multiply(G_INT, pow(tau, i, R))

    commitment = kzg.commit(ck, [[3, 0, 7, 11]])[0]
    exp = (1, 1, 0)
    for i, c in enumerate([3, 0, 7, 11]):
        if c == 0:
            continue
        exp = _py_add(exp, _py_multiply(_py_multiply(G_INT, pow(tau, i, R)), c))
    assert _ints(commitment) == exp
    digest = hashlib.sha256(str(tuple(int(c) for c in commitment)).encode())
    assert digest.hexdigest() == COMMIT_DIGEST


def test_affine_cross_validation_efd(Fp, G):
    """VERDICT r4 #9: group-law-level validation that does NOT share a
    formula source with the pinned digests.  The digests and the
    ``_py_*`` oracle both derive from py_ecc's published projective
    formulas; this test checks every pinned representative's *normalized*
    affine value against the separately written EFD Jacobian path
    (``ops/g1.py`` dbl-2009-l / madd-2007-bl over the limb backend, via
    the small-MSM double-and-add).  A shared misreading of the py_ecc
    formulas would have to coincide with an independent EFD formula
    suite to slip through."""
    from kzg_snark_tpu.ops.msm import msm_context

    ctx = msm_context("bn254")

    def oracle_affine(pt_ints):
        x, y, z = (Fp(c) for c in pt_ints)
        a = hc.normalize((x, y, z))
        return (int(a[0]), int(a[1]))

    for k in sorted(MULTIPLY_DIGESTS, key=int):
        oracle = oracle_affine(_py_multiply(G_INT, k))
        got = ctx.msm_ints([(1, 2)], [k])
        aff = ctx.curve.to_affine_ints(got)[0]
        assert aff == oracle, f"k={k}"

    # the commit-chain pinned representative, same cross-check
    tau = 1000003
    coeffs = [3, 0, 7, 11]
    total = sum(c * pow(tau, i, R) for i, c in enumerate(coeffs)) % R
    oracle = oracle_affine(_py_multiply(G_INT, total))
    got = ctx.msm_ints([(1, 2)], [total])
    assert ctx.curve.to_affine_ints(got)[0] == oracle


def test_transcript_state_with_point(Fp):
    """Full transcript chain: absorb a commit-produced projective point and
    a '>q'-packed int, derive a challenge — pinned to the independently
    computed value (reference serialization rules,
    /root/reference/transcript.py:58-100)."""
    from kzg_snark_tpu.models.kzg import KZG
    from kzg_snark_tpu.rng import Rng

    kzg = KZG("bn254", backend="host", rng=Rng(0))
    ck, _ = kzg.setup(3, tau=1000003)
    commitment = kzg.commit(ck, [[3, 0, 7, 11]])[0]

    Fr = scalar_field("bn254")
    t = Transcript("kzg-vectors", Fr)
    t.append_message("commitments", [commitment])
    t.append_message("point", 7)
    xi = t.get_challenge("xi")
    assert int(xi) == XI_CHALLENGE

    # independent re-derivation inside the test (no Transcript code)
    state = hashlib.sha256(b"kzg-vectors").digest()
    state = hashlib.sha256(
        state + b"commitments"
        + str(tuple(int(c) for c in commitment)).encode()).digest()
    state = hashlib.sha256(state + b"point" + struct.pack(">q", 7)).digest()
    ch = hashlib.sha256(state + b"xi").digest()
    assert int(xi) == int.from_bytes(ch, "big") % R
