"""Device limb-field backend vs the exact host oracle.

Sizes are kept small: these validate kernel semantics; scale is bench.py's
job.  The persistent XLA cache (conftest) amortizes compile time.
"""

import random

import jax
import pytest

from kzg_snark_tpu.ops.fr import fr_backend, fq_backend, ints_to_limb_array

BACKENDS = {
    "bn254_r": lambda: fr_backend("bn254"),
    "bn254_p": lambda: fq_backend("bn254"),
    "bls12_381_p": lambda: fq_backend("bls12_381"),
}

rng = random.Random(99)


def sample(p, n=32):
    xs = [rng.randrange(p) for _ in range(n - 4)]
    return [0, 1, p - 1, (p - 1) // 2] + xs


@pytest.fixture(params=list(BACKENDS), scope="module")
def backend(request):
    return BACKENDS[request.param]()


def test_roundtrip(backend):
    p = backend.modulus
    xs = sample(p)
    assert backend.to_ints(backend.from_ints(xs)) == xs


def test_add_sub_neg(backend):
    p = backend.modulus
    xs, ys = sample(p), sample(p)
    a, b = backend.from_ints(xs), backend.from_ints(ys)
    assert backend.to_ints(backend.add(a, b)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert backend.to_ints(backend.sub(a, b)) == [(x - y) % p for x, y in zip(xs, ys)]
    assert backend.to_ints(backend.neg(a)) == [(-x) % p for x in xs]


def test_mul_square(backend):
    p = backend.modulus
    xs, ys = sample(p), sample(p)
    a, b = backend.from_ints(xs), backend.from_ints(ys)
    assert backend.to_ints(backend.mul(a, b)) == [(x * y) % p for x, y in zip(xs, ys)]
    assert backend.to_ints(backend.square(a)) == [(x * x) % p for x in xs]


def test_mul_broadcast_scalar(backend):
    p = backend.modulus
    xs = sample(p)
    a = backend.from_ints(xs)
    s = backend.scalar(12345)
    assert backend.to_ints(backend.mul(a, s)) == [(x * 12345) % p for x in xs]


def test_mul_rank_mismatch_alignment(backend):
    """(L, m, n) times (L, 1, n) and (L, n): the limb axis must stay put."""
    import jax.numpy as jnp
    p = backend.modulus
    xs = sample(p, 12)
    a = backend.from_ints(xs).reshape(backend.num_limbs, 3, 4)
    s = backend.scalar(7)                      # (L, 1)
    out = backend.mul(a, s[:, :, None] if False else s[:, None])
    expect = [(x * 7) % p for x in xs]
    assert backend.to_ints(out) == expect


def test_inv(backend):
    p = backend.modulus
    xs = [x for x in sample(p) if x != 0]
    a = backend.from_ints(xs)
    assert backend.to_ints(backend.inv(a)) == [pow(x, -1, p) for x in xs]


def test_batch_inv(backend):
    p = backend.modulus
    xs = sample(p)   # includes 0: must map to 0
    a = backend.from_ints(xs)
    got = backend.to_ints(backend.batch_inv(a, lanes=8))
    assert got == [pow(x, -1, p) if x else 0 for x in xs]


def test_pow_const(backend):
    p = backend.modulus
    xs = sample(p, 8)
    a = backend.from_ints(xs)
    for e in (0, 1, 2, 65537):
        assert backend.to_ints(backend.pow_const(a, e)) == [pow(x, e, p) for x in xs]


def test_mont_conversion(backend):
    p = backend.modulus
    xs = sample(p, 8)
    a = backend.from_ints(xs)
    canon = backend.from_mont(a)
    # canonical limbs decode directly (no R factor)
    import numpy as np
    mat = np.asarray(jax.device_get(canon))
    vals = [sum(int(mat[i, j]) << (16 * i) for i in range(backend.num_limbs))
            for j in range(mat.shape[1])]
    assert vals == xs
    assert backend.to_ints(backend.to_mont(canon)) == xs


def test_ints_to_limb_array():
    vals = [0, 1, (1 << 255) - 19]
    mat = ints_to_limb_array(vals, 16)
    assert mat.shape == (16, 3)
    got = [sum(int(mat[i, j]) << (16 * i) for i in range(16)) for j in range(3)]
    assert got == vals
