"""Bit-exact tests of the CRT NTT against a numpy O(N^2) negacyclic oracle."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfhe_tpu import ntt
from tfhe_tpu import oracle


@functools.lru_cache(maxsize=None)
def _jit_roundtrip(N, p):
    return jax.jit(lambda v: ntt.ntt_inverse(ntt.ntt_forward(v, N, p), N, p))


@pytest.mark.parametrize("N", [16, 128, 1024])
def test_roundtrip(N):
    rng = np.random.RandomState(42)
    x = rng.randint(-(2 ** 31), 2 ** 31, size=(3, N)).astype(np.int32)
    for p in ntt.PRIMES:
        r = jax.jit(functools.partial(ntt.i32_to_residue, p=p))(jnp.asarray(x))
        back = np.asarray(_jit_roundtrip(N, p)(r))
        np.testing.assert_array_equal(back, np.asarray(r))


@pytest.mark.parametrize("N", [16, 128, 1024])
def test_negacyclic_polymul_exact(N):
    rng = np.random.RandomState(7)
    a = rng.randint(-512, 512, size=N).astype(np.int32)        # decomposed range
    b = rng.randint(-(2 ** 31), 2 ** 31, size=N).astype(np.int32)  # torus range
    want = oracle.negacyclic_polymul(a, b)
    got = np.asarray(ntt.negacyclic_polymul_i32(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got, want)


def test_negacyclic_polymul_batched_broadcast():
    N = 128
    rng = np.random.RandomState(3)
    a = rng.randint(0, 2, size=(2, 3, N)).astype(np.int32)     # key-like
    b = rng.randint(-(2 ** 31), 2 ** 31, size=(2, 3, N)).astype(np.int32)
    got = np.asarray(ntt.negacyclic_polymul_i32(jnp.asarray(a), jnp.asarray(b)))
    for i in range(2):
        for j in range(3):
            want = oracle.negacyclic_polymul(a[i, j], b[i, j])
            np.testing.assert_array_equal(got[i, j], want)


def test_mulmod_variants():
    rng = np.random.RandomState(0)
    for p in ntt.PRIMES:
        x = rng.randint(0, p, size=1000).astype(np.uint32)
        w = rng.randint(0, p, size=1000).astype(np.uint32)
        want = (x.astype(np.uint64) * w.astype(np.uint64)) % np.uint64(p)
        w_sh = ntt.shoup(w, p)
        got_shoup = np.asarray(jax.jit(functools.partial(ntt.mul_mod_shoup, p=p))(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(w_sh)))
        np.testing.assert_array_equal(got_shoup.astype(np.uint64), want)
        got_mont = np.asarray(jax.jit(functools.partial(ntt.mul_mod, p=p))(
            jnp.asarray(x), jnp.asarray(w)))
        np.testing.assert_array_equal(got_mont.astype(np.uint64), want)


def test_umulhi():
    rng = np.random.RandomState(1)
    a = rng.randint(0, 2 ** 32, size=2000, dtype=np.uint64).astype(np.uint32)
    b = rng.randint(0, 2 ** 32, size=2000, dtype=np.uint64).astype(np.uint32)
    want = ((a.astype(np.uint64) * b.astype(np.uint64)) >> np.uint64(32)).astype(np.uint32)
    got = np.asarray(jax.jit(ntt.umulhi)(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(got, want)


def test_crt_lift_extremes():
    # values spanning the full convolution range +-2^51
    vals = np.array([0, 1, -1, 2 ** 51 - 1, -(2 ** 51), 123456789012345, -987654321098765],
                    dtype=np.int64)
    r1 = jnp.asarray((vals % ntt.P1).astype(np.uint32))
    r2 = jnp.asarray((vals % ntt.P2).astype(np.uint32))
    got = np.asarray(jax.jit(ntt.crt_to_i32)(r1, r2))
    want = vals.astype(np.uint32).astype(np.int32)
    np.testing.assert_array_equal(got, want)
