"""Torus numeric primitives vs the numpy oracle (exact)."""
import numpy as np
import jax.numpy as jnp

from tfhe_tpu import numeric, oracle


def test_mod_switch_from_torus32():
    rng = np.random.RandomState(0)
    phases = rng.randint(-(2 ** 31), 2 ** 31, size=4096).astype(np.int32)
    for Msize in (2048, 256, 8, 3, 5, 100, 1000):
        want = oracle.mod_switch_from_torus32(phases, Msize)
        got = np.asarray(numeric.mod_switch_from_torus32(jnp.asarray(phases), Msize))
        np.testing.assert_array_equal(got, want)


def test_mod_switch_to_torus32():
    for Msize in (8, 4, 2048, 3, 7, 12):
        mus = list(range(-8, 9)) + [-Msize, Msize, Msize - 1]
        want = np.array([oracle.mod_switch_to_torus32(mu, Msize) for mu in mus])
        got = np.asarray(numeric.mod_switch_to_torus32(jnp.asarray(mus, jnp.int32), Msize))
        np.testing.assert_array_equal(got, want)


def test_approx_phase():
    rng = np.random.RandomState(0)
    phases = rng.randint(-(2 ** 31), 2 ** 31, size=1024).astype(np.int32)
    for Msize in (8, 2048, 3, 100):
        want = oracle.approx_phase(phases, Msize)
        got = np.asarray(numeric.approx_phase(jnp.asarray(phases), Msize))
        np.testing.assert_array_equal(got, want)


def test_u32_views():
    x = np.array([-1, 0, 1, -(2 ** 31), 2 ** 31 - 1], np.int32)
    u = np.asarray(numeric.to_u32(jnp.asarray(x)))
    np.testing.assert_array_equal(u, x.astype(np.uint32))
    back = np.asarray(numeric.to_i32(jnp.asarray(u)))
    np.testing.assert_array_equal(back, x)
