"""Pallas fused-kernel correctness in interpreter mode (runs on CPU).

The real-hardware differential check (Pallas vs XLA paths on TPU) runs in
tools/verify_pallas_tpu.py; these tests validate the same kernels through the
Pallas interpreter so CI without a TPU still covers the kernel math.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfhe_tpu import ntt
from tfhe_tpu.params import PARAMS_TOY
from tfhe_tpu.core import bootstrap as bs
from tfhe_tpu.ops import cmux_pallas as cp


def _bk_rows(bk, bksh, params):
    N, kpl, k = params.N, params.kpl, params.k
    r = bk.transpose(0, 3, 1, 2).reshape(2, N, kpl * (k + 1))
    rs = bksh.transpose(0, 3, 1, 2).reshape(2, N, kpl * (k + 1))
    return jnp.asarray(r), jnp.asarray(rs)


@pytest.fixture(scope="module")
def rand_bk():
    params = PARAMS_TOY
    rng = np.random.RandomState(3)
    bk = np.stack([rng.randint(0, p, size=(params.kpl, params.k + 1, params.N),
                               dtype=np.int64).astype(np.uint32) for p in ntt.PRIMES])
    bksh = np.stack([ntt.shoup(bk[i], p) for i, p in enumerate(ntt.PRIMES)])
    return bk, bksh


def test_cmux_delta_matches_xla(rand_bk):
    params = PARAMS_TOY
    N, kpl, k, B = params.N, params.kpl, params.k, 8
    rng = np.random.RandomState(4)
    dec = rng.randint(-params.halfBg, params.halfBg, size=(B, kpl, N)).astype(np.int32)
    bk, bksh = rand_bk
    want = np.asarray(jax.jit(
        lambda d, w, ws: bs.extern_product_ntt(d, w, ws, params)
    )(jnp.asarray(dec), jnp.asarray(bk), jnp.asarray(bksh)))
    bkr, bkrs = _bk_rows(bk, bksh, params)
    got = cp.cmux_delta(jnp.asarray(dec.transpose(1, 2, 0)), bkr, bkrs,
                        params, interpret=True)
    np.testing.assert_array_equal(np.asarray(got).transpose(2, 0, 1), want)


def test_blind_rotate_step_matches_xla(rand_bk):
    params = PARAMS_TOY
    N, k, B = params.N, params.k, 8
    rng = np.random.RandomState(5)
    acc = rng.randint(-(2 ** 31), 2 ** 31, size=(B, k + 1, N)).astype(np.int32)
    bara = rng.randint(0, 2 * N, size=(B,)).astype(np.int32)
    bk, bksh = rand_bk

    # XLA single step
    rot = bs.negacyclic_rotate(jnp.asarray(acc), jnp.asarray(bara))
    dec = bs.gadget_decompose(rot - jnp.asarray(acc), params)
    delta = bs.extern_product_ntt(dec, jnp.asarray(bk), jnp.asarray(bksh), params)
    want = np.asarray(jnp.asarray(acc) + delta)

    bkr, bkrs = _bk_rows(bk, bksh, params)
    got = cp.blind_rotate_step(
        jnp.asarray(acc.transpose(1, 2, 0)), jnp.asarray(bara)[None, :],
        bkr, bkrs, params, interpret=True)
    np.testing.assert_array_equal(np.asarray(got).transpose(2, 0, 1), want)


def test_blind_rotate_packed_matches_xla(small_keys):
    """Packed small-batch kernel (interpret mode) vs the XLA scan path,
    bit-identical accumulators after a full blind rotate (N=256, B=3)."""
    from tfhe_tpu.params import PARAMS_SMALL
    from tfhe_tpu.ops import cmux_pallas_packed as cpp
    sk = small_keys
    params = PARAMS_SMALL
    N, k, n = params.N, params.k, params.n
    B = 3
    rng = np.random.RandomState(11)
    acc = jnp.asarray(rng.randint(-2**31, 2**31, size=(B, k + 1, N)).astype(np.int32))
    bara = jnp.asarray(rng.randint(0, 2 * N, size=(B, n)).astype(np.int32))

    want = bs.blind_rotate(acc, bara, sk.cloud.bk_ntt, sk.cloud.bk_ntt_shoup, params)

    acc_p = jnp.asarray(np.asarray(acc)).transpose(1, 0, 2).reshape((k + 1) * B, N // 128, 128)
    out_p = cpp.blind_rotate_fused_packed(
        acc_p, bara.T, sk.cloud.bk_ntt, sk.cloud.bk_ntt_shoup, params, interpret=True)
    got = np.asarray(out_p).reshape(k + 1, B, N).transpose(1, 0, 2)
    np.testing.assert_array_equal(got, np.asarray(want))


def test_bootstrap_fused_ks_matches_default(small_keys, monkeypatch):
    """TFHE_TPU_FUSEKS=1: blind rotate + extract + key switch as ONE kernel
    (lane layout, interpret mode) — bit-identical samples and exact cv vs
    the default extract + one-hot-matmul path."""
    import tfhe_tpu as tt
    from tfhe_tpu import gates
    from tfhe_tpu.core.crypt import encrypt_bits

    sk = small_keys
    rng = np.random.RandomState(12)
    B = 96   # > PACKED_MAX_BATCH so the lane path is the one being fused
    bits = rng.randint(0, 2, size=(B,)).astype(np.int32)
    ct = encrypt_bits(sk, bits, seed=91)
    x = jax.tree.map(lambda v: v, ct)

    monkeypatch.delenv("TFHE_TPU_FUSEKS", raising=False)
    want = bs.bootstrap(x, jnp.int32(gates.MU), sk.cloud)
    monkeypatch.setenv("TFHE_TPU_FUSEKS", "1")
    got = bs.bootstrap(x, jnp.int32(gates.MU), sk.cloud)

    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(want.a))
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(want.b))
    np.testing.assert_allclose(np.asarray(got.cv), np.asarray(want.cv), rtol=1e-6)
