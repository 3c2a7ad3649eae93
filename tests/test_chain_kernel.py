"""Chain-kernel correctness (interpret mode, CPU).

The whole-ripple-adder fused kernel (ops/chain_pallas.py) must match the
gate-layer full-adder chain bit for bit: same blind rotate, same key switch
samples (a and b words identical), same exact per-digit cv."""
import numpy as np
import jax.numpy as jnp
import pytest

import tfhe_tpu as tt
from tfhe_tpu import arith, gates
from tfhe_tpu.core.lwe import LweCiphertext
from tfhe_tpu.ops import chain_pallas as chp


def _ref_fa_chain(a, b, carry, cloud):
    """The production gate-layer chain the kernel replaces (arith.add body)."""
    nbits = a.batch_shape[-1]
    sums = []
    for i in range(nbits):
        si, carry = gates.full_adder(a[..., i], b[..., i], carry, cloud)
        sums.append(si)
    from tfhe_tpu.core.lwe import lwe_stack
    return lwe_stack(sums, axis=-1), carry


@pytest.mark.parametrize("B,nbits", [(1, 4), (2, 3)])
def test_chain_matches_gate_layer_bitexact(small_keys, B, nbits):
    sk = small_keys
    rng = np.random.RandomState(9)
    av = rng.randint(0, 1 << nbits, size=B)
    bv = rng.randint(0, 1 << nbits, size=B)
    ca = arith.encrypt_int(sk, av, nbits, seed=21)
    cb = arith.encrypt_int(sk, bv, nbits, seed=22)
    carry0 = gates.CONSTANT(np.zeros(B, np.int32), ca.n, (B,))

    want_s, want_c = _ref_fa_chain(ca, cb, carry0, sk.cloud)
    got_s, got_c = chp.fa_chain(ca, cb, carry0, sk.cloud, interpret=True)

    np.testing.assert_array_equal(np.asarray(got_s.a), np.asarray(want_s.a))
    np.testing.assert_array_equal(np.asarray(got_s.b), np.asarray(want_s.b))
    np.testing.assert_array_equal(np.asarray(got_c.a), np.asarray(want_c.a))
    np.testing.assert_array_equal(np.asarray(got_c.b), np.asarray(want_c.b))
    np.testing.assert_allclose(np.asarray(got_s.cv), np.asarray(want_s.cv),
                               rtol=1e-6)
    # and the decrypted sums are the arithmetic truth
    got = arith.decrypt_int(sk, got_s, signed=False)
    np.testing.assert_array_equal(got, (av + bv) % (1 << nbits))


def test_chain_sub_via_carry_in(small_keys):
    """a - b = a + NOT(b) + 1: free negation outside, carry-in 1."""
    sk = small_keys
    nbits, B = 4, 1
    av, bv = np.array([11]), np.array([5])
    ca = arith.encrypt_int(sk, av, nbits, seed=31)
    cb = arith.encrypt_int(sk, bv, nbits, seed=32)
    carry1 = gates.CONSTANT(np.ones(B, np.int32), ca.n, (B,))
    got_s, _ = chp.fa_chain(ca, gates.NOT(cb), carry1, sk.cloud, interpret=True)
    got = arith.decrypt_int(sk, got_s, signed=False)
    np.testing.assert_array_equal(got, (av - bv) % (1 << nbits))


def test_chain_ks_loop_mode_identical(small_keys, monkeypatch):
    monkeypatch.setenv("TFHE_CHAIN_KS", "loop")
    sk = small_keys
    nbits, B = 3, 1
    ca = arith.encrypt_int(sk, np.array([5]), nbits, seed=41)
    cb = arith.encrypt_int(sk, np.array([3]), nbits, seed=42)
    carry0 = gates.CONSTANT(np.zeros(B, np.int32), ca.n, (B,))
    want_s, _ = _ref_fa_chain(ca, cb, carry0, sk.cloud)
    got_s, _ = chp.fa_chain(ca, cb, carry0, sk.cloud, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_s.a), np.asarray(want_s.a))
    np.testing.assert_array_equal(np.asarray(got_s.b), np.asarray(want_s.b))


def test_arith_add_sub_route_through_chain(small_keys, monkeypatch):
    """TFHE_TPU_CHAIN=1 routes arith.add / arith.sub through the fused chain
    (auto-interpreted off-TPU) and stays arithmetically correct."""
    monkeypatch.setenv("TFHE_TPU_CHAIN", "1")
    sk = small_keys
    nbits = 4
    av, bv = np.array([9, 3]), np.array([6, 5])
    ca = arith.encrypt_int(sk, av, nbits, seed=51)
    cb = arith.encrypt_int(sk, bv, nbits, seed=52)
    got_add = arith.decrypt_int(sk, arith.add(ca, cb, sk.cloud), signed=False)
    np.testing.assert_array_equal(got_add, (av + bv) % (1 << nbits))
    got_sub = arith.decrypt_int(sk, arith.sub(ca, cb, sk.cloud), signed=False)
    np.testing.assert_array_equal(got_sub, (av - bv) % (1 << nbits))


def test_div_chain_matches_plaintext(small_keys):
    """The fused restoring-division loop (div_chain) computes |a|/|b| for
    positive inputs, interpret mode."""
    sk = small_keys
    nb = 4
    for av, bv in ((11, 3), (9, 2), (7, 7), (5, 1)):
        ca = arith.encrypt_int(sk, np.array(av), nb, seed=81)
        cb = arith.encrypt_int(sk, np.array(bv), nb, seed=82)
        neg_b = arith.twos_complement(cb, sk.cloud)
        q = chp.div_chain(ca, neg_b, sk.cloud, interpret=True)
        got = int(arith.decrypt_int(sk, q.reshape((1, nb)), signed=False)[0])
        assert got == av // bv, (av, bv, got)


def test_arith_div_routes_through_chain(small_keys, monkeypatch):
    monkeypatch.setenv("TFHE_TPU_CHAIN", "1")
    sk = small_keys
    nb = 4
    ca = arith.encrypt_int(sk, np.array(-6), nb, seed=83)
    cb = arith.encrypt_int(sk, np.array(2), nb, seed=84)
    got = int(arith.decrypt_int(sk, arith.div(ca, cb, sk.cloud)))
    assert got == -3, got


def test_chain_scans_and_compare(small_keys, monkeypatch):
    """CHAIN_TWOS and CHAIN_CMP microcode: twos_complement, gt, minimum,
    add_sign all route through fused chains and stay correct."""
    monkeypatch.setenv("TFHE_TPU_CHAIN", "1")
    sk = small_keys
    nb = 4
    av, bv = np.array(6), np.array(3)
    ca = arith.encrypt_int(sk, av, nb, seed=61)
    cb = arith.encrypt_int(sk, bv, nb, seed=62)
    assert int(arith.decrypt_int(sk, arith.twos_complement(ca, sk.cloud))) == -6
    assert int(tt.decrypt_bits(sk, arith.gt(ca, cb, sk.cloud))) == 1
    assert int(tt.decrypt_bits(sk, arith.gt(cb, ca, sk.cloud))) == 0
    assert int(arith.decrypt_int(sk, arith.minimum(ca, cb, sk.cloud))) == 3
    one = gates.CONSTANT(np.ones((), np.int32), ca.n, ())
    neg = arith.add_sign(ca, one, sk.cloud)
    assert int(arith.decrypt_int(sk, neg)) == -6


def test_chain_under_real_noise():
    """Chain kernels under PARAMS_SMALL_NOISY (reference noise levels at a
    CPU-fast ring): fused add and division decrypt correctly with real
    gaussian encryption/key noise in play."""
    import os
    sk = tt.keygen(tt.PARAMS_SMALL_NOISY, seed=(314, 1592, 657))
    nb = 5
    av, bv = np.array([13]), np.array([4])
    ca = arith.encrypt_int(sk, av, nb, seed=95)
    cb = arith.encrypt_int(sk, bv, nb, seed=96)
    os.environ["TFHE_TPU_CHAIN"] = "1"
    try:
        got = arith.decrypt_int(sk, arith.add(ca, cb, sk.cloud), signed=False)
        np.testing.assert_array_equal(got, [17])
        q = arith.div(ca.reshape((nb,)), cb.reshape((nb,)), sk.cloud)
        assert int(arith.decrypt_int(sk, q)) == 3
    finally:
        os.environ.pop("TFHE_TPU_CHAIN", None)
