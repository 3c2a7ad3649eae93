"""Vector/matrix ops and Karatsuba vs plain integer semantics (toy params)."""
import numpy as np
import pytest

import tfhe_tpu as tt
from tfhe_tpu import arith, linalg

NB = 4


def _signed(v):
    v = int(v) & 0xF
    return v - 16 if v & 8 else v


def test_vector_add_mul(toy_keys):
    sk = toy_keys
    a = np.array([1, 2, 3, 4], np.int64)
    b = np.array([3, 1, 2, 2], np.int64)
    ca = arith.encrypt_int(sk, a, NB, seed=41)
    cb = arith.encrypt_int(sk, b, NB, seed=42)
    vs = arith.decrypt_int(sk, linalg.vector_add(ca, cb, sk.cloud))
    np.testing.assert_array_equal(vs, [_signed(x + y) for x, y in zip(a, b)])
    vm = arith.decrypt_int(sk, linalg.vector_mul(ca, cb, sk.cloud))
    np.testing.assert_array_equal(vm, [_signed(x * y) for x, y in zip(a, b)])


def test_vector_sum(toy_keys):
    sk = toy_keys
    a = np.array([1, 2, 3, 1], np.int64)
    ca = arith.encrypt_int(sk, a, NB, seed=43)
    s = arith.decrypt_int(sk, linalg.vector_sum(ca, sk.cloud))
    assert s == 7


def test_vector_sum_csa_vs_tree(toy_keys):
    """The carry-save reduction equals the reference-shaped pairwise tree on
    every row-count class mod 3 (exercises the leftover-rows path and the
    final 1- and 2-row terminations)."""
    sk = toy_keys
    for L in (2, 3, 5, 7):
        a = np.arange(1, L + 1, dtype=np.int64)
        ca = arith.encrypt_int(sk, a, NB, seed=50 + L)
        got_csa = arith.decrypt_int(sk, arith._csa_reduce_rows(ca, sk.cloud))
        got_tree = arith.decrypt_int(
            sk, arith._tree_sum_rows(ca, arith.add, sk.cloud))
        want = int(a.sum()) & ((1 << NB) - 1)
        want = want - (1 << NB) if want & (1 << (NB - 1)) else want
        assert int(got_csa) == want == int(got_tree)


def test_dot_fused(toy_keys):
    """arith.dot (fused carry-save contraction) == plaintext inner product,
    including a leading batch axis and the mod-2^nbits wrap."""
    sk = toy_keys
    a = np.array([[1, 2, 3], [7, 5, 2]], np.int64)     # [B=2, K=3]
    b = np.array([[3, 1, 2], [1, 3, 4]], np.int64)
    ca = arith.encrypt_int(sk, a, NB, seed=60)          # [2, 3, NB]
    cb = arith.encrypt_int(sk, b, NB, seed=61)
    got = arith.decrypt_int(sk, arith.dot(ca, cb, sk.cloud))
    want = [_signed((x * y).sum()) for x, y in zip(a, b)]
    np.testing.assert_array_equal(got, want)


def test_matmul_2x2(toy_keys):
    sk = toy_keys
    a = np.array([[1, 2], [0, 3]], np.int64)
    b = np.array([[2, 1], [1, 1]], np.int64)
    ca = arith.encrypt_int(sk, a, NB, seed=44)
    cb = arith.encrypt_int(sk, b, NB, seed=45)
    got = arith.decrypt_int(sk, linalg.matmul(ca, cb, sk.cloud))
    np.testing.assert_array_equal(got, a @ b)


@pytest.mark.slow
def test_cannon_2x2(toy_keys):
    sk = toy_keys
    a = np.array([[1, 2], [0, 3]], np.int64)
    b = np.array([[2, 1], [1, 1]], np.int64)
    ca = arith.encrypt_int(sk, a, NB, seed=46)
    cb = arith.encrypt_int(sk, b, NB, seed=47)
    got = arith.decrypt_int(sk, linalg.cannon_matmul(ca, cb, sk.cloud))
    np.testing.assert_array_equal(got, a @ b)


def test_karatsuba(toy_keys):
    sk = toy_keys
    a = np.array([3, 5, 7], np.int64)
    b = np.array([2, 3, 1], np.int64)
    ca = arith.encrypt_int(sk, a, NB, seed=48)
    cb = arith.encrypt_int(sk, b, NB, seed=49)
    got = arith.decrypt_int(sk, arith.mul_karatsuba(ca, cb, sk.cloud))
    np.testing.assert_array_equal(got, [_signed(x * y) for x, y in zip(a, b)])


def test_cipher_int_api(toy_keys):
    sk = toy_keys
    x = tt.CipherInt.encrypt(sk, 5, NB, seed=50)
    y = tt.CipherInt.encrypt(sk, 3, NB, seed=51)
    assert (x + y).decrypt(sk) == -8  # 8 wraps to -8 in 4-bit two's complement
    assert (x - y).decrypt(sk) == 2
    assert (x * y).decrypt(sk) == _signed(15)
    gt = tt.decrypt_bits(sk, x > y)
    assert gt == 1
