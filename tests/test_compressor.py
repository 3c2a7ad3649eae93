"""7:3 septet compressor and ±1/16 full-adder exactness (toy params).

The compressor extends the reference's coefficient trick (XOR rides coeff 2,
boot-gates.cu:198) to 7-input popcount digit extraction at amplitude ±1/16 —
see the septet section of gates.py. These tests drive the machinery through
`arith._wallace_sum_bits` and the gate entry points over EXHAUSTIVE input
truth tables as one batch.
"""
import os

import numpy as np
import pytest

import tfhe_tpu as tt
from tfhe_tpu import arith, gates


def _bits16(sk, bits):
    """Encrypt bits, then refresh into the ±1/16 compressor encoding via an
    identity gate with mu=MU16 (OR(x, x) = x)."""
    ct = tt.encrypt_bits(sk, np.asarray(bits, np.int32), seed=7)
    return gates.gate2("OR", ct, ct, sk.cloud, mu=gates.MU16)


def test_septet_popcount_exhaustive(toy_keys):
    """All 128 combinations of 7 input bits: the compressor reduces a single
    7-high column to the 3 popcount digits (one septet level + ripple)."""
    sk = toy_keys
    combos = np.array([[(v >> i) & 1 for i in range(7)] for v in range(128)])
    cur = _bits16(sk, combos)                       # [128, 7] at ±1/16
    out = arith._wallace_sum_bits(cur, np.zeros(7, np.int64), 4, sk.cloud,
                                  amp=np.full(7, 16))
    got = arith.decrypt_int(sk, out, signed=False)
    np.testing.assert_array_equal(got, combos.sum(axis=1))


def test_full_adder16_exhaustive(toy_keys):
    """All 8 combinations of (a, b, cin) at ±1/16; sum re-encoded to ±1/8."""
    sk = toy_keys
    combos = np.array([[(v >> i) & 1 for i in range(3)] for v in range(8)])
    cts = _bits16(sk, combos)                       # [8, 3]
    s, c = gates.full_adder16(cts[:, 0], cts[:, 1], cts[:, 2], sk.cloud,
                              mu_sum=gates.MU, mu_carry=gates.MU16)
    tot = combos.sum(axis=1)
    np.testing.assert_array_equal(tt.decrypt_bits(sk, s), tot & 1)
    # carry is ±1/16-encoded; decrypt_bits is sign-based so it still reads
    np.testing.assert_array_equal(tt.decrypt_bits(sk, c), tot >> 1)


def test_mixed_amplitude_columns(toy_keys):
    """Columns mixing fresh ±1/8 bits with ±1/16 bits exercise the FA8
    conversion, the stall-breaker, and the stray-recode finale: sum 5 user
    bits (±1/8) and 5 compressor bits (±1/16) in one column."""
    sk = toy_keys
    rng = np.random.RandomState(3)
    bits = rng.randint(0, 2, size=(6, 10))
    c8 = tt.encrypt_bits(sk, bits[:, :5].astype(np.int32), seed=11)
    c16 = _bits16(sk, bits[:, 5:])
    from tfhe_tpu.core.lwe import lwe_concat
    cur = lwe_concat([c8, c16], axis=-1)            # [6, 10]
    out = arith._wallace_sum_bits(
        cur, np.zeros(10, np.int64), 4, sk.cloud,
        amp=np.array([8] * 5 + [16] * 5))
    got = arith.decrypt_int(sk, out, signed=False)
    np.testing.assert_array_equal(got, bits.sum(axis=1))


def test_septet_vs_fa_paths_agree(toy_keys):
    """The septet path and the full-adder Dadda fallback compute the same
    truncated product on random inputs."""
    sk = toy_keys
    a = np.array([3, 5, 7, 2], np.int64)
    b = np.array([2, 7, 5, 6], np.int64)
    ca = arith.encrypt_int(sk, a, 4, seed=21)
    cb = arith.encrypt_int(sk, b, 4, seed=22)
    # force the septet leg explicitly: the width-aware default picks the FA
    # path below 32 bits, which would silently compare FA against FA
    os.environ["TFHE_TPU_SEPTET"] = "1"
    try:
        got_sep = arith.decrypt_int(sk, arith.mul(ca, cb, sk.cloud))
        os.environ["TFHE_TPU_SEPTET"] = "0"
        got_fa = arith.decrypt_int(sk, arith.mul(ca, cb, sk.cloud))
    finally:
        del os.environ["TFHE_TPU_SEPTET"]
    np.testing.assert_array_equal(got_sep, got_fa)
    want = ((a * b) & 0xF)
    want = np.where(want & 8, want - 16, want)
    np.testing.assert_array_equal(got_sep, want)
