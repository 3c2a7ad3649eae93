"""Exhaustive truth-table tests for all gates (toy params, deterministic)."""
import numpy as np
import pytest

import tfhe_tpu as tt
from tfhe_tpu import gates

TRUTH = {
    "AND":   lambda a, b: a & b,
    "OR":    lambda a, b: a | b,
    "NAND":  lambda a, b: 1 - (a & b),
    "NOR":   lambda a, b: 1 - (a | b),
    "XOR":   lambda a, b: a ^ b,
    "XNOR":  lambda a, b: 1 - (a ^ b),
    "ANDNY": lambda a, b: (1 - a) & b,
    "ANDYN": lambda a, b: a & (1 - b),
    "ORNY":  lambda a, b: (1 - a) | b,
    "ORYN":  lambda a, b: a | (1 - b),
}

A = np.array([0, 0, 1, 1], np.int32)
B = np.array([0, 1, 0, 1], np.int32)


def test_all_two_input_gates(toy_keys):
    sk = toy_keys
    ca = tt.encrypt_bits(sk, A, seed=3)
    cb = tt.encrypt_bits(sk, B, seed=4)
    for name, fn in TRUTH.items():
        out = gates.gate2(name, ca, cb, sk.cloud)
        got = tt.decrypt_bits(sk, out)
        want = fn(A, B)
        np.testing.assert_array_equal(got, want, err_msg=name)


def test_compound_gate_pair(toy_keys):
    sk = toy_keys
    ca = tt.encrypt_bits(sk, A, seed=5)
    cb = tt.encrypt_bits(sk, B, seed=6)
    out_and, out_xor = gates.gate2_pair("AND", "XOR", ca, cb, ca, cb, sk.cloud)
    np.testing.assert_array_equal(tt.decrypt_bits(sk, out_and), A & B)
    np.testing.assert_array_equal(tt.decrypt_bits(sk, out_xor), A ^ B)


def test_not_copy_constant(toy_keys):
    sk = toy_keys
    ca = tt.encrypt_bits(sk, A, seed=7)
    np.testing.assert_array_equal(tt.decrypt_bits(sk, gates.NOT(ca)), 1 - A)
    np.testing.assert_array_equal(tt.decrypt_bits(sk, gates.COPY(ca)), A)
    const = gates.CONSTANT(np.array([1, 0, 1, 0], np.int32), sk.params.n, (4,))
    np.testing.assert_array_equal(tt.decrypt_bits(sk, const), [1, 0, 1, 0])


def test_mux_exhaustive(toy_keys):
    sk = toy_keys
    a = np.array([0, 0, 0, 0, 1, 1, 1, 1], np.int32)
    b = np.array([0, 0, 1, 1, 0, 0, 1, 1], np.int32)
    c = np.array([0, 1, 0, 1, 0, 1, 0, 1], np.int32)
    ca = tt.encrypt_bits(sk, a, seed=8)
    cb = tt.encrypt_bits(sk, b, seed=9)
    cc = tt.encrypt_bits(sk, c, seed=10)
    out = gates.MUX(ca, cb, cc, sk.cloud)
    want = np.where(a != 0, b, c)
    np.testing.assert_array_equal(tt.decrypt_bits(sk, out), want)


def test_gate_batch_shapes(toy_keys):
    sk = toy_keys
    a = np.array([[0, 1], [1, 1]], np.int32)
    b = np.array([[1, 1], [0, 1]], np.int32)
    out = gates.AND(tt.encrypt_bits(sk, a, seed=11), tt.encrypt_bits(sk, b, seed=12), sk.cloud)
    np.testing.assert_array_equal(tt.decrypt_bits(sk, out), a & b)


def test_large_batch_chunked(toy_keys):
    """Batches beyond LANE_MAX_BATCH run through the lax.map chunked pipeline
    (equal chunks + remainder) — the bootsLimit analog."""
    sk = toy_keys
    B = 2 * 256 + 37
    rng = np.random.RandomState(3)
    a = rng.randint(0, 2, size=B).astype(np.int32)
    b = rng.randint(0, 2, size=B).astype(np.int32)
    ca = tt.encrypt_bits(sk, a, seed=55)
    cb = tt.encrypt_bits(sk, b, seed=56)
    out = gates.AND(ca, cb, sk.cloud)
    np.testing.assert_array_equal(tt.decrypt_bits(sk, out), a & b)


def test_pair_and_mux_chunked(toy_keys):
    """Compound gates and MUX split oversized batches (2B > GATE_CHUNK)."""
    sk = toy_keys
    B = 140                      # 2*140 = 280 > 256
    rng = np.random.RandomState(4)
    a = rng.randint(0, 2, size=B).astype(np.int32)
    b = rng.randint(0, 2, size=B).astype(np.int32)
    s = rng.randint(0, 2, size=B).astype(np.int32)
    ca = tt.encrypt_bits(sk, a, seed=57)
    cb = tt.encrypt_bits(sk, b, seed=58)
    cs = tt.encrypt_bits(sk, s, seed=59)
    g_and, g_xor = gates.gate2_pair("AND", "XOR", ca, cb, ca, cb, sk.cloud)
    np.testing.assert_array_equal(tt.decrypt_bits(sk, g_and), a & b)
    np.testing.assert_array_equal(tt.decrypt_bits(sk, g_xor), a ^ b)
    m = gates.MUX(cs, ca, cb, sk.cloud)
    np.testing.assert_array_equal(tt.decrypt_bits(sk, m), np.where(s, a, b))


def test_maj_xor3_fa_exhaustive(toy_keys):
    """Exhaustive truth tables for the 3-input single-bootstrap gates
    (MAJ / XOR3) and the 2-bootstrap full adder."""
    sk = toy_keys
    A3 = np.array([c >> 2 & 1 for c in range(8)], np.int32)
    B3 = np.array([c >> 1 & 1 for c in range(8)], np.int32)
    C3 = np.array([c & 1 for c in range(8)], np.int32)
    ca = tt.encrypt_bits(sk, A3, seed=21)
    cb = tt.encrypt_bits(sk, B3, seed=22)
    cc = tt.encrypt_bits(sk, C3, seed=23)
    maj = tt.decrypt_bits(sk, gates.MAJ(ca, cb, cc, sk.cloud))
    np.testing.assert_array_equal(maj, (A3 + B3 + C3 >= 2).astype(np.int32))
    par = tt.decrypt_bits(sk, gates.XOR3(ca, cb, cc, sk.cloud))
    np.testing.assert_array_equal(par, (A3 ^ B3 ^ C3))
    s, cy = gates.full_adder(ca, cb, cc, sk.cloud)
    np.testing.assert_array_equal(tt.decrypt_bits(sk, s), A3 ^ B3 ^ C3)
    np.testing.assert_array_equal(tt.decrypt_bits(sk, cy),
                                  (A3 + B3 + C3 >= 2).astype(np.int32))


def test_fa_trivial_carry_in(toy_keys):
    """full_adder with a noiseless trivial carry (the sub() carry-in=1 path)."""
    sk = toy_keys
    A3 = np.array([0, 0, 1, 1], np.int32)
    B3 = np.array([0, 1, 0, 1], np.int32)
    ca = tt.encrypt_bits(sk, A3, seed=24)
    cb = tt.encrypt_bits(sk, B3, seed=25)
    one = gates.CONSTANT(np.ones(4, np.int32), ca.n, (4,))
    s, cy = gates.full_adder(ca, cb, one, sk.cloud)
    np.testing.assert_array_equal(tt.decrypt_bits(sk, s), A3 ^ B3 ^ 1)
    np.testing.assert_array_equal(tt.decrypt_bits(sk, cy),
                                  (A3 + B3 + 1 >= 2).astype(np.int32))
