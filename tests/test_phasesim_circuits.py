"""Exact-DAG validation of the full arithmetic surface at PARAMS_110 widths.

The phase simulator (utils/phasesim.py) replays the production circuits with
exact sign evaluation, so every op can be checked against plain-int semantics
at the REAL parameter set and bit widths in milliseconds — coverage the
toy-parameter crypto tests can't reach (they validate noise/crypto, not the
16/32-bit wiring). Catches planner/truncation/sign bugs in the big DAGs."""
import numpy as np
import pytest

from tfhe_tpu.params import PARAMS_110
from tfhe_tpu.utils import phasesim as ps
from tfhe_tpu import arith, gates


def _sim():
    return ps.PhaseSim(PARAMS_110)


def _enc(sim, v, nb):
    return sim.encrypt_int(np.asarray(v), nb)


CASES = [(51234, 777), (1, 65535), (40000, 40000), (12345, 1)]


def test_mul16_and_karatsuba_exact():
    for av, bv in CASES:
        with _sim() as sim:
            a, b = _enc(sim, av, 16), _enc(sim, bv, 16)
            got = int(sim.decrypt_int(arith.mul(a, b, sim.cloud),
                                      signed=False)) % (1 << 16)
            assert got == (av * bv) % (1 << 16)
    with _sim() as sim:
        a, b = _enc(sim, 51234, 16), _enc(sim, 777, 16)
        got = int(sim.decrypt_int(arith.mul_karatsuba(a, b, sim.cloud),
                                  signed=False)) % (1 << 16)
        assert got == (51234 * 777) % (1 << 16)


def test_mul_mux_and_mul_plain_exact():
    with _sim() as sim:
        a, b = _enc(sim, 321, 10), _enc(sim, 55, 10)
        got = int(sim.decrypt_int(arith.mul_mux(a, b, sim.cloud),
                                  signed=False)) % (1 << 10)
        assert got == (321 * 55) % (1 << 10)
        got = int(sim.decrypt_int(arith.mul_plain(a, 201, sim.cloud),
                                  signed=False)) % (1 << 10)
        assert got == (321 * 201) % (1 << 10)


def test_div16_signed_exact():
    for av, bv in ((12345, 17), (-9000, 13), (700, -7), (-64, -8)):
        with _sim() as sim:
            a, b = _enc(sim, av, 16), _enc(sim, bv, 16)
            got = int(sim.decrypt_int(arith.div(a, b, sim.cloud)))
            import math
            want = int(abs(av) // abs(bv)) * (1 if (av < 0) == (bv < 0) else -1)
            assert got == want, (av, bv, got, want)


def test_compare_minimum_abs_exact():
    for av, bv in ((12345, 12346), (-5, 3), (700, 700), (-10, -2)):
        with _sim() as sim:
            a, b = _enc(sim, av, 16), _enc(sim, bv, 16)
            assert int(sim.decrypt_bits(arith.gt(a, b, sim.cloud))) == int(av > bv)
            assert int(sim.decrypt_bits(arith.le(a, b, sim.cloud))) == int(av <= bv)
            assert int(sim.decrypt_bits(arith.eq(a, b, sim.cloud))) == int(av == bv)
            assert int(sim.decrypt_int(arith.absolute(a, sim.cloud))) == abs(av)
    with _sim() as sim:
        a, b = _enc(sim, 19, 16), _enc(sim, 55, 16)
        assert int(sim.decrypt_int(arith.minimum(a, b, sim.cloud))) == 19


def test_add_sub_shift_exact():
    for av, bv in ((51234, 31111), (-2, 5), (65535, 1)):
        with _sim() as sim:
            a, b = _enc(sim, av, 16), _enc(sim, bv, 16)
            assert int(sim.decrypt_int(arith.add(a, b, sim.cloud),
                                       signed=False)) == (av + bv) % (1 << 16)
            assert int(sim.decrypt_int(arith.sub(a, b, sim.cloud),
                                       signed=False)) == (av - bv) % (1 << 16)
            assert int(sim.decrypt_int(arith.add_numberwise(a, b, sim.cloud),
                                       signed=False)) == (av + bv) % (1 << 16)
    with _sim() as sim:
        # the reference's negative-rounding correction adds sign?1:0
        # UNCONDITIONALLY (Cipher.cpp:470-480), so an exactly-divisible
        # negative comes out one above trunc: -1000>>3 -> -124 (its
        # semantics, ported faithfully); without the correction: floor.
        a = _enc(sim, -1000, 16)
        got = int(sim.decrypt_int(arith.right_shift_arith(a, 3, sim.cloud)))
        assert got == -124
        got = int(sim.decrypt_int(arith.right_shift_arith(a, 3, None)))
        assert got == -125
        with _sim() as sim2:
            a = sim2.encrypt_int(np.asarray(-1001), 16)
            got = int(sim2.decrypt_int(arith.right_shift_arith(a, 3, sim2.cloud)))
            assert got == -125      # inexact: trunc, "like positives"


def test_vector_and_dot_exact():
    from tfhe_tpu import linalg
    with _sim() as sim:
        av = np.array([3, 5, 250, 7])
        bv = np.array([9, 11, 2, 255])
        a = sim.encrypt_int(av, 16).reshape((4, 16))
        b = sim.encrypt_int(bv, 16).reshape((4, 16))
        got = int(sim.decrypt_int(arith.dot(a, b, sim.cloud),
                                  signed=False)) % (1 << 16)
        assert got == int(np.dot(av, bv)) % (1 << 16)
        got = sim.decrypt_int(linalg.vector_sum(a, sim.cloud), signed=False)
        assert int(got) == int(av.sum())


def test_matmul_exact_2x2():
    from tfhe_tpu import linalg
    with _sim() as sim:
        ma = np.array([[3, 1], [2, 5]])
        mb = np.array([[4, 7], [6, 2]])
        a = sim.encrypt_int(ma, 8).reshape((2, 2, 8))
        b = sim.encrypt_int(mb, 8).reshape((2, 2, 8))
        got = sim.decrypt_int(linalg.matmul(a, b, sim.cloud), signed=False)
        np.testing.assert_array_equal(got, (ma @ mb) % 256)
