"""End-to-end app-layer tests: the Alice/cloud/verify trust split over
reference-format files (cpuParallel/main.cpp + cloud.cpp workflow) and the
linear-regression demo (paper Table X)."""
import os

import numpy as np
import pytest

import tfhe_tpu as tt
from tfhe_tpu import arith, io as tio
from tfhe_tpu.apps import alice, cloud, verify


def test_alice_cloud_verify_roundtrip(tmp_path):
    """Full client/cloud/client flow through secret.key / cloud.key /
    cloud.data / answer.data files, toy params, 4-bit add."""
    d = str(tmp_path)
    alice.main(["5", "3", "--bits", "4", "--dir", d, "--params", "toy"])
    assert os.path.exists(os.path.join(d, "secret.key"))
    assert os.path.exists(os.path.join(d, "cloud.key"))
    cloud.main(["--op", "add", "--bits", "4", "--dir", d])
    got = verify.main(["--bits", "4", "--dir", d])
    assert got == 5 + 3 - 16  # 8 wraps to -8 in 4-bit two's complement


def test_linreg_toy(toy_keys):
    """Encrypted simple linear regression on a tiny exact dataset:
    y = 2x + 1 over x in {1,2,3,4} -> b1 = 2, b0 = 1."""
    from tfhe_tpu.apps.linreg import linear_regression
    sk = toy_keys
    nb = 8
    x = np.array([1, 2, 3, 4], np.int64)
    y = 2 * x + 1
    cx = arith.encrypt_int(sk, x, nb, seed=71)
    cy = arith.encrypt_int(sk, y, nb, seed=72)
    b1, b0 = linear_regression(cx, cy, sk.cloud)
    assert int(arith.decrypt_int(sk, b1)) == 2
    assert int(arith.decrypt_int(sk, b0)) == 1


def test_linreg_binary(toy_keys):
    """Binary-attribute linear regression (paper Table X 'Binary' column):
    x in {0,1}, y = 3x + 2 -> b1 = 3, b0 = 2."""
    from tfhe_tpu.apps.linreg import linear_regression_binary
    sk = toy_keys
    nb = 8
    x = np.array([0, 1, 0, 1], np.int64)
    y = 3 * x + 2
    cx = tt.encrypt_bits(sk, x.astype(np.int32), seed=73)
    cy = arith.encrypt_int(sk, y, nb, seed=74)
    b1, b0 = linear_regression_binary(cx, cy, sk.cloud)
    assert int(arith.decrypt_int(sk, b1)) == 3
    assert int(arith.decrypt_int(sk, b0)) == 2
