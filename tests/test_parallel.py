"""Multi-device sharding tests on the 8-way virtual CPU mesh."""
import numpy as np
import pytest

import jax

import tfhe_tpu as tt
from tfhe_tpu import arith
from tfhe_tpu.parallel import make_mesh, sharded_gate2
from tfhe_tpu.parallel.cannon import make_mesh2d, cannon_matmul_mesh


def test_sharded_and_gate(toy_keys):
    sk = toy_keys
    n_dev = len(jax.devices())
    assert n_dev >= 8, "conftest should provide 8 virtual devices"
    B = 2 * n_dev
    rng = np.random.RandomState(0)
    a = rng.randint(0, 2, size=B).astype(np.int32)
    b = rng.randint(0, 2, size=B).astype(np.int32)
    ca = tt.encrypt_bits(sk, a, seed=61)
    cb = tt.encrypt_bits(sk, b, seed=62)
    mesh = make_mesh(n_dev)
    out = sharded_gate2("AND", ca, cb, sk.cloud, mesh)
    np.testing.assert_array_equal(tt.decrypt_bits(sk, out), a & b)


def test_sharded_gate_tp_keyswitch(toy_keys):
    """2-D mesh: batch over dp x ks for blind rotate, KS table row-sharded
    over ks with a psum reduction (tensor parallelism for the key switch)."""
    from tfhe_tpu.parallel.mesh import make_mesh2d_dp_ks, sharded_gate2_tp_ks
    sk = toy_keys
    B = 16
    rng = np.random.RandomState(1)
    a = rng.randint(0, 2, size=B).astype(np.int32)
    b = rng.randint(0, 2, size=B).astype(np.int32)
    ca = tt.encrypt_bits(sk, a, seed=65)
    cb = tt.encrypt_bits(sk, b, seed=66)
    mesh = make_mesh2d_dp_ks(2, 4)
    out = sharded_gate2_tp_ks("AND", ca, cb, sk.cloud, mesh)
    np.testing.assert_array_equal(tt.decrypt_bits(sk, out), a & b)


@pytest.mark.slow
def test_cannon_mesh_2x2(toy_keys):
    sk = toy_keys
    NB = 4
    a = np.array([[1, 2], [0, 3]], np.int64)
    b = np.array([[2, 1], [1, 1]], np.int64)
    ca = arith.encrypt_int(sk, a, NB, seed=63)
    cb = arith.encrypt_int(sk, b, NB, seed=64)
    mesh = make_mesh2d(2)
    got = arith.decrypt_int(sk, cannon_matmul_mesh(ca, cb, sk.cloud, mesh))
    np.testing.assert_array_equal(got, a @ b)
