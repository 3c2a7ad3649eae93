"""Round-trip tests of the reference-compatible serialization."""
import io as pyio

import numpy as np

import tfhe_tpu as tt
from tfhe_tpu import io as tio
from tfhe_tpu.core import bootstrap as bs


def test_params_roundtrip():
    buf = pyio.BytesIO()
    tio.write_gate_bootstrapping_params(buf, tt.PARAMS_110)
    buf.seek(0)
    p = tio.read_gate_bootstrapping_params(buf)
    assert p.n == 500 and p.N == 1024 and p.bk_l == 2 and p.ks_t == 8
    # stdevs round-trip through the reference's lossy %.8f format
    assert abs(p.ks_stdev - tt.PARAMS_110.ks_stdev) < 1e-8


def test_secret_keyset_roundtrip(toy_keys):
    sk = toy_keys
    buf = pyio.BytesIO()
    tio.export_secret_keyset(buf, sk)
    buf.seek(0)
    sk2 = tio.import_secret_keyset(buf)
    np.testing.assert_array_equal(sk2.lwe_key, sk.lwe_key)
    np.testing.assert_array_equal(sk2.tlwe_key, sk.tlwe_key)
    np.testing.assert_array_equal(sk2.bk_raw, sk.bk_raw)
    np.testing.assert_array_equal(sk2.ks_a, sk.ks_a)
    np.testing.assert_array_equal(np.asarray(sk2.cloud.bk_ntt), np.asarray(sk.cloud.bk_ntt))
    np.testing.assert_array_equal(np.asarray(sk2.cloud.ks_table), np.asarray(sk.cloud.ks_table))


def test_cloud_keyset_and_ciphertext_roundtrip(toy_keys):
    sk = toy_keys
    buf = pyio.BytesIO()
    tio.export_cloud_keyset(buf, sk)
    buf.seek(0)
    params, cloud = tio.import_cloud_keyset(buf)
    assert params.n == sk.params.n

    bits = np.array([1, 0, 1, 1], np.int32)
    ct = tt.encrypt_bits(sk, bits, seed=77)
    cbuf = pyio.BytesIO()
    tio.export_ciphertexts(cbuf, ct)
    cbuf.seek(0)
    ct2 = tio.import_ciphertexts(cbuf, 4, sk.params.n)
    np.testing.assert_array_equal(np.asarray(ct2.a), np.asarray(ct.a))
    np.testing.assert_array_equal(np.asarray(ct2.b), np.asarray(ct.b))
    # evaluate a gate with the re-imported cloud key
    from tfhe_tpu import gates
    out = gates.AND(ct2, ct2, cloud)
    np.testing.assert_array_equal(tt.decrypt_bits(sk, out), bits)


def test_tlwe_tgsw_sample_roundtrip(toy_keys):
    """TLWE/TGSW sample and TLweKey blocks (UIDs 84/168/85,
    ref tfhe_io.cu:300-420, 566-600, 406-414) round-trip bit-exactly."""
    sk = toy_keys
    params = sk.params
    rng = np.random.RandomState(42)
    k, N, kpl = params.k, params.N, params.kpl

    polys = rng.randint(-(2 ** 31), 2 ** 31, size=(k + 1, N)).astype(np.int32)
    buf = pyio.BytesIO()
    tio.write_tlwe_sample(buf, polys, 0.125)
    buf.seek(0)
    polys2, cv = tio.read_tlwe_sample(buf, k, N)
    np.testing.assert_array_equal(polys2, polys)
    assert cv == 0.125

    rows = rng.randint(-(2 ** 31), 2 ** 31, size=(kpl, k + 1, N)).astype(np.int32)
    buf = pyio.BytesIO()
    tio.write_tgsw_sample(buf, rows, 0.5)
    buf.seek(0)
    rows2, cv = tio.read_tgsw_sample(buf, kpl, k, N)
    np.testing.assert_array_equal(rows2, rows)
    assert cv == 0.5

    buf = pyio.BytesIO()
    tio.write_tlwe_key_content(buf, sk.tlwe_key)
    buf.seek(0)
    np.testing.assert_array_equal(tio.read_tlwe_key_content(buf, k, N), sk.tlwe_key)

    # a real BK row is a TGSW sample: serialize one and check content equality
    buf = pyio.BytesIO()
    tio.write_tgsw_sample(buf, sk.bk_raw[0], float(params.bk_stdev) ** 2)
    buf.seek(0)
    row2, _ = tio.read_tgsw_sample(buf, kpl, k, N)
    np.testing.assert_array_equal(row2, sk.bk_raw[0])
