"""FFT-path equivalence attestation (SURVEY §7 hard-part d).

Bit-exactness of this framework is proven against the reference compiled in
its exact-Karatsuba configuration (native/Makefile REF_FLAGS); the reference's
*shipped* binaries instead use the float64 FFT path
(`fft_processor_fftw.cu:148-181`). The reference documents the two configs as
interchangeable (`multiplication.cu:53-77`). This module closes the remaining
asterisk by attesting it numerically: a faithful numpy emulation of the
reference FFT pipeline — the 2N-point real FFT with the negacyclic fold
(rev_in = [a/2, -a/2], odd bins only, `fft_processor_fftw.cu:148-157`), the
Lagrange pointwise multiply-accumulate (`tlwe-fft-operations.cu:286+`), and
the inverse with scale 2^32/N (`execute_direct_Torus32`, `:168-181`) — is run
over the REAL bootstrapping key, and every external product in a full
500-iteration blind-rotate trace is compared against the exact CRT-NTT
convolution:

    max |pre-rounding float  -  exact integer product| < 0.5   (Torus32 ulp)

(measured: ~0.05). Under round-to-nearest the two paths are therefore
Torus32-identical on every product of a real bootstrap. The reference itself
truncates toward zero (`Torus32(int64_t(x))`, `fft_processor_fftw.cu:177`), so
its shipped binaries can still differ from the exact path by at most 1 LSB of
Torus32 per product — 2^-32, four orders of magnitude below the bootstrapping
noise stdev (bk_stdev ~ 2^-27), which is exactly the interchangeability the
reference asserts.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import tfhe_tpu as tt
from tfhe_tpu import ntt
from tfhe_tpu.core import bootstrap as bs
from tfhe_tpu.core.crypt import encrypt_bits
from tfhe_tpu.gates import MU
from tfhe_tpu.numeric import mod_switch_from_torus32

P = tt.PARAMS_110


def _rev(a: np.ndarray, scale: float) -> np.ndarray:
    """execute_reverse_int/_torus32: negacyclic fold + odd bins
    (fft_processor_fftw.cu:148-167). a: [..., N] -> complex[..., N/2]."""
    x = np.concatenate([a * scale, -a * scale], axis=-1)
    return np.fft.rfft(x, axis=-1)[..., 1::2]


def _direct_float(v: np.ndarray, N: int) -> np.ndarray:
    """execute_direct_Torus32 WITHOUT the final truncation: odd-bin spread +
    unnormalized c2r FFT (FFTW convention = 2N * irfft) * (2^32 / N)
    (fft_processor_fftw.cu:168-181). Returns the pre-rounding float[..., N]."""
    buf = np.zeros(v.shape[:-1] + (N + 1,), complex)
    buf[..., 1::2] = v
    out = np.fft.irfft(buf, 2 * N, axis=-1) * (2 * N)
    return out[..., :N] * (1.0 / N) * 2.0 ** 32


def _trunc_torus32(f: np.ndarray) -> np.ndarray:
    """Torus32(int64_t(x)): truncation toward zero, then int32 wrap."""
    return f.astype(np.int64).astype(np.int32)


@pytest.fixture(scope="module")
def sk110():
    return tt.keygen(P, seed=(314, 1592, 657))


@pytest.mark.slow
def test_fft_path_rounds_identically_over_bootstrap_trace(sk110):
    """Full 500-iteration blind rotate of a real ciphertext, run through the
    emulated reference FFT pipeline (the float accumulator evolves with the
    reference's own truncated products), asserting every one of the
    500 x (k+1) external products is within 0.5 Torus32 ulp of exact."""
    sk = sk110
    bk = np.asarray(sk.bk_raw, np.int32)          # [n, kpl, k+1, N]
    N, k, kpl, n = P.N, P.k, P.kpl, P.n

    # BK in the emulated Lagrange domain, converted once like the reference
    # (init_LweBootstrappingKeyFFT, lwe-bootstrapping-functions-fft.cu:60-96).
    bkF = _rev(bk.astype(np.float64), 2.0 ** -33)  # [n, kpl, k+1, N/2]

    # a real encrypted bit, prepared exactly like bootstrap_woks
    x = encrypt_bits(sk, np.array([1], np.int32), seed=9)
    t = tt.gates._affine2(x, x, -tt.gates._1_8, 1, 1)   # AND(x, x) affine image
    acc, bara = jax.tree_util.tree_map(np.asarray, bs._prepare_acc(t, MU, sk.cloud))

    acc = np.asarray(acc[0], np.int32)            # [k+1, N]
    bara = np.asarray(bara[0], np.int32)          # [n]

    max_err = 0.0
    for j in range(n):
        rot = np.asarray(
            bs.negacyclic_rotate(jnp.asarray(acc[None]), jnp.asarray(bara[j])[None])[0])
        diff = (rot.astype(np.int64) - acc.astype(np.int64)).astype(np.int32)
        dec = np.asarray(
            bs.gadget_decompose(jnp.asarray(diff[None]), P)[0], np.int32)  # [kpl, N]

        # float path: decompose -> ifft -> pointwise bk MAC -> fft back
        decF = _rev(dec.astype(np.float64), 0.5)                   # [kpl, N/2]
        f = _direct_float(
            np.einsum("rc,rkc->kc", decF, bkF[j], optimize=True), N)  # [k+1, N]
        # exact path: CRT-NTT negacyclic convolution of the same inputs
        ex = np.asarray(ntt.negacyclic_polymul_i32(
            jnp.asarray(dec[:, None, :]), jnp.asarray(bk[j]))).sum(0).astype(np.int32)

        err = np.abs((f - ex.astype(np.float64) + 2.0 ** 31) % 2.0 ** 32 - 2.0 ** 31)
        max_err = max(max_err, float(err.max()))
        assert max_err < 0.5, f"iteration {j}: FFT error {max_err}"

        # the accumulator continues with the REFERENCE's rounding so the trace
        # visits the exact states the shipped binaries would visit
        acc = (acc.astype(np.int64) + _trunc_torus32(f).astype(np.int64)
               ).astype(np.int32)

    # end-to-end: the FFT-path accumulator still decrypts to the right bit
    a_ext, b_ext = bs.sample_extract(jnp.asarray(acc[None]), P)
    phase = (int(b_ext[0]) - int(
        np.dot(np.asarray(a_ext[0], np.int64), sk.extracted_key.astype(np.int64)))
        ) & 0xFFFFFFFF
    phase = phase - (1 << 32) if phase >= (1 << 31) else phase
    assert phase > 0, "FFT-path bootstrap output decodes to the wrong sign"
    print(f"max FFT-vs-exact error over {n}x{k+1} products: {max_err:.4f} ulp")
