"""Encryption / decryption of LWE samples and boolean messages.

Ports `lweSymEncrypt`/`lwePhase`/`lweSymDecrypt` (lwe-functions.cu:36-97) and
`bootsSymEncrypt`/`bootsSymDecrypt` (tfhe_gate_bootstrapping.cu:113-125),
batched over arbitrary leading shapes.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..params import TfheParams
from ..numeric import dtot32, mod_switch_to_torus32, uniform_torus32
from .lwe import LweCiphertext


def lwe_encrypt(rng_key, message, lwe_key, alpha: float) -> LweCiphertext:
    """Encrypt torus32 messages under the given binary LWE key.

    message: int32[...]; returns ciphertext with matching batch shape.
    (ref lweSymEncrypt, lwe-functions.cu:36-47)
    """
    message = jnp.asarray(message, jnp.int32)
    shape = message.shape
    n = lwe_key.shape[-1]
    k_a, k_noise = jax.random.split(rng_key)
    a = uniform_torus32(k_a, shape + (n,))
    if alpha > 0.0:
        err = jax.random.normal(k_noise, shape, dtype=jnp.float32) * alpha
        b = message + dtot32(err)
    else:
        b = message
    b = b + jnp.sum(a * lwe_key.astype(jnp.int32), axis=-1, dtype=jnp.int32)
    cv = jnp.full(shape, alpha * alpha, jnp.float32)
    return LweCiphertext(a, b, cv)


def lwe_phase(ct: LweCiphertext, lwe_key) -> jnp.ndarray:
    """phi = b - a.s (ref lwePhase, lwe-functions.cu:72-81)."""
    axs = jnp.sum(ct.a * lwe_key.astype(jnp.int32), axis=-1, dtype=jnp.int32)
    return ct.b - axs


def encrypt_bits(sk, bits, seed: int = 0) -> LweCiphertext:
    """Encrypt boolean messages as +-1/8 (ref bootsSymEncrypt)."""
    params: TfheParams = sk.params
    bits = jnp.asarray(np.asarray(bits), jnp.int32)
    mu = mod_switch_to_torus32(1, 8)
    msg = jnp.where(bits != 0, mu, -mu)
    key = jax.random.fold_in(jax.random.PRNGKey(seed & 0x7FFFFFFF), 0x5EC0DE)
    return lwe_encrypt(key, msg, jnp.asarray(sk.lwe_key), params.ks_stdev)


def decrypt_bits(sk, ct: LweCiphertext) -> np.ndarray:
    """Decrypt boolean messages: 1 iff phase > 0 (ref bootsSymDecrypt)."""
    phi = lwe_phase(ct, jnp.asarray(sk.lwe_key))
    return np.asarray(phi > 0, np.int32)


def decrypt_phase(sk, ct: LweCiphertext) -> np.ndarray:
    return np.asarray(lwe_phase(ct, jnp.asarray(sk.lwe_key)))
