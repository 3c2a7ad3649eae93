"""Torus32 numeric primitives (jnp, exact integer semantics).

Re-implements the reference's `gpuParallel/numeric-functions.cu` on int32/uint32
arrays with wrap-around semantics. All functions are shape-polymorphic and jit-safe.

Torus32 = int32 interpreted as a real in [-1/2, 1/2) scaled by 2^32.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def to_u32(x):
    """Bit-preserving view of an int32 array as uint32."""
    return jax.lax.bitcast_convert_type(jnp.asarray(x, jnp.int32), jnp.uint32)


def to_i32(x):
    """Bit-preserving view of a uint32 array as int32."""
    return jax.lax.bitcast_convert_type(jnp.asarray(x, jnp.uint32), jnp.int32)


def dtot32(d):
    """double->Torus32 (ref numeric-functions.cu:34). Fractional part scaled by 2^32.

    Only used for small noise values (|d| << 1), where the reference's
    int64 round-trip is equivalent to a direct scaled cast.
    """
    d = jnp.asarray(d)
    frac = d - jnp.trunc(d)
    return (frac * (2.0 ** 32)).astype(jnp.int32)


def t32tod(x):
    """Torus32->double in [-1/2, 1/2) (ref numeric-functions.cu:38)."""
    return jnp.asarray(x, jnp.int32).astype(jnp.float32) / (2.0 ** 32)


def mod_switch_from_torus32(phase, Msize: int):
    """Nearest multiple index: round(phase * Msize / 2^32) mod Msize.

    Exact port of ref numeric-functions.cu:60-67 for power-of-two Msize
    (the only case used: Msize = 2N). Returns int32 in [0, Msize).
    """
    assert Msize & (Msize - 1) == 0, "power-of-two message space only"
    shift = 32 - Msize.bit_length() + 1  # 32 - log2(Msize)
    half = jnp.uint32(1 << (shift - 1))
    u = to_u32(phase) + half  # wrap-exact: (phase mod 2^32 + half) mod 2^32
    return to_i32((u >> shift) % jnp.uint32(Msize))


def mod_switch_to_torus32(mu, Msize: int):
    """mu -> Torus32 value mu/Msize (ref numeric-functions.cu:72-78).

    For power-of-two Msize: mu * 2^32/Msize mod 2^32 (uint32 wrap).
    """
    assert Msize & (Msize - 1) == 0, "power-of-two message space only"
    interv = ((1 << 63) // Msize) * 2
    step = jnp.uint32((interv >> 32) & 0xFFFFFFFF)
    return to_i32(to_u32(jnp.asarray(mu, jnp.int32)) * step)


def approx_phase(phase, Msize: int):
    """Round phase to the nearest multiple of 1/Msize (ref numeric-functions.cu:47-56)."""
    assert Msize & (Msize - 1) == 0
    shift = 32 - Msize.bit_length() + 1
    half = jnp.uint32(1 << (shift - 1))
    u = to_u32(phase) + half
    u = (u >> shift) << shift
    return to_i32(u)


def gaussian32(message, sigma: float, key):
    """message + dtot32(N(0, sigma)) (ref numeric-functions.cu:22-29).

    `message` array-like int32; `key` a jax PRNG key. sigma==0 -> exact message.
    """
    message = jnp.asarray(message, jnp.int32)
    if sigma == 0.0:
        return message
    err = jax.random.normal(key, message.shape, dtype=jnp.float32) * sigma
    return message + dtot32(err)


def uniform_torus32(key, shape):
    """Uniform Torus32 samples (ref uniformTorus32_distrib)."""
    bits = jax.random.bits(key, shape, dtype=jnp.uint32)
    return to_i32(bits)
