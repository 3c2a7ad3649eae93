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


def _is_pow2(Msize: int) -> bool:
    return Msize & (Msize - 1) == 0


def _u32_np(x) -> "np.ndarray":
    import numpy as np
    return (np.asarray(x).astype(np.int64) & 0xFFFFFFFF).astype(np.uint64)


def mod_switch_from_torus32(phase, Msize: int):
    """Nearest multiple index: round(phase * Msize / 2^32) mod Msize.

    Exact port of ref numeric-functions.cu:60-67. Power-of-two Msize (the hot
    case, Msize = 2N) is a jit-safe shift path; arbitrary Msize uses the
    reference's uint64 formula on concrete (host) values."""
    if _is_pow2(Msize):
        shift = 32 - Msize.bit_length() + 1  # 32 - log2(Msize)
        half = jnp.uint32(1 << (shift - 1))
        u = to_u32(phase) + half  # wrap-exact: (phase mod 2^32 + half) mod 2^32
        return to_i32((u >> shift) % jnp.uint32(Msize))
    import numpy as np
    interv = np.uint64((((1 << 63) // Msize) * 2) & 0xFFFFFFFFFFFFFFFF)
    phase64 = (_u32_np(phase) << np.uint64(32)) + interv // np.uint64(2)  # u64 wrap
    return jnp.asarray((phase64 // interv).astype(np.int64), jnp.int32)


def mod_switch_to_torus32(mu, Msize: int):
    """mu -> Torus32 value mu/Msize (ref numeric-functions.cu:72-78)."""
    if _is_pow2(Msize):
        interv = ((1 << 63) // Msize) * 2
        step = jnp.uint32((interv >> 32) & 0xFFFFFFFF)
        return to_i32(to_u32(jnp.asarray(mu, jnp.int32)) * step)
    import numpy as np
    interv = np.uint64((((1 << 63) // Msize) * 2) & 0xFFFFFFFFFFFFFFFF)
    phase64 = (np.asarray(mu).astype(np.int64).astype(np.uint64)) * interv  # wrap
    return jnp.asarray(((phase64 >> np.uint64(32)) & np.uint64(0xFFFFFFFF))
                       .astype(np.int64).astype(np.int32))


def approx_phase(phase, Msize: int):
    """Round phase to the nearest multiple of 1/Msize (ref numeric-functions.cu:47-56)."""
    if _is_pow2(Msize):
        shift = 32 - Msize.bit_length() + 1
        half = jnp.uint32(1 << (shift - 1))
        u = to_u32(phase) + half
        u = (u >> shift) << shift
        return to_i32(u)
    import numpy as np
    interv = np.uint64((((1 << 63) // Msize) * 2) & 0xFFFFFFFFFFFFFFFF)
    phase64 = (_u32_np(phase) << np.uint64(32)) + interv // np.uint64(2)
    phase64 -= phase64 % interv
    return jnp.asarray(((phase64 >> np.uint64(32)) & np.uint64(0xFFFFFFFF))
                       .astype(np.int64).astype(np.int32))


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
