#!/usr/bin/env python
"""Real-hardware differential check: fused Pallas blind rotate vs the XLA path.

Runs the full gate pipeline twice on the attached TPU — once with the fused
Pallas kernel, once with the pure-XLA scan (the reference-semantics path the
unit tests validate against the NumPy oracle) — and demands IDENTICAL
ciphertexts, then decrypt-verifies a batched AND truth table. This is the
cross-implementation differential methodology of the reference (SURVEY §4.3)
applied on-device.

Usage: python tools/verify_pallas_tpu.py [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

import tfhe_tpu as tt
from tfhe_tpu import gates
from tfhe_tpu.core import bootstrap as bs


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    params = tt.PARAMS_110
    print(f"device: {jax.devices()[0]}  batch={batch}")
    t0 = time.time()
    sk = tt.keygen(params, seed=(314, 1592, 657))
    print(f"keygen: {time.time()-t0:.1f}s")

    rng = np.random.RandomState(7)
    a = rng.randint(0, 2, size=batch).astype(np.int32)
    b = rng.randint(0, 2, size=batch).astype(np.int32)
    ca = tt.encrypt_bits(sk, a, seed=11)
    cb = tt.encrypt_bits(sk, b, seed=12)
    const, cfa, cfb = gates.GATE_TABLE["AND"]
    t = gates._affine2(ca, cb, jnp.int32(const), jnp.int32(cfa), jnp.int32(cfb))

    os.environ["TFHE_TPU_PALLAS"] = "1"
    out_pallas = jax.jit(lambda x, ck: bs.bootstrap(x, jnp.int32(gates.MU), ck))(t, sk.cloud)
    jax.block_until_ready(out_pallas)

    os.environ["TFHE_TPU_PALLAS"] = "0"
    out_xla = jax.jit(lambda x, ck: bs.bootstrap(x, jnp.int32(gates.MU), ck),
                      )(t, sk.cloud)
    jax.block_until_ready(out_xla)
    del os.environ["TFHE_TPU_PALLAS"]

    pa, xa = np.asarray(out_pallas.a), np.asarray(out_xla.a)
    pb, xb = np.asarray(out_pallas.b), np.asarray(out_xla.b)
    assert np.array_equal(pa, xa), f"a mismatch: {np.sum(pa != xa)} cells differ"
    assert np.array_equal(pb, xb), "b mismatch"
    got = tt.decrypt_bits(sk, out_pallas)
    assert np.array_equal(got, a & b), "decrypt mismatch"
    print("PALLAS == XLA (bit-identical ciphertexts), AND truth table verified.")


if __name__ == "__main__":
    main()
