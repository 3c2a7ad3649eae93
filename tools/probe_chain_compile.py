#!/usr/bin/env python
"""Compile-only reproducer/bisector for the chain-kernel Mosaic crash.

BENCH_TABLES chain.add16.chain_error (round 4): the axon compile helper
dies with SIGABRT inside Mosaic's VectorLayoutInferer::inferReshape
(`Check failed: arr.size() >= layout_rank(implicit_dim) (1 vs 2)`).
This probe AOT-compiles the chain kernels at PARAMS_SMALL — same kernel
structure, ~100x smaller — so the crash can be bisected and the fix
verified WITHOUT touching the device (the compile helper is local).

Usage: python tools/probe_chain_compile.py [fa|div|both]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import numpy as np
import jax

import tfhe_tpu as tt
from tfhe_tpu import arith, gates
from tfhe_tpu.ops import chain_pallas as chp

which = sys.argv[1] if len(sys.argv) > 1 else "both"

print(f"backend={jax.default_backend()}", flush=True)
sk = tt.keygen(tt.PARAMS_SMALL, seed=(314, 1592, 657), method="threefry")
nb = 4
ca = arith.encrypt_int(sk, np.array([3]), nb, seed=1)
cb = arith.encrypt_int(sk, np.array([5]), nb, seed=2)
carry0 = gates.CONSTANT(np.zeros(1, np.int32), ca.n, (1,))

if which in ("fa", "both"):
    t0 = time.time()
    f = jax.jit(lambda a, b, c, cloud: chp.fa_chain(a, b, c, cloud))
    low = f.lower(ca, cb, carry0, sk.cloud)
    print(f"fa_chain lowered in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    low.compile()
    print(f"fa_chain COMPILED OK in {time.time()-t0:.1f}s", flush=True)

if which in ("div", "both"):
    neg_b = arith.twos_complement(cb, sk.cloud)  # any [nb] ciphertext works
    t0 = time.time()
    g = jax.jit(lambda a, b, cloud: chp.div_chain(a, b, cloud))
    low = g.lower(ca, neg_b, sk.cloud)
    print(f"div_chain lowered in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    low.compile()
    print(f"div_chain COMPILED OK in {time.time()-t0:.1f}s", flush=True)
