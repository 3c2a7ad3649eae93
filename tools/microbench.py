#!/usr/bin/env python
"""Microbenchmark of blind-rotate pipeline stages on the current device."""
import os, sys, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from tfhe_tpu import ntt
from tfhe_tpu.params import PARAMS_110
from tfhe_tpu.core import bootstrap as bs

B = int(os.environ.get("MB_BATCH", "128"))
params = PARAMS_110
N, kpl, k = params.N, params.kpl, params.k
rng = np.random.RandomState(0)

acc = jnp.asarray(rng.randint(-2**31, 2**31, size=(B, k+1, N)).astype(np.int32))
bara = jnp.asarray(rng.randint(0, 2*N, size=(B,)).astype(np.int32))
dec = jnp.asarray(rng.randint(-512, 512, size=(B, kpl, N)).astype(np.int32))
bkj = jnp.asarray(rng.randint(0, ntt.P2, size=(2, kpl, k+1, N)).astype(np.uint32))
bkjs = jnp.asarray(rng.randint(0, 2**31, size=(2, kpl, k+1, N)).astype(np.uint32))
dres = jnp.asarray(rng.randint(0, ntt.P2, size=(B, kpl, N)).astype(np.uint32))
sres = jnp.asarray(rng.randint(0, ntt.P2, size=(B, k+1, N)).astype(np.uint32))

def timeit(name, fn, *args, iters=20):
    f = jax.jit(fn)
    out = f(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters * 1e3
    print(f"{name:28s} {dt:8.3f} ms")
    return dt

timeit("rotate(gather)", lambda a, r: bs.negacyclic_rotate(a, r), acc, bara)
timeit("decompose", lambda a: bs.gadget_decompose(a, params), acc)
timeit("fwd ntt p1 [B*kpl,N]", lambda d: ntt.ntt_forward(ntt.small_to_residue(d, ntt.P1), N, ntt.P1), dec)
timeit("fwd ntt both primes", lambda d: [ntt.ntt_forward(ntt.small_to_residue(d, p), N, p) for p in ntt.PRIMES], dec)
def pointwise(dh, w, ws):
    out = []
    for pi, p in enumerate(ntt.PRIMES):
        prod = ntt.mul_mod_shoup(dh[:, :, None, :], w[pi][None], ws[pi][None], p)
        s = prod[:, 0]
        for r in range(1, kpl):
            s = ntt.add_mod(s, prod[:, r], p)
        out.append(s)
    return out
timeit("pointwise+fold", pointwise, dres, bkj, bkjs)
timeit("inv ntt both primes", lambda s: [ntt.ntt_inverse(s, N, p) for p in ntt.PRIMES], sres)
timeit("crt", lambda a, b: ntt.crt_to_i32(a, b), sres, sres)
timeit("one cmux step", lambda a, r, w, ws: bs.extern_product_ntt(
    bs.gadget_decompose(bs.negacyclic_rotate(a, r) - a, params), w, ws, params) + a,
    acc, bara, bkj, bkjs)

a_ext = jnp.asarray(rng.randint(-2**31, 2**31, size=(B, params.n_extract)).astype(np.int32))
b_ext = jnp.asarray(rng.randint(-2**31, 2**31, size=(B,)).astype(np.int32))
rows = params.n_extract * params.ks_t * (params.ks_base - 1)
pad = ((params.n + 1 + 127)//128)*128
table = jnp.asarray(rng.randint(-128, 128, size=(rows, 4*pad)).astype(np.int8))
cv = jnp.zeros((B,), jnp.float32)
timeit("keyswitch(int8 matmul)", lambda a, b, t, c: bs.key_switch(a, b, t, c, params), a_ext, b_ext, table, cv)
