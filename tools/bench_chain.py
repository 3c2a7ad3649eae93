#!/usr/bin/env python
"""Hardware A/B of the fused chain kernel (ops/chain_pallas.py) vs the
default serial-adder paths (VERDICT r3 item 5).

Measures 16/24/32-bit add and 16-bit sub at batch 1 (the latency-bound
regime the kernel targets), decrypt-verified, and records a `chain` section
in BENCH_TABLES.json with provenance stamps. If the kernel fails to compile
on the axon backend, the exception text is recorded — the "documented
reproducer" the VERDICT asks for either way.
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

import tfhe_tpu as tt
from tfhe_tpu import arith
from provenance import stamp as _stamp_section

OUT = "BENCH_TABLES.json"


def timed(fn, *args, n=4):
    out = fn(*args)
    np.asarray(out.b)                      # hard sync through the tunnel
    best = None
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        np.asarray(out.b)
        best = min(best, time.time() - t0) if best else time.time() - t0
    return best, out


def _persist(rows):
    report = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            report = json.load(f)
    report.setdefault("chain", {}).update(rows)
    _stamp_section(report, "chain")
    with open(OUT + ".tmp", "w") as f:
        json.dump(report, f, indent=2)
    os.replace(OUT + ".tmp", OUT)


def main():
    sk = tt.keygen(tt.PARAMS_110, seed=(314, 1592, 657))
    rng = np.random.RandomState(2)
    rows = {}
    for nb in (16, 24, 32):
        av = int(rng.randint(0, 1 << (nb - 1)))
        bv = int(rng.randint(0, 1 << (nb - 1)))
        ca = arith.encrypt_int(sk, np.array([av]), nb, seed=71)
        cb = arith.encrypt_int(sk, np.array([bv]), nb, seed=72)
        # default path first (whatever auto dispatch picks at this commit)
        os.environ["TFHE_TPU_CHAIN"] = "0"
        dt0, out0 = timed(arith.add, ca, cb, sk.cloud)
        assert int(arith.decrypt_int(sk, out0, signed=False)[0]) == (av + bv) % (1 << nb)
        rows[f"add{nb}.default_s"] = round(dt0, 4)
        print(f"add{nb} default: {dt0:.4f}s", flush=True)
        _persist(rows)
        # fused chain
        os.environ["TFHE_TPU_CHAIN"] = "1"
        try:
            dt1, out1 = timed(arith.add, ca, cb, sk.cloud)
            got = int(arith.decrypt_int(sk, out1, signed=False)[0])
            assert got == (av + bv) % (1 << nb), f"chain add{nb}: {got}"
            rows[f"add{nb}.chain_s"] = round(dt1, 4)
            print(f"add{nb} chain:   {dt1:.4f}s ({dt0/dt1:.2f}x)", flush=True)
        except Exception as e:
            rows[f"add{nb}.chain_error"] = f"{type(e).__name__}: {e}"[:500]
            print(f"add{nb} chain FAILED: {e}", flush=True)
            traceback.print_exc()
            _persist(rows)
            break
        _persist(rows)
    # sub16 via the chain (carry-in 1, free NOT)
    if "add16.chain_s" in rows:
        ca = arith.encrypt_int(sk, np.array([1234]), 16, seed=73)
        cb = arith.encrypt_int(sk, np.array([567]), 16, seed=74)
        os.environ["TFHE_TPU_CHAIN"] = "1"
        dt, out = timed(arith.sub, ca, cb, sk.cloud)
        assert int(arith.decrypt_int(sk, out, signed=False)[0]) == (1234 - 567)
        rows["sub16.chain_s"] = round(dt, 4)
        print(f"sub16 chain:   {dt:.4f}s", flush=True)
        _persist(rows)
        # scan/compare chains (CHAIN_TWOS / CHAIN_CMP microcode)
        ca = arith.encrypt_int(sk, np.array([1234]), 16, seed=77)
        cb = arith.encrypt_int(sk, np.array([567]), 16, seed=78)
        dt, out = timed(arith.twos_complement, ca, sk.cloud)
        assert int(arith.decrypt_int(sk, out)[0]) == -1234
        rows["twos16.chain_s"] = round(dt, 4)
        print(f"twos16 chain:  {dt:.4f}s", flush=True)
        dt, out = timed(arith.gt, ca, cb, sk.cloud)
        assert int(tt.decrypt_bits(sk, out)[0]) == 1
        rows["gt16.chain_s"] = round(dt, 4)
        print(f"gt16 chain:    {dt:.4f}s", flush=True)
        _persist(rows)
        # whole-loop fused division (grid nb*(nb+1)*n) — the round-3 verdict's
        # divide <= 2.5 s target rides on this
        ca = arith.encrypt_int(sk, np.array(1234), 16, seed=75)
        cb = arith.encrypt_int(sk, np.array(7), 16, seed=76)
        try:
            dt, out = timed(lambda x, y, ck: arith.div(x, y, ck),
                            ca, cb, sk.cloud, n=2)
            assert int(arith.decrypt_int(sk, out)) == 1234 // 7
            rows["div16.chain_s"] = round(dt, 4)
            print(f"div16 chain:   {dt:.4f}s", flush=True)
        except Exception as e:
            rows["div16.chain_error"] = f"{type(e).__name__}: {e}"[:500]
            print(f"div16 chain FAILED: {e}", flush=True)
            traceback.print_exc()
        _persist(rows)
    os.environ.pop("TFHE_TPU_CHAIN", None)


if __name__ == "__main__":
    main()
