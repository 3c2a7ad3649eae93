#!/usr/bin/env python
"""shard_map x Pallas on REAL silicon (VERDICT r4 item 5).

The multi-chip shapes had only ever compiled on the virtual CPU mesh
(conftest forces jax_platforms=cpu; the driver dryrun likewise). This tool
runs the dryrun shapes 1, 2 and 5 on a 1-device REAL TPU mesh with the
production Pallas kernels enabled (TFHE_TPU_PALLAS=1), de-risking the
shard_map x Pallas x axon-AOT composition that the v5e-8 scaling projection
rests on:

  shape 1 — 1-D DP gate batch under shard_map at PARAMS_110,
  shape 2 — 2-D dp x ks tensor-parallel key switch (psum over the ks axis;
            a 1x1 mesh still compiles and executes the collective program),
  shape 5 — WHOLE-CIRCUIT DP: a 16-bit multiply traced as one sharded
            program (every partial-product batch, compressor level and
            final carry chain inside shard_map).

Each shape records {ok, seconds} (or the error string) into the
`multichip_hw` section of BENCH_TABLES.json, provenance-stamped.
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
os.environ["TFHE_TPU_PALLAS"] = "1"

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

import tfhe_tpu as tt
from tfhe_tpu import arith
from provenance import stamp as _stamp_section

OUT = "BENCH_TABLES.json"


def _persist(rows):
    report = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            report = json.load(f)
    report.setdefault("multichip_hw", {}).update(rows)
    _stamp_section(report, "multichip_hw")
    with open(OUT + ".tmp", "w") as f:
        json.dump(report, f, indent=2)
    os.replace(OUT + ".tmp", OUT)


def _run(rows, key, fn):
    try:
        t0 = time.time()
        fn()
        rows[key] = {"ok": True, "seconds": round(time.time() - t0, 2)}
        print(f"{key}: OK in {rows[key]['seconds']}s", flush=True)
    except Exception as e:
        rows[key] = {"ok": False, "error": f"{type(e).__name__}: {e}"[:500]}
        print(f"{key}: FAILED: {e}", flush=True)
        traceback.print_exc()
    _persist(rows)


def main():
    from tfhe_tpu.parallel import make_mesh, sharded_gate2
    from tfhe_tpu.parallel.mesh import make_mesh2d_dp_ks, sharded_circuit, \
        sharded_gate2_tp_ks

    n_dev = len(jax.devices())
    print(f"backend={jax.default_backend()}, devices={n_dev}", flush=True)
    rows = {"devices": n_dev, "backend": jax.default_backend()}

    sk = tt.keygen(tt.PARAMS_110, seed=(314, 1592, 657))
    rng = np.random.RandomState(0)
    batch = 8 * n_dev
    a = rng.randint(0, 2, size=batch).astype(np.int32)
    b = rng.randint(0, 2, size=batch).astype(np.int32)
    ca = tt.encrypt_bits(sk, a, seed=1)
    cb = tt.encrypt_bits(sk, b, seed=2)

    def shape1():
        out = sharded_gate2("AND", ca, cb, sk.cloud, make_mesh(n_dev))
        jax.block_until_ready(out)
        np.testing.assert_array_equal(tt.decrypt_bits(sk, out), a & b)

    _run(rows, "shape1_dp_gate", shape1)

    def shape2():
        ks = max(d for d in (4, 2, 1) if n_dev % d == 0)
        mesh2 = make_mesh2d_dp_ks(n_dev // ks, ks)
        out = sharded_gate2_tp_ks("XOR", ca, cb, sk.cloud, mesh2)
        jax.block_until_ready(out)
        np.testing.assert_array_equal(tt.decrypt_bits(sk, out), a ^ b)

    _run(rows, "shape2_dp_ks_tp_keyswitch", shape2)

    def shape5():
        nb = 16
        mv_a = rng.randint(0, 1 << (nb - 1), size=n_dev)
        mv_b = rng.randint(0, 1 << (nb - 1), size=n_dev)
        cm_a = arith.encrypt_int(sk, mv_a, nb, seed=65)
        cm_b = arith.encrypt_int(sk, mv_b, nb, seed=66)
        out = sharded_circuit(arith.mul, (cm_a, cm_b), sk.cloud,
                              make_mesh(n_dev))
        jax.block_until_ready(out)
        got = arith.decrypt_int(sk, out, signed=False)
        np.testing.assert_array_equal(got, (mv_a * mv_b) % (1 << nb))

    _run(rows, "shape5_whole_circuit_mul16", shape5)


if __name__ == "__main__":
    main()
