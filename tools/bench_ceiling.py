#!/usr/bin/env python
"""Single-chip ceiling sweep (VERDICT r3 item 8): lane-kernel batch footprint.

The lane-layout fused kernel ships with LANE_MAX_BATCH=256 because B=512
overran the 112 MB VMEM window in round 2. This tool records the experiment
either way: for B in the sweep it patches the chunk limits, times the chained
AND-gate loop (same methodology as bench.py's headline region), and records
throughput or the compile/OOM error per point into BENCH_TABLES.json under
`ceiling` — so the 2,200/s ceiling claim is attested by experiments, not only
by the roofline model (ref hot loop boot-gates.cu:2543-2583).

Each point runs in a subprocess (a stalled axon AOT compile or a runtime OOM
must not take down the sweep); the parent holds the device lock for the whole
sweep and merges rows as they land.
"""
import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".jax_cache"))

OUT = os.path.join(ROOT, "BENCH_TABLES.json")
SWEEP = (256, 288, 320, 384, 448, 512)
POINT_TIMEOUT_S = 1500   # keygen ~80 s + first-compile headroom per point


def run_point(B: int, splitks: bool) -> None:
    """Child: measure chained-AND throughput at lane batch B; print one JSON line."""
    import numpy as np
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import tfhe_tpu as tt
    from tfhe_tpu import gates
    from tfhe_tpu.core import bootstrap as bs

    gates.GATE_CHUNK = B
    bs.LANE_MAX_BATCH = B
    if splitks:
        os.environ["TFHE_TPU_FUSEKS"] = "0"
    elif B > 256:
        # the fused kernel's KS table (48 MB) + a B>256 working set overruns
        # the 127 MiB VMEM window — sweep the split path above 256 so the
        # accumulator-footprint cliff is measured on the path that fits
        os.environ["TFHE_TPU_FUSEKS"] = "0"

    sk = tt.keygen(tt.PARAMS_110, seed=(314, 1592, 657))
    rng = np.random.RandomState(0)
    bits_a = rng.randint(0, 2, size=B).astype(np.int32)
    bits_b = rng.randint(0, 2, size=B).astype(np.int32)
    ca = tt.encrypt_bits(sk, bits_a, seed=1)
    cb = tt.encrypt_bits(sk, bits_b, seed=2)

    out = gates.AND(ca, cb, sk.cloud)
    np.asarray(out.b)
    assert np.array_equal(tt.decrypt_bits(sk, out), bits_a & bits_b), \
        f"AND mismatch at B={B}"
    out = gates.AND(out, cb, sk.cloud)       # warm the chained signature
    np.asarray(out.b)
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        out = gates.AND(out, cb, sk.cloud)
    np.asarray(out.b)
    dt = (time.time() - t0) / iters
    assert np.array_equal(tt.decrypt_bits(sk, out), bits_a & bits_b)
    print(json.dumps({"B": B, "fuseks": os.environ.get("TFHE_TPU_FUSEKS", "auto"),
                      "s_per_batch": round(dt, 5),
                      "bootstraps_per_sec": round(B / dt, 2)}))


def _persist(rows: dict) -> None:
    from provenance import stamp
    report = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            report = json.load(f)
    report.setdefault("ceiling", {}).update(rows)
    stamp(report, "ceiling")
    with open(OUT + ".tmp", "w") as f:
        json.dump(report, f, indent=2)
    os.replace(OUT + ".tmp", OUT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", type=int, help="child mode: measure one B point")
    ap.add_argument("--splitks", action="store_true")
    args = ap.parse_args()
    if args.one:
        run_point(args.one, args.splitks)
        return

    rows = {}
    best_b, best_thr = None, 0.0
    for B in SWEEP:
        key = f"lane_b{B}"
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", str(B)],
                capture_output=True, text=True, timeout=POINT_TIMEOUT_S)
            if r.returncode == 0 and r.stdout.strip():
                row = json.loads(r.stdout.strip().splitlines()[-1])
                rows[f"{key}.bootstraps_per_sec"] = row["bootstraps_per_sec"]
                rows[f"{key}.s_per_batch"] = row["s_per_batch"]
                print(f"B={B}: {row['bootstraps_per_sec']:.1f}/s", flush=True)
                if row["bootstraps_per_sec"] > best_thr:
                    best_b, best_thr = B, row["bootstraps_per_sec"]
            else:
                tail = (r.stderr or r.stdout).strip().splitlines()[-8:]
                rows[f"{key}.error"] = " | ".join(tail)[:500]
                print(f"B={B} FAILED (rc={r.returncode}):\n" + "\n".join(tail),
                      flush=True)
        except subprocess.TimeoutExpired:
            rows[f"{key}.error"] = f"timeout after {POINT_TIMEOUT_S}s (compiler stall?)"
            print(f"B={B} TIMED OUT", flush=True)
        _persist(rows)

    # split-KS A/B at the winning batch (fused is the r5 default: this arm
    # keeps the separate-KS-program regression record)
    if best_b:
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", str(best_b),
                 "--splitks"],
                capture_output=True, text=True, timeout=POINT_TIMEOUT_S)
            if r.returncode == 0 and r.stdout.strip():
                row = json.loads(r.stdout.strip().splitlines()[-1])
                rows[f"lane_b{best_b}_splitks.bootstraps_per_sec"] = row["bootstraps_per_sec"]
                print(f"B={best_b} splitks: {row['bootstraps_per_sec']:.1f}/s", flush=True)
            else:
                tail = (r.stderr or r.stdout).strip().splitlines()[-8:]
                rows[f"lane_b{best_b}_splitks.error"] = " | ".join(tail)[:500]
                print(f"B={best_b} splitks FAILED", flush=True)
        except subprocess.TimeoutExpired:
            rows[f"lane_b{best_b}_splitks.error"] = f"timeout after {POINT_TIMEOUT_S}s"
        _persist(rows)
    print(json.dumps({"ceiling": rows}, indent=2))


if __name__ == "__main__":
    main()
