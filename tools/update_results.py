#!/usr/bin/env python
"""Regenerate RESULTS.md's numeric tables from BENCH_TABLES.json.

RESULTS.md went stale twice (round-2 numbers surviving into round-3 text), so
the tables are now generated: every block between `<!-- AUTO:<name> -->` and
`<!-- /AUTO -->` is rewritten from the recorded JSON; all prose outside the
markers is left untouched. Run after any bench session:

    python tools/update_results.py           # rewrites RESULTS.md in place
    python tools/update_results.py --check   # exit 1 if RESULTS.md is stale
"""
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _f(x, nd=2):
    return "—" if x is None else f"{x:.{nd}f}"


def _speed(ours, ref):
    if ours is None or not ref:
        return "—"
    return f"**{ref / ours:.1f}×**"


def gen_gates(t):
    rows = ["| Workload | TPU v5e (1 chip) | GTX 1080 (ref) | Speedup |",
            "|---|---|---|---|"]
    for b, r in sorted(t["gate_batch"].items(), key=lambda kv: int(kv[0])):
        rows.append(f"| AND batch, {b} bits | {r['s']*1e3:.1f} ms | "
                    f"{r['ref_gpu_s']*1e3:.1f} ms | {_speed(r['s'], r['ref_gpu_s'])} |")
    return rows


def gen_phases(t):
    rows = ["| Bits | BS (TPU / ref) | KS (TPU / ref) | misc (TPU / ref) |",
            "|---|---|---|---|"]
    for b, r in sorted(t.get("gate_phases", {}).items(), key=lambda kv: int(kv[0])):
        rows.append(
            f"| {b} | {r['bs_s']*1e3:.1f} / {r['ref_gpu_bs_s']*1e3:.1f} ms "
            f"| {r['ks_s']*1e3:.1f} / {r['ref_gpu_ks_s']*1e3:.1f} ms "
            f"| {r['misc_s']*1e3:.1f} / {r['ref_gpu_misc_s']*1e3:.2f} ms |")
    return rows


def gen_arith(t):
    rows = ["| Workload | TPU v5e | GTX 1080 | Speedup |", "|---|---|---|---|"]
    for b, r in sorted(t["add"].items(), key=lambda kv: int(kv[0])):
        rows.append(f"| add {b}-bit (bitwise GPU_1) | {_f(r['bitwise_s'])} s | "
                    f"{_f(r['ref_bitwise_s'])} s | {_speed(r['bitwise_s'], r['ref_bitwise_s'])} |")
    for b, r in sorted(t["add"].items(), key=lambda kv: int(kv[0])):
        rows.append(f"| add {b}-bit (number-wise GPU_n) | {_f(r['numberwise_s'])} s | "
                    f"{_f(r['ref_numberwise_s'])} s | {_speed(r['numberwise_s'], r['ref_numberwise_s'])} |")
    for b, r in sorted(t["mul"].items(), key=lambda kv: int(kv[0])):
        rows.append(f"| mul {b}-bit (shift-add) | {_f(r['naive_s'])} s | "
                    f"{_f(r['ref_naive_s'])} s | {_speed(r['naive_s'], r['ref_naive_s'])} |")
        if r.get("karatsuba_s") is not None and r.get("ref_karatsuba_s"):
            rows.append(f"| mul {b}-bit (Karatsuba) | {_f(r['karatsuba_s'])} s | "
                        f"{_f(r['ref_karatsuba_s'], 2)} s | {_speed(r['karatsuba_s'], r['ref_karatsuba_s'])} |")
    return rows


def gen_cipher(t):
    names = {"compare_gt": "compare a>b", "equal": "a==b",
             "twos_complement": "two's complement", "absolute": "absolute value",
             "subtract": "subtract", "minimum": "minimum",
             "mul_mux": "MUX-based multiply", "divide": "restoring division"}
    rows = ["| op | time |", "|---|---|"]
    for k, label in names.items():
        v = t.get("cipher_api_16bit", {}).get(k)
        if v is not None:
            rows.append(f"| {label} | {_f(v)} s |")
    return rows


def gen_vector(t):
    rows = ["| ℓ | add 16b TPU/ref | add 32b TPU/ref | mul 16b TPU/ref | mul 32b TPU/ref |",
            "|---|---|---|---|---|"]
    for L in ("4", "8", "16", "32"):
        cells = [L]
        for key in ("vector_add", "vector_add_32bit", "vector_mul", "vector_mul_32bit"):
            r = t.get(key, {}).get(L)
            cells.append("—" if r is None else
                         f"{_f(r['s'])} / {_f(r['ref_gpu_s'])} s ({_f(r['ref_gpu_s']/r['s'], 1)}×)")
        rows.append("| " + " | ".join(cells) + " |")
    v64 = t.get("vector64")
    if v64:
        rows.append(f"| 64 (config 4) | add {_f(v64['add_s'])} s, compare "
                    f"{_f(v64['compare_s'])} s (no published ref) | | | |")
    return rows


def gen_matmul(t):
    rows = ["| D×D | tree | Cannon | ref GPU | Speedup |", "|---|---|---|---|---|"]
    for d, r in sorted(t["matmul"].items(), key=lambda kv: int(kv[0])):
        tree = f"{_f(r['tree_s'], 1)} s"
        if r["tree_s"] >= 100:
            tree += f" ({r['tree_s']/60:.1f} min)"
        can = "—" if r["cannon_s"] is None else f"{_f(r['cannon_s'], 1)} s"
        ref = f"{_f(r['ref_gpu_s'], 0)} s"
        if r["ref_gpu_s"] and r["ref_gpu_s"] >= 100:
            ref += f" ({r['ref_gpu_s']/60:.1f} min)"
        rows.append(f"| {d}×{d} | {tree} | {can} | {ref} | "
                    f"{_speed(r['tree_s'], r['ref_gpu_s'])} |")
    return rows


def gen_linreg(t):
    lr = t.get("linreg")
    if not lr:
        return ["(not yet measured on hardware — queued)"]
    rows = ["| variant | TPU v5e | GTX 1080 (Table X) | Speedup |",
            "|---|---|---|---|"]
    for v, r in lr.items():
        ref = r.get("ref_gpu_min")
        rows.append(f"| {v} {r['rows']}×{r['attrs']} ({r['bits']}-bit) "
                    f"| {r['minutes']:.2f} min | {ref if ref else '—'} min "
                    f"| {_speed(r['s'], ref * 60 if ref else None)} |")
    return rows


def gen_chain(t):
    ch = t.get("chain")
    if not ch:
        return ["(no record)"]
    rows = ["The microcoded chain VM (a whole serial circuit in one Pallas "
            "launch) was REMOVED after this r5 hardware A/B rejected it: the "
            "in-kernel fori-loop key switch serializes t·(base−1) masked MXU "
            "dots per stage, where the production path's one-hot int8 matmul "
            "amortizes them across the batch. The rows below are the loss "
            "record (tfhe_tpu/config.py tells the story).",
            "",
            "| op | default path | fused chain | note |", "|---|---|---|---|"]
    ops = sorted({k.split(".")[0] for k in ch})
    for op in ops:
        d = ch.get(f"{op}.default_s")
        c = ch.get(f"{op}.chain_s")
        err = ch.get(f"{op}.chain_error")
        note = ""
        if err:
            note = f"compile error: `{err[:80]}`"
        elif d is not None and c:
            note = f"**{d / c:.1f}×**"
        rows.append(f"| {op} | {_f(d, 3) if d is not None else '—'} s "
                    f"| {_f(c, 3) if c is not None else '—'} s | {note} |")
    return rows


def gen_ceiling(t):
    ce = t.get("ceiling")
    if not ce:
        return ["(batch-footprint sweep not yet run — queued as the ceiling stage)"]
    rows = ["| lane batch | bootstraps/s | note |", "|---|---|---|"]
    pts = sorted({k.split(".")[0] for k in ce},
                 key=lambda p: (int(p.split("_b")[1].split("_")[0]),
                                "fuseks" in p or "splitks" in p))
    for p in pts:
        thr = ce.get(f"{p}.bootstraps_per_sec")
        err = ce.get(f"{p}.error")
        label = (p.replace("lane_b", "B=").replace("_fuseks", " + fused KS")
                 .replace("_splitks", " + split KS (fused off)"))
        note = f"`{err[:90]}`" if err else ""
        rows.append(f"| {label} | {_f(thr, 1) if thr else '—'} | {note} |")
    return rows


GENERATORS = {"gates": gen_gates, "phases": gen_phases, "arith": gen_arith,
              "cipher": gen_cipher, "vector": gen_vector, "matmul": gen_matmul,
              "linreg": gen_linreg, "chain": gen_chain, "ceiling": gen_ceiling}


def main(argv=None):
    check = "--check" in (argv or sys.argv[1:])
    with open(os.path.join(ROOT, "BENCH_TABLES.json")) as f:
        tables = json.load(f)
    path = os.path.join(ROOT, "RESULTS.md")
    with open(path) as f:
        text = f.read()

    def repl(m):
        name = m.group(1)
        body = "\n".join(GENERATORS[name](tables))
        return f"<!-- AUTO:{name} -->\n{body}\n<!-- /AUTO -->"

    # Fully lazy body with NO mandatory newlines: a filled block matches to
    # its OWN /AUTO and an empty "<!-- AUTO:x -->\n<!-- /AUTO -->" pair
    # matches itself. Any mandatory \n (or a greedy optional group) makes an
    # empty block overshoot to the NEXT /AUTO and swallow whole sections.
    new = re.sub(r"<!-- AUTO:(\w+) -->.*?<!-- /AUTO -->", repl, text,
                 flags=re.S)
    # Guard: regeneration must never add or remove section headers.
    if [l for l in text.splitlines() if l.startswith("#")] != \
       [l for l in new.splitlines() if l.startswith("#")]:
        print("refusing: regeneration would change the section structure")
        return 2
    if check:
        rc = 0
        if new != text:
            print("RESULTS.md is stale vs BENCH_TABLES.json — run tools/update_results.py")
            rc = 1
        else:
            print("RESULTS.md tables in sync with BENCH_TABLES.json")
        # round-4: cells must also be provenance-fresh (measured at a commit
        # containing the last change to the circuit they measure)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import provenance
        if provenance.check():
            rc = 1
        return rc
    if new != text:
        with open(path, "w") as f:
            f.write(new)
        print("RESULTS.md tables regenerated from BENCH_TABLES.json")
    else:
        print("RESULTS.md already in sync")
    return 0


if __name__ == "__main__":
    sys.exit(main())
