#!/usr/bin/env python
"""Provenance stamps for benchmark cells + mechanical staleness detection.

Round 3 failed silently: circuits changed AFTER the tables were recorded, so
BENCH_TABLES.json described code that no longer shipped and nothing noticed
(VERDICT round 3, weakness #2/#8). Fix: every bench writer stamps the section
it records with the commit + UTC time at write time, and `check()` fails when
a recorded section is older than the last commit touching the source files
its circuit runs through.

Usage (writers):    from provenance import stamp;  stamp(report, "mul")
Usage (check):      python tools/provenance.py            # exit 1 if stale
                    also invoked by tools/update_results.py --check
"""
import datetime
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Source files each bench section's measured circuit runs through. A section
# is STALE if its stamp commit does not contain the last commit touching its
# dependencies (or if it has no stamp at all / was stamped from a dirty tree).
# The whole gate pipeline (including the fused-KS epilogue, default-on since
# r5) rides cmux_pallas(.py, _packed.py) + core/ + config.py — all in _CORE,
# so an edit to ANY production kernel or routing policy stales every cell.
# The historical `chain` section records the DELETED chain-VM kernel's losing
# r5 A/B (config.py docstring tells the story); it has no live deps and is
# exempt from staleness.
_CORE = ["tfhe_tpu/gates.py", "tfhe_tpu/core",
         "tfhe_tpu/ops/cmux_pallas.py", "tfhe_tpu/ops/cmux_pallas_packed.py",
         "tfhe_tpu/ops/__init__.py", "tfhe_tpu/config.py",
         "tfhe_tpu/ntt.py", "tfhe_tpu/numeric.py", "tfhe_tpu/params.py",
         "tfhe_tpu/__init__.py"]
_ARITH = _CORE + ["tfhe_tpu/arith.py"]
_LINALG = _ARITH + ["tfhe_tpu/linalg.py"]

SECTION_DEPS = {
    "gate_batch": _CORE,
    "gate_phases": _CORE,
    "compound_gate": _CORE,
    "add": _ARITH,
    "mul": _ARITH,
    "vector_add": _LINALG,
    "vector_add_32bit": _LINALG,
    "vector_mul": _LINALG,
    "vector_mul_32bit": _LINALG,
    "vector64": _LINALG,
    "matmul": _LINALG,
    "ceiling": _CORE,
    "cipher_api_16bit": _ARITH + ["tfhe_tpu/cipher.py"],
    "multichip_hw": _ARITH + ["tfhe_tpu/parallel"],
    "linreg": _LINALG + ["tfhe_tpu/apps/linreg.py"],
    "headline": _CORE,
}


def _git(*args):
    return subprocess.run(["git", "-C", ROOT] + list(args),
                          capture_output=True, text=True).stdout.strip()


def head_commit():
    return _git("rev-parse", "HEAD")


def is_dirty(paths=("tfhe_tpu",)):
    """Dirty = uncommitted changes under the measured source tree (bench
    tables / logs churning during a run don't invalidate a measurement)."""
    return bool(_git("status", "--porcelain", "--", *paths))


def stamp(report, section):
    """Record write-time provenance for `section` into the report dict."""
    prov = report.setdefault("_provenance", {})
    prov[section] = {
        "commit": head_commit(),
        "dirty": is_dirty(),
        "utc": datetime.datetime.now(datetime.timezone.utc)
                 .strftime("%Y-%m-%dT%H:%M:%SZ"),
    }


def last_commit_touching(paths):
    return _git("log", "-1", "--format=%H", "--", *paths)


def _contains(ancestor, descendant):
    r = subprocess.run(["git", "-C", ROOT, "merge-base", "--is-ancestor",
                        ancestor, descendant], capture_output=True)
    return r.returncode == 0


def check(path=None, verbose=True):
    """Return list of (section, reason) staleness findings."""
    path = path or os.path.join(ROOT, "BENCH_TABLES.json")
    with open(path) as f:
        tables = json.load(f)
    prov = tables.get("_provenance", {})
    findings = []
    for section, deps in SECTION_DEPS.items():
        if section not in tables and section != "headline":
            continue   # not yet measured; coverage audit owns missing cells
        p = prov.get(section)
        if section == "headline" and p is None and "headline" not in tables:
            continue
        if p is None:
            findings.append((section, "no provenance stamp (pre-round-4 data)"))
            continue
        if p.get("dirty"):
            findings.append((section, f"stamped from a dirty tree at {p['utc']}"))
            continue
        dep_commit = last_commit_touching(deps)
        if dep_commit and not _contains(dep_commit, p["commit"]):
            findings.append((section,
                             f"stamped at {p['commit'][:9]} ({p['utc']}) but "
                             f"{dep_commit[:9]} later touched its circuit"))
    if verbose:
        for s, r in findings:
            print(f"STALE  {s}: {r}")
        if not findings:
            print("all recorded bench sections are provenance-fresh")
    return findings


if __name__ == "__main__":
    sys.exit(1 if check(*sys.argv[1:2]) else 0)
