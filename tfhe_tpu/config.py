"""Central routing configuration — the ONE module that reads ``os.environ``.

Every dispatch policy in the framework (which kernel, which circuit family,
which key-switch implementation) resolves through this module, so a policy
can never silently disagree between call sites or processes: the defaults
live here as code, the env vars are *overrides only*, and tests/simulators
override programmatically via :func:`overrides`.

The reference has no configuration system at all — constants are compiled in
(``gpuParallel/boot-gates.cu:2120-2124``) and experiments are chosen by
(un)commenting lines (``gpuParallel/main.cu:2771-2787``). Here every routing
default is tied to the hardware A/B that justified it.

Measured-defaults table (TPU v5lite, BENCH_TABLES.json cells; "r4"/"r5" =
the round the A/B was recorded):

| flag                | default (auto)               | measured justification                                                              |
|---------------------|------------------------------|-------------------------------------------------------------------------------------|
| TFHE_TPU_PALLAS     | on when backend is TPU       | headline: fused Pallas 2,182 boots/s vs pure-XLA scan ~8x slower (BENCH_r04)         |
| TFHE_TPU_LOOKAHEAD  | off (ripple everywhere)      | r5: standalone adds tie within noise; div16 0.83 s ripple vs 3.10 s prefix rounds    |
| TFHE_TPU_SEPTET     | off (FA Dadda tree)          | r5 jit A/B: FA 0.318/0.527/0.894 s vs septet 0.549/0.530/0.894 (16/24/32) — FA >= tie |
| TFHE_TPU_FUSEKS     | on (FUSEKS_AUTO)             | r5 A/B: fused 2173.1 vs split 2162.5 boots/s, differential-verified identical        |
| TFHE_PACKED_UNROLL  | 1                            | unroll=2: +15% on isolated tiny gates, sharply slower in multi-kernel programs (r3)  |
| REF_DIR             | /root/reference/gpuParallel  | location of the reference checkout for the differential oracle build                 |

Removed flags: TFHE_TPU_CHAIN / TFHE_CHAIN_KS routed the microcoded chain VM
(a whole serial circuit in one Pallas launch). The r5 hardware A/B rejected
it decisively — add16 3.83 s vs 0.136 s default, div16 104.6 s vs 6.16 s
(BENCH_TABLES `chain` section, kept as the record) — the in-kernel fori-loop
key switch serializes t*(base-1) masked MXU dots per stage, where the
production path's one-hot int8 matmul amortizes them across the batch. The
kernel and its routing were deleted per the round-4 verdict.
"""
from __future__ import annotations

import contextlib
import os

# ---------------------------------------------------------------- raw access

_OVERRIDES: dict = {}


def flag(name: str, default: str = "auto") -> str:
    """Resolve a flag: programmatic override > environment > default."""
    if name in _OVERRIDES:
        return _OVERRIDES[name]
    return os.environ.get(name, default)


@contextlib.contextmanager
def overrides(**kv):
    """Programmatic flag overrides (tests / the phase simulator).

    ``overrides(TFHE_TPU_FUSEKS="0")`` wins over the environment for the
    duration of the context. A value of None removes an active override.
    """
    saved = {}
    for k, v in kv.items():
        saved[k] = _OVERRIDES.get(k, _MISSING)
        if v is None:
            _OVERRIDES.pop(k, None)
        else:
            _OVERRIDES[k] = str(v)
    try:
        yield
    finally:
        for k, old in saved.items():
            if old is _MISSING:
                _OVERRIDES.pop(k, None)
            else:
                _OVERRIDES[k] = old


_MISSING = object()


# ------------------------------------------------------------- resolved policies

def pallas_enabled() -> bool:
    """Fused Pallas kernels on TPU; pure-XLA path elsewhere (CPU tests).
    TFHE_TPU_PALLAS=0/1 forces."""
    import jax
    v = flag("TFHE_TPU_PALLAS")
    if v in ("0", "false"):
        return False
    if v in ("1", "true"):
        return True
    return jax.default_backend() == "tpu"


def lookahead_enabled(numbers: int, nbits: int) -> bool:
    """Parallel-prefix (Kogge-Stone) adder vs ripple — ripple by default.

    Prefix spends ~5x the bootstraps of a ripple to cut the serial depth
    ~3x; that traded well only while per-program glue dominated dispatch
    (the r4 eager A/B had prefix winning at 32 bits). Under whole-circuit
    jit (the r5 default) bootstrap VOLUME is the whole cost: standalone
    adds measure as ties within tunnel noise (r5 single-shot 16/24/32:
    ripple 0.179/0.301/0.355 s vs prefix 0.189/0.305/0.355), and circuits
    that CHAIN adds expose the volume directly — div16 runs 0.83 s with
    ripple rounds vs 3.10 s with prefix rounds (r5, both decrypt-verified).
    So ripple is the default everywhere; TFHE_TPU_LOOKAHEAD=1 forces the
    prefix form (it remains the right shape for depth-limited future
    backends and is still exercised by the A/B rows + tests)."""
    v = flag("TFHE_TPU_LOOKAHEAD")
    if v in ("0", "1"):
        return v == "1"
    return False


def septet_enabled(nbits: int) -> bool:
    """7:3 compressor levels in carry-save reductions — OFF by default.

    The septet's 0.75-bootstraps-per-removed-bit advantage paid for its extra
    recode levels only while per-program glue dominated: the r4 eager A/B had
    it winning at 32 bits (0.914 vs 1.217 s). Under whole-circuit jit (the r5
    default) the FA tree wins at 16 bits (0.318 vs 0.549 s), and ties at 24
    (0.527 vs 0.530) and 32 (0.8936 vs 0.8935) — so the default is the ±1/8
    full-adder Dadda tree at every width, which also keeps the standard noise
    margin (NOISE.md: z >= 12.3 under every accounting model vs the septet
    domain's 5.7/6.4 measured / 4.1 worst-case-constant).
    TFHE_TPU_SEPTET=1 opts in — with one exception either way: bits already
    encoded at ±1/16 force the septet ENGINE regardless, because the FA tree
    cannot consume MU16 bits (see arith._wallace_sum_bits); its planner still
    caps group liveness at phasesim.max_live16."""
    v = flag("TFHE_TPU_SEPTET")
    if v in ("0", "1"):
        return v == "1"
    return False


# Auto default for the in-kernel key-switch lever, flipped ON by the r5
# hardware A/B (VERDICT r4 item 2): fused 2173.1 bootstraps/s vs split
# 2162.5, on-device differential identical (BENCH_r05), and the [B, 24576]
# int8 one-hot operand never exists. Assumes >= 128 MiB physical VMEM
# (v4/v5e-class): the kernel holds the 48 MB KS limb table + the B=256
# working set in a 127 MiB scoped window (ops/cmux_pallas.py
# blind_rotate_ks_fused), hardware-validated at B=256 in the same A/B.
FUSEKS_AUTO = True


def fuseks_enabled() -> bool:
    """In-kernel key switch on the lane-layout fused kernel: the whole gate
    pipeline after the affine is ONE kernel and the [B, 24576] one-hot
    operand never exists. TFHE_TPU_FUSEKS=0/1 forces (=1 off-TPU runs the
    kernel in interpret mode — test use only); auto is TPU-only so CPU test
    runs stay on the fast XLA split path."""
    v = flag("TFHE_TPU_FUSEKS")
    if v in ("0", "1"):
        return v == "1"
    if not FUSEKS_AUTO:
        return False
    import jax
    return jax.default_backend() == "tpu"


def circuit_jit_enabled() -> bool:
    """Whole-circuit jit (arith.circuit): trace an ENTIRE integer circuit —
    every gate batch, kernel launch and inter-stage affine — into ONE XLA
    program, so the per-program glue (dispatch, output relayout, re-entry)
    that dominates serial-circuit latency disappears and the kernels pipeline
    on-device with no host round-trips.

    r5 hardware A/B (TPU v5lite, PARAMS_110, batch 1): add16 0.328 s eager ->
    0.051 s jitted (6.4x); div16 0.83 s vs the 6.16 s recorded in r4 (7.4x,
    vs the 2.5 s round-3 target). This is the same goal the deleted chain VM
    chased with a hand-microcoded Pallas kernel — XLA program fusion gets
    there without one.

    Auto = TPU backend only: on CPU (the test suite) the per-shape XLA
    compile of a many-hundred-kernel program would dwarf the eager run.
    TFHE_TPU_CIRCUIT_JIT=0/1 forces."""
    v = flag("TFHE_TPU_CIRCUIT_JIT")
    if v in ("0", "1"):
        return v == "1"
    import jax
    return jax.default_backend() == "tpu"


def policy_fingerprint() -> tuple:
    """Every flag that changes a circuit's TRACE structure, used as part of
    the whole-circuit jit cache key so a runtime flag flip (the A/B benches
    do this) retraces instead of silently reusing the old route."""
    return (flag("TFHE_TPU_PALLAS"), flag("TFHE_TPU_LOOKAHEAD"),
            flag("TFHE_TPU_SEPTET"), flag("TFHE_TPU_FUSEKS"),
            flag("TFHE_TPU_NOISE_MODEL", "average"))


def noise_model() -> str:
    """Noise-accounting model the compressor planner certifies against
    (NOISE.md §2): "average" (default — the physically realized per-sample
    variance, rigorous for uniform ciphertexts and confirmed by hardware to
    9%), "measured" (the v5e-calibrated constant), or "tracked" (the
    worst-case-digit constants the runtime cv bookkeeping carries — the
    loose bound the reference also uses but never audits). The planner caps
    every ±1/16 image's live-input count so its z-score under the ACTIVE
    model stays >= 5 (phasesim.max_live16); under "tracked" that demotes
    7-way septets (z = 4.1) to the full-adder domain (z >= 12.3).
    TFHE_TPU_NOISE_MODEL overrides."""
    v = flag("TFHE_TPU_NOISE_MODEL", "average")
    if v not in ("average", "measured", "tracked"):
        raise ValueError(f"TFHE_TPU_NOISE_MODEL={v!r}: want average|measured|tracked")
    return v


def packed_unroll() -> int:
    """Grid-unroll factor for the packed small-batch kernel. Callers must
    read this ONCE at import (jit caches by shape, so a trace-time read
    would silently keep the first compile's value)."""
    return int(flag("TFHE_PACKED_UNROLL", "1"))


def ref_dir() -> str:
    """Location of the reference checkout (differential-oracle build)."""
    return flag("REF_DIR", "/root/reference/gpuParallel")
