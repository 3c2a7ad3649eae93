"""Analytic noise-budget regression (VERDICT r3 #6).

Pins the phase-simulator certificate (tfhe_tpu/utils/phasesim.py) at the
worst-case compressor depth so a margin miscalibration in the default-on
septet path fails CI instead of silently corrupting multiplies. NOISE.md
derives the models; tools/noise_budget.py is the full audit.
"""
import numpy as np
import pytest

from tfhe_tpu.params import PARAMS_110
from tfhe_tpu.utils import phasesim as ps
from tfhe_tpu import arith

GATE_BUDGET = 2.0 ** -25


def _run(builder, sample_var, trials=2, seed=5):
    sims = []
    rng = np.random.RandomState(seed)
    for _ in range(trials):
        with ps.PhaseSim(PARAMS_110, sample_var=sample_var) as sim:
            out = builder(sim, rng)
            sim.final_record(out)
            sims.append(sim)
    return ps.analyze(sims, PARAMS_110)


def _mul16(sim, rng):
    av, bv = int(rng.randint(0, 1 << 16)), int(rng.randint(0, 1 << 16))
    out = arith.mul(sim.encrypt_int(av, 16), sim.encrypt_int(bv, 16), sim.cloud)
    got = int(sim.decrypt_int(out, signed=False)) % (1 << 16)
    assert got == (av * bv) % (1 << 16), "exact-DAG decrypt mismatch"
    return out


def _add32(sim, rng):
    av, bv = int(rng.randint(0, 1 << 30)), int(rng.randint(0, 1 << 30))
    out = arith.add(sim.encrypt_int(av, 32), sim.encrypt_int(bv, 32), sim.cloud)
    got = int(sim.decrypt_int(out, signed=False)) % (1 << 32)
    assert got == (av + bv) % (1 << 32), "exact-DAG decrypt mismatch"
    return out


def test_septet_mul16_budget(monkeypatch):
    """The default septet multiplier at the measured and average-case noise
    models must clear the per-op failure budget (n_images * 2^-25), with the
    weakest image at z >= 5.5 (measured) / 6.2 (average)."""
    monkeypatch.setenv("TFHE_TPU_SEPTET", "1")
    rep_m = _run(_mul16, ps.SAMPLE_VAR_MEASURED_110)
    assert rep_m["min_z"] >= 5.5, rep_m
    assert rep_m["sum_pfail"] <= rep_m["images_live"] * GATE_BUDGET, rep_m

    rep_a = _run(_mul16, ps.sample_var_average(PARAMS_110))
    assert rep_a["min_z"] >= 6.2, rep_a
    assert rep_a["sum_pfail"] <= rep_a["images_live"] * GATE_BUDGET, rep_a

    # the known limitation stays known: under the worst-case-digit tracked
    # model the septet margin is z ~ 4.1 (documented in NOISE.md); if this
    # ever *improves* past the classic budget the doc should be updated.
    rep_t = _run(_mul16, ps.sample_var_tracked(PARAMS_110))
    assert 3.8 <= rep_t["min_z"] <= 5.0, rep_t


def test_classic_circuits_worst_case_budget(monkeypatch):
    """±1/8 circuits (ripple/prefix adders, FA fallback) must clear the
    budget even under the conservative tracked model (z >= 12)."""
    monkeypatch.setenv("TFHE_TPU_SEPTET", "0")
    rep = _run(_add32, ps.sample_var_tracked(PARAMS_110))
    assert rep["min_z"] >= 12.0, rep
    assert rep["sum_pfail"] <= rep["images_live"] * GATE_BUDGET, rep


def test_tracked_model_demotes_septets(monkeypatch):
    """VERDICT r4 #6: the planner CONSUMES the noise accounting. With the
    worst-case-constant "tracked" model active, max_live16 resolves to 4,
    _septet_enabled demotes the reduction to the FA domain, and the
    resulting circuit certifies z >= 5 under the SAME tracked accounting —
    the z = 4.1 gap is closed by the planner, not a footnote."""
    monkeypatch.setenv("TFHE_TPU_NOISE_MODEL", "tracked")
    monkeypatch.setenv("TFHE_TPU_SEPTET", "1")   # demotion beats the force flag
    assert ps.max_live16(PARAMS_110) == 4
    rep = _run(_mul16, ps.sample_var_tracked(PARAMS_110))
    assert rep["min_z"] >= 5.0, rep
    assert rep["sum_pfail"] <= rep["images_live"] * GATE_BUDGET, rep


def test_tracked_model_caps_forced_16_domain(monkeypatch):
    """Bits already encoded at ±1/16 (has16) must run the septet ENGINE, but
    under the tracked model its level planner caps group liveness at 4 so no
    image exceeds the certificate: min tracked z >= 5 on a 9-high column."""
    monkeypatch.setenv("TFHE_TPU_NOISE_MODEL", "tracked")
    from tfhe_tpu import gates

    def build(sim, rng):
        bits = rng.randint(0, 2, size=9).astype(np.int32)
        c = sim.encrypt_bits(bits)
        # recode fresh bits into the ±1/16 domain like compressor internals
        rec = gates.bootstrap_images(c, np.full(9, gates.MU16, np.int32),
                                     sim.cloud)
        out = arith._wallace_sum_bits(rec, np.zeros(9, np.int64), 4,
                                      sim.cloud, amp=np.full(9, 16))
        got = int(sim.decrypt_int(out, signed=False))
        assert got == int(bits.sum()), "exact-DAG decrypt mismatch"
        return out

    rep = _run(build, ps.sample_var_tracked(PARAMS_110))
    assert rep["min_z"] >= 5.0, rep


def test_lattice_unit_extraction():
    ph = np.array([3 << 28, -(1 << 28), 5 << 29, 1 << 30, -(7 << 30)], np.int64)
    u = ps._unit_t32(ph)
    assert np.allclose(u, [2**28 / 2**32, 2**28 / 2**32, 2**29 / 2**32,
                           2**30 / 2**32, 2**30 / 2**32])


def test_phase_sim_matches_real_crypto_counts(monkeypatch):
    """The simulator walks the same DAG as the real pipeline: image counts
    must be deterministic and the simulated multiply exact for many inputs."""
    monkeypatch.setenv("TFHE_TPU_SEPTET", "1")
    rng = np.random.RandomState(3)
    counts = set()
    for _ in range(4):
        with ps.PhaseSim(PARAMS_110) as sim:
            av, bv = int(rng.randint(0, 256)), int(rng.randint(0, 256))
            out = arith.mul(sim.encrypt_int(av, 8), sim.encrypt_int(bv, 8),
                            sim.cloud)
            assert int(sim.decrypt_int(out, signed=False)) % 256 == (av * bv) % 256
            counts.add(sum(r.phases.size for r in sim.records))
    assert len(counts) == 1
