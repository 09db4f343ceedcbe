"""Pin the bench-regression gate (tools/bench_audit.py).

The gate must (a) pass a replay of the best prior round, (b) flag an
injected regression beyond band+floor, (c) tolerate swings inside the
documented variance band — the r2->r3 no-code-change drift class.
"""

from __future__ import annotations

import importlib.util
import sys


def _audit_mod():
    spec = importlib.util.spec_from_file_location(
        "bench_audit", "/root/repo/tools/bench_audit.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_audit"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_clean_replay_passes():
    ba = _audit_mod()
    prior = ba.best_prior({"e1_pricing_summary"})
    assert prior, "no BENCH_r*.json history found"
    sec, _src = prior["e1_pricing_summary"]
    regs, _ = ba.audit({"queries": {"e1_pricing_summary": sec}})
    assert regs == []


def test_injected_regression_fails():
    ba = _audit_mod()
    prior = ba.best_prior({"e1_pricing_summary"})
    sec, _src = prior["e1_pricing_summary"]
    regs, _ = ba.audit({"queries": {"e1_pricing_summary": sec * 3 + 1}})
    assert len(regs) == 1 and "e1_pricing_summary" in regs[0]


def test_inside_band_tolerated():
    ba = _audit_mod()
    prior = ba.best_prior({"l3_pii_redact"})
    sec, _src = prior["l3_pii_redact"]
    # +25% + 0.2s absolute: inside REL_BAND + ABS_FLOOR
    regs, _ = ba.audit({"queries": {"l3_pii_redact": sec * 1.25 + 0.2}})
    assert regs == []


def test_unknown_query_is_baseline_not_failure():
    ba = _audit_mod()
    regs, lines = ba.audit({"queries": {"brand_new_query": 99.0}})
    assert regs == []
    assert any("baseline" in l for l in lines)
