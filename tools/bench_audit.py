"""Bench-regression gate — the wall-time twin of tools/plan_audit.py.

Compares a fresh bench run (JSON from bench.py) against the best prior
mark per query across every BENCH_r*.json in the repo root, failing on
regressions that exceed the documented variance band. Rationale: two of
round 4's perf own-goals (e1 spread serialization +99%, d8 persist tax
+53%) were mechanistic, attributable to single commits, and would have
been caught by exactly this check before landing.

Variance model (from the r1-r4 history, VERDICT r4 "Performance" table):
single-shot p50-of-3 marks at sf0.1 local[32] swing with GC/codegen/host
noise — r2->r3 moved 0.32 s -> 0.75 s on l1_ngram_jaccard_pairs with ZERO
code change. So the gate allows ``best_prior * (1 + REL_BAND)`` plus an
absolute ``ABS_FLOOR`` (sub-second queries live in a noise band where 30%
of 0.3 s is meaningless).

Usage:
  python bench.py > /tmp/bench_new.json
  python tools/bench_audit.py /tmp/bench_new.json        # gate vs history
  python tools/bench_audit.py /tmp/bench_new.json --explain
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# >30% above the best prior mark, outside the absolute noise floor,
# fails the gate (REL_BAND per the round-4 judge prescription).
REL_BAND = 0.30
# absolute slack: queries under ~1 s routinely swing +-0.3 s run-to-run
# (l3_pii_redact 0.18<->0.34, l5_mixture_sample 0.18<->0.35 across r3/r4
# with no code change on their paths)
ABS_FLOOR = 0.35


def best_prior(queries: set[str]) -> dict[str, tuple[float, str]]:
    """{query: (best seconds, source file)} across all BENCH_r*.json."""
    best: dict[str, tuple[float, str]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:
            continue
        # driver rounds wrap the bench line under "parsed"
        if "queries" not in data and isinstance(data.get("parsed"), dict):
            data = data["parsed"]
        for q, sec in (data.get("queries") or {}).items():
            if q in queries and (q not in best or sec < best[q][0]):
                best[q] = (float(sec), os.path.basename(path))
    return best


def audit(new: dict) -> tuple[list[str], list[str]]:
    """Returns (regressions, report_lines) for a bench.py result dict."""
    newq = {q: float(s) for q, s in (new.get("queries") or {}).items()}
    prior = best_prior(set(newq))
    regressions: list[str] = []
    lines: list[str] = []
    for q, sec in newq.items():
        if q not in prior:
            lines.append(f"  {q}: {sec:.2f}s (no prior mark — baseline)")
            continue
        ref, src = prior[q]
        limit = ref * (1.0 + REL_BAND) + ABS_FLOOR
        verdict = "ok" if sec <= limit else "REGRESSION"
        lines.append(
            f"  {q}: {sec:.2f}s vs best {ref:.2f}s ({src}), "
            f"limit {limit:.2f}s -> {verdict}"
        )
        if sec > limit:
            regressions.append(
                f"{q}: {sec:.2f}s > {limit:.2f}s "
                f"(best prior {ref:.2f}s in {src})"
            )
    return regressions, lines


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    with open(sys.argv[1]) as f:
        new = json.load(f)
    regressions, lines = audit(new)
    if "--explain" in sys.argv or regressions:
        print("\n".join(lines))
    total = new.get("value")
    print(f"total: {total}s across {len(new.get('queries') or {})} queries")
    if regressions:
        print("BENCH REGRESSIONS (fix or document the variance band):")
        for r in regressions:
            print(f"  {r}")
        raise SystemExit(1)
    print("bench gate: pass")


if __name__ == "__main__":
    main()
