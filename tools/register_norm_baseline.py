"""One-time registration of the canary-normalized bench bands
(round-14 verdict #1 — run at the gate switch, then never again: from
BENCH_r14.json on, the normalized series ratchets through the ordinary
BENCH_r*.json history in tools/bench_audit.py).

Reads N bench.py result JSONs from interleaved idle sittings and writes
tools/norm_baseline.json:
  canary_ref    — the registered idle canary mark (min of the sittings'
                  canary medians: the truest measure of deliverable host
                  CPU, and the divisor that converts the ±0.35 s noise
                  floor into normalized units)
  queries_norm  — per query, the MIN of the sittings' marks, where a
                  sitting's mark is itself bench.py's min-of-bracketed-
                  runs statistic (_norm_mark) — i.e. min-of-mins, NOT a
                  median (best-prior semantics, same as the ratchet;
                  round-14 advisory: re-registrations must recompute
                  this exact statistic)

Usage:
  python tools/register_norm_baseline.py s1.json s2.json [...]
"""

from __future__ import annotations

import json
import os
import sys

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "norm_baseline.json")


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    sittings = []
    for p in sys.argv[1:]:
        with open(p) as f:
            sittings.append((os.path.basename(p), json.load(f)))
    canaries = [s["canary_median"] for _, s in sittings]
    norms: dict[str, float] = {}
    for _, s in sittings:
        for q, m in (s.get("queries_norm") or {}).items():
            if q not in norms or m < norms[q]:
                norms[q] = float(m)
    out = {
        "canary_ref": min(canaries),
        "canary_medians_registered": canaries,
        "sittings": [n for n, _ in sittings],
        "queries_norm": dict(sorted(norms.items())),
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"registered {len(norms)} rows, canary_ref={out['canary_ref']}")


if __name__ == "__main__":
    main()
