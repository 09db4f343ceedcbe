"""Oracle-side mmap-pressure probe (round-14 flake diagnosis).

Round 10 logged an "unreproduced one-off": l2_topk_cosine_ivf failed a
full sf0.01 verify batch once, then passed every rerun. Round 14 hit
the same signature twice (two CONSECUTIVE registry rows), then a loop
reproduced it Spark-free: DuckDB 1.0 raised
``Out of Memory Error: Failed to allocate block of 16384 bytes (bad
allocation)`` with process RSS ~1 GB and 120 GB free, and eventually
segfaulted inside duckdb's own .so. Root cause (this probe's output):
the unrolled 64-term dot-product SQL built ~300-node expression trees
per cosine, and executing them over cross joins made duckdb allocate
TENS OF THOUSANDS of transient mmaps per query (measured: +53k during
one IVF oracle execute) — crossing the kernel's vm.max_map_count
(65530, /proc/sys/vm/max_map_count) after ~126 executes on one
connection. mmap exhaustion surfaces as bad_alloc at tiny sizes:
a spurious OOM, load-timing-dependent, hence "unreproducible".

Fix: similarity._dot_sql/_norm2_sql now emit ``list_inner_product``
(verified bit-exact vs the left-associated chain on 2000 adversarial
mixed-exponent trials at derivation — 200 re-run as a permanent pin in
tests/test_oracle_sql_form.py — and by full 50/50 verify at
sf0.001/0.01/0.1);
peak transient maps dropped to ~12k. This probe re-measures per-oracle
map growth so a future oracle that regresses toward the ceiling is
visible before it flakes.

Usage: python tools/duck_maps_probe.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

from verify_local import TABLES  # noqa: E402 — ONE table list, not a copy

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def nmaps() -> int:
    with open(f"/proc/{os.getpid()}/maps") as f:
        return sum(1 for _ in f)


def main() -> None:
    import __spark_entry__ as E

    oracles = E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    ceiling = int(open("/proc/sys/vm/max_map_count").read())
    print(f"map ceiling: {ceiling}; start maps: {nmaps()}")
    peak = 0
    skipped: set[str] = set()
    for r in range(ROUNDS):
        for name, sql in oracles.items():
            b = nmaps()
            try:
                con.execute(sql).arrow()
                con.execute(sql).fetchall()
            except duckdb.IOException as ex:
                # pipeline_landing's twin reads Spark-side-generated
                # landing files under a PER-PROCESS path (round-15) —
                # this Spark-free probe has no generation step, so that
                # one row is probe-invisible by design. Anything else
                # missing is a real error.
                if "spark_graft_landing_window" in str(ex):
                    if name not in skipped:
                        skipped.add(name)
                        print(f"  skip {name}: needs Spark-side landing "
                              "generation (probe is duck-only)")
                    continue
                raise
            a = nmaps()
            peak = max(peak, a)
            if a - b > 1000:
                print(f"  r{r} {name}: maps {b} -> {a} (+{a - b})")
        print(f"round {r + 1}: maps={nmaps()}")
    print(f"peak maps {peak} ({100 * peak // ceiling}% of ceiling)")
    if peak > ceiling // 2:
        print("WARNING: peak over half the ceiling — an oracle is "
              "regressing toward the round-14 mmap flake")
        raise SystemExit(1)


if __name__ == "__main__":
    main()
