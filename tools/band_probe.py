"""Idle N-run variance-band probe for bench rows (the r11/r12 verdict
protocol: a new gate row pre-registers its idle band BEFORE the driver
run sets its ratchet baseline, so a later advisory can be read against
a measured distribution instead of a single mark).

Runs each named query N times at sf0.1 (warmup first, cache cleared
per run, queries interleaved so monotonic process drift biases each
equally) and prints median + min-max band per query.

Usage: python tools/band_probe.py q1[,q2,...] [--runs 10]
       [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries")
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    names = [q for q in args.queries.split(",") if q]

    load1 = float(open("/proc/loadavg").read().split()[0])
    if load1 > 4.0:
        print(f"WARNING loadavg {load1:.1f} — rerun idle", file=sys.stderr)

    from concerts_etl_sa_spark.session import get_spark

    import __spark_entry__ as entrymod
    from bench import _extra_queries

    spark = get_spark("band_probe")
    qs = {**entrymod.queries(), **_extra_queries()}
    for n in names:
        qs[n](spark, args.sf).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.runs):
        for n in names:
            t0 = time.time()
            qs[n](spark, args.sf).write.format("noop").mode("overwrite").save()
            samples[n].append(time.time() - t0)
            spark.catalog.clearCache()
    out = {
        n: {
            "median": round(statistics.median(v), 2),
            "min": round(min(v), 2),
            "max": round(max(v), 2),
        }
        for n, v in samples.items()
    }
    print(json.dumps({"loadavg_start": load1, "runs": args.runs,
                      "sf": args.sf, "bands": out}))
    for n, b in out.items():
        print(f"  {n}: median {b['median']}s band {b['min']}-{b['max']}s",
              file=sys.stderr)


if __name__ == "__main__":
    main()
