"""Round-11 A/B: two-level vs three-level assignment at 25x / 125x.

Interleaved in-process measurement (BASELINE.md discipline) of the
semdedup_auto production form (assign_nprobe=2) with the routing tier
selected by overriding kmeans.THREE_LEVEL_MIN_K: 10**9 forces two-level
at every K; 64 forces three-level wherever two-level would engage.
The shipped dispatch threshold is then chosen from this table.

Usage: python tools/tl3_ab.py [--runs 2] [--scales 25,125]
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
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--scales", default="25,125")
    args = ap.parse_args()
    scales = [int(x) for x in args.scales.split(",")]

    load1 = float(open("/proc/loadavg").read().split()[0])
    if load1 > 4.0:
        print(f"WARNING loadavg {load1:.1f} — rerun idle", file=sys.stderr)

    from tools.scale_probe import build_scaled

    dirs = build_scaled(scales, flood=False)

    from concerts_etl_sa_spark.operators import kmeans as KM
    from concerts_etl_sa_spark.operators.semdedup import semdedup_auto
    from concerts_etl_sa_spark.session import get_spark

    spark = get_spark("tl3_ab")
    arms = {"two_level": 10**9, "three_level": 64}

    # warmup both arms at the smallest scale
    for thr in arms.values():
        KM.THREE_LEVEL_MIN_K = thr
        semdedup_auto(spark, dirs[scales[0]], assign_nprobe=2).write.format(
            "noop"
        ).mode("overwrite").save()
        spark.catalog.clearCache()

    out: dict[str, dict] = {a: {} for a in arms}
    for s in scales:
        per = {a: [] for a in arms}
        for _ in range(args.runs):
            for arm, thr in arms.items():
                KM.THREE_LEVEL_MIN_K = thr
                t0 = time.time()
                semdedup_auto(
                    spark, dirs[s], assign_nprobe=2
                ).write.format("noop").mode("overwrite").save()
                per[arm].append(time.time() - t0)
                spark.catalog.clearCache()
        for arm in arms:
            out[arm][str(s)] = round(statistics.median(per[arm]), 2)
            print(f"x{s} {arm}: {out[arm][str(s)]}s  (runs {per[arm]})",
                  file=sys.stderr)
    print(json.dumps({"loadavg_start": load1, "runs": args.runs,
                      "t": out}))


if __name__ == "__main__":
    main()
