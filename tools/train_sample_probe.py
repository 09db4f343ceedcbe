"""A/B probe: sample-bounded vs full-corpus k-means / PQ training at
replica scale (round 12 — the FAISS max-points-per-centroid device,
kmeans.train_sample).

Measures, in ONE process with per-round interleaving (the BASELINE.md
A/B discipline — cross-sitting absolutes drift; only within-run
alternation is trustworthy):

- pq_train_fused: full corpus vs train_sample_rows=256*PQ_K
- kmeans_fit (coarse, k=8): full vs train_sample_rows=256*8
- topk_cosine_ivfpq_trained whole-op (the shipped composition, which
  now carries both caps) — its training stages should shrink to the
  sample-sized cost while encode/assign (necessarily corpus-sized)
  dominate what remains.

At 125x (250k embeddings) the caps thin training ~61x (PQ) / ~122x
(coarse); at bench scale (2k rows) they never engage, so the shipped
query is bit-identical there — this probe is where the win is visible.

Usage: python tools/train_sample_probe.py [--scales 25,125] [--runs 2]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_probe import build_scaled  # noqa: E402  (tools/ sibling)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="25,125")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()
    scales = [int(x) for x in args.scales.split(",")]

    load1 = float(open("/proc/loadavg").read().split()[0])
    if load1 > 4.0:
        print(
            f"train_sample_probe WARNING: loadavg {load1:.1f} — rerun idle",
            file=sys.stderr,
        )
    dirs = build_scaled(scales, flood=False)

    from concerts_etl_sa_spark.operators import pq
    from concerts_etl_sa_spark.operators.kmeans import (
        TRAIN_POINTS_PER_CENTROID,
        kmeans_fit,
    )
    from concerts_etl_sa_spark.session import get_spark
    from concerts_etl_sa_spark.sources.readers import load_table

    spark = get_spark("train_sample_probe")

    def pq_full(sf):
        pq.pq_train_fused(load_table(spark, sf, "embeddings"))

    def pq_samp(sf):
        pq.pq_train_fused(
            load_table(spark, sf, "embeddings"),
            train_sample_rows=TRAIN_POINTS_PER_CENTROID * pq.PQ_K,
        )

    def coarse_full(sf):
        kmeans_fit(load_table(spark, sf, "embeddings"), k=8, max_iters=3)

    def coarse_samp(sf):
        kmeans_fit(
            load_table(spark, sf, "embeddings"),
            k=8,
            max_iters=3,
            train_sample_rows=TRAIN_POINTS_PER_CENTROID * 8,
        )

    def ivfpq_shipped(sf):
        pq.topk_cosine_ivfpq_trained(spark, sf).write.format("noop").mode(
            "overwrite"
        ).save()

    variants = {
        "pq_train_full": pq_full,
        "pq_train_sampled": pq_samp,
        "coarse_fit_full": coarse_full,
        "coarse_fit_sampled": coarse_samp,
        "ivfpq_trained_shipped": ivfpq_shipped,
    }

    # warmup at the smallest scale (JIT/codegen), then interleave
    # variants within each round so process drift biases all equally
    for fn in variants.values():
        fn(dirs[scales[0]])
    spark.catalog.clearCache()

    results: dict[str, dict] = {name: {} for name in variants}
    for s in scales:
        per: dict[str, list[float]] = {name: [] for name in variants}
        for _ in range(args.runs):
            for name, fn in variants.items():
                t0 = time.time()
                fn(dirs[s])
                per[name].append(time.time() - t0)
                spark.catalog.clearCache()
        for name in variants:
            results[name][str(s)] = round(statistics.median(per[name]), 3)
            print(
                f"x{s} {name}: {per[name]} -> {results[name][str(s)]}",
                file=sys.stderr,
            )

    print(
        json.dumps(
            {
                "scales": scales,
                "runs": args.runs,
                "loadavg_start": load1,
                "ops": results,
            }
        )
    )


if __name__ == "__main__":
    main()
