"""Per-stage attribution of unreg_l2_topk_cosine_ivfpq_trained
(round-10 verdict #4: the slowest gated row at 9.8 s — same standard as
the round-10 ngram stage probe: name where the time goes, then either
fix it or document the bound).

Stages of the composition (operators/pq.py:topk_cosine_ivfpq_trained):
  coarse_fit   kmeans_fit(k=8)           — Lloyd coarse centroids
  pq_train     pq_train_fused            — 1 init + max_iters fused jobs
  probe_score  topk_cosine_ivfpq_df      — encode + inverted-list prune
                                           + broadcast-ADC scoring + rank
The end-to-end row is timed alongside so the stage sum can be checked
against it (shared-scan effects make the sum slightly exceed the whole).

Usage: python tools/ivfpq_stage_probe.py [--runs 3] [--sf /root/testdata/sf0.1]
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
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    load1 = float(open("/proc/loadavg").read().split()[0])
    if load1 > 4.0:
        print(f"WARNING loadavg {load1:.1f} — rerun idle", file=sys.stderr)

    from concerts_etl_sa_spark.operators import pq as PQ
    from concerts_etl_sa_spark.operators.kmeans import centroids_df, kmeans_fit
    from concerts_etl_sa_spark.operators.pq import (
        PQ_M,
        pq_codebook_from_trained,
        pq_train_fused,
        topk_cosine_ivfpq_df,
        topk_cosine_ivfpq_trained,
    )
    from concerts_etl_sa_spark.operators.similarity import _emb_normed, _norm2
    from concerts_etl_sa_spark.session import get_spark
    from concerts_etl_sa_spark.sources.readers import load_table

    spark = get_spark("ivfpq_stage_probe")

    def run_stages() -> dict[str, float]:
        t: dict[str, float] = {}
        emb = load_table(spark, args.sf, "embeddings")
        t0 = time.time()
        fitted, _ = kmeans_fit(emb, k=8, max_iters=3)
        t["coarse_fit"] = time.time() - t0
        t0 = time.time()
        books = pq_train_fused(emb, m=PQ_M, max_iters=3)
        t["pq_train"] = time.time() - t0
        coarse = centroids_df(spark, fitted).withColumn(
            "c_n2", _norm2("centroid_vec")
        )
        t0 = time.time()
        topk_cosine_ivfpq_df(
            _emb_normed(spark, args.sf),
            coarse,
            pq_codebook_from_trained(spark, books),
            nprobe=2,
        ).write.format("noop").mode("overwrite").save()
        t["probe_score"] = time.time() - t0
        spark.catalog.clearCache()
        t0 = time.time()
        topk_cosine_ivfpq_trained(spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        t["end_to_end"] = time.time() - t0
        spark.catalog.clearCache()
        return t

    run_stages()  # warmup (codegen)
    spark.catalog.clearCache()
    samples: dict[str, list[float]] = {}
    for _ in range(args.runs):
        for k, v in run_stages().items():
            samples.setdefault(k, []).append(v)
    med = {k: round(statistics.median(v), 2) for k, v in samples.items()}
    med["stage_sum"] = round(
        med["coarse_fit"] + med["pq_train"] + med["probe_score"], 2
    )
    print(json.dumps({"loadavg_start": load1, "runs": args.runs,
                      "sf": args.sf, "t": med}))
    for k, v in med.items():
        print(f"  {k}: {v}s", file=sys.stderr)


if __name__ == "__main__":
    main()
