"""Per-stage scaling probe for the capped n-gram Jaccard pair op.

Round-9 flood probe left one unexplained segment: capped ngram went
2.83 s (5x) -> 25.15 s (25x), segment alpha ~1.36 despite the per-bucket
cap. Hypotheses (VERDICT r9 #2): (a) the shingle re-attach equi-join's
build side growing with corpus size, (b) distinct-shingle explosion,
(c) candidate-pair volume itself — the cap is a per-bucket PAIR bound
that only saturates once bucket membership exceeds it, so below
saturation the within-bucket pair count grows quadratically in the
duplication factor R (C(R,2) per natural bucket) and THAT is output
semantics, not overhead.

This probe times the three stages separately at each flood scale and
counts candidates/pairs, so the tail attributes to a named stage:

  stage1  shingle index build (tokenize -> 3-gram shingles), forced via
          count on the persisted frame
  stage2  capped_candidates over (doc_id, min_sh), forced via count —
          reports n_cand
  stage3  full op (re-attach + exact Jaccard + threshold), forced via
          noop write — reports n_pairs

Usage: python tools/ngram_stage_probe.py [--scales 1,5,25] [--runs 3]
       [--cap 256]
Prints one JSON line. Interleaves scales per the BASELINE A/B rule.
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
    ap.add_argument("--scales", default="1,5,25")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cap", type=int, default=256)
    args = ap.parse_args()
    scales = [int(x) for x in args.scales.split(",")]

    from scale_probe import build_scaled

    dirs = build_scaled(scales, flood=True)

    from concerts_etl_sa_spark.session import get_spark

    spark = get_spark("ngram_stage_probe")
    load1 = float(open("/proc/loadavg").read().split()[0])

    from pyspark.sql import functions as F

    from concerts_etl_sa_spark.operators import dedup as D
    from concerts_etl_sa_spark.operators.util import capped_candidates

    def stages(sf: str) -> dict:
        out: dict = {}
        t0 = time.time()
        ds = D._docs_with_shingles(spark, sf).persist()
        ds.count()
        out["t_shingle"] = round(time.time() - t0, 3)
        keyed = ds.select(
            "doc_id", F.array_min("shingles").alias("min_sh")
        )
        t0 = time.time()
        cand = capped_candidates(
            keyed.select("doc_id", F.col("min_sh").alias("band_fp")),
            args.cap,
            "star",
            multi_band=False,
        )
        out["n_cand"] = cand.count()
        out["t_cand"] = round(time.time() - t0, 3)
        t0 = time.time()
        full = D.ngram_jaccard_pairs_df(ds, max_bucket_size=args.cap)
        out["n_pairs"] = full.count()
        out["t_full_minus_shingle"] = round(time.time() - t0, 3)
        ds.unpersist()
        spark.catalog.clearCache()
        return out

    # warmup at the smallest scale
    stages(dirs[scales[0]])

    per_scale: dict[int, list[dict]] = {s: [] for s in scales}
    for _ in range(args.runs):
        for s in scales:
            per_scale[s].append(stages(dirs[s]))

    result = {}
    for s in scales:
        runs = per_scale[s]
        result[str(s)] = {
            k: (
                runs[0][k]
                if k.startswith("n_")
                else round(statistics.median(r[k] for r in runs), 3)
            )
            for k in runs[0]
        }
    print(
        json.dumps(
            {
                "mode": "flood",
                "cap": args.cap,
                "runs": args.runs,
                "loadavg_start": load1,
                "stages": result,
            }
        )
    )


if __name__ == "__main__":
    main()
