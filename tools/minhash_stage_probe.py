"""Per-stage scaling probe for the CAPPED minhash-LSH pair op.

Round-11 watch item (c): capped minhash at cap=256 / 125x flood (the
PRE-saturation bounded-quadratic regime — 125 twins per band bucket vs
a 256 cap means most buckets still emit C(membership, 2) pairs) ran
~145 s post hashed-shingle fix. The round-12 verdict asks whether the
exact-Jaccard verify over the ~6.5M candidates is one skew-eligible
join away from better balance, or already balanced — measure first.

Stages (each forced with its own action, interleaved across scales per
the BASELINE A/B rule):

  stage1  shingle frame build (tokenize -> 3-gram shingles), count
  stage2  minhash signature build over the persisted shingles, count
  stage3  band frame -> capped_candidates, count — reports n_cand
  stage4  full op (re-attach hashed shingles + exact Jaccard verify),
          count — reports n_pairs; t_full is the whole operator so
          t_full - (t_shingle + t_cand-ish stages) bounds the verify
  skew    join-KEY balance of the verify's two re-attach equi-joins
          (max/mean/p99 key multiplicity of a_id and b_id over the
          candidate set) — join skew is a data property of the build
          keys; if the hottest key holds ~mean multiplicity the
          shuffle_hash join is balanced by construction and no AQE
          skew split could help.

Usage: python tools/minhash_stage_probe.py [--scales 1,25,125]
       [--runs 3] [--cap 256]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,25,125")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cap", type=int, default=256)
    args = ap.parse_args()
    scales = [int(x) for x in args.scales.split(",")]

    from scale_probe import build_scaled

    dirs = build_scaled(scales, flood=True)

    from concerts_etl_sa_spark.session import get_spark

    spark = get_spark("minhash_stage_probe")
    load1 = float(open("/proc/loadavg").read().split()[0])

    from pyspark.sql import functions as F

    from concerts_etl_sa_spark.operators import dedup as D
    from concerts_etl_sa_spark.operators.util import capped_candidates

    def _key_balance(cand) -> dict:
        """Join-key multiplicity stats of the candidate set on BOTH
        re-attach keys. The verify joins cand->shingles on a_id then
        b_id with shuffle_hash; a hot key (one doc in millions of
        pairs) is the only way those joins skew."""
        out = {}
        for key in ("a_id", "b_id"):
            row = (
                cand.groupBy(key)
                .count()
                .agg(
                    F.max("count").alias("mx"),
                    F.avg("count").alias("mean"),
                    F.expr("percentile_approx(count, 0.99)").alias("p99"),
                    F.count(F.lit(1)).alias("n_keys"),
                )
                .collect()[0]
            )
            out[key] = {
                "max": int(row["mx"]),
                "mean": round(float(row["mean"]), 2),
                "p99": int(row["p99"]),
                "n_keys": int(row["n_keys"]),
            }
        return out

    def stages(sf: str) -> dict:
        out: dict = {}
        t0 = time.time()
        ds = D._docs_with_shingles(spark, sf).persist()
        ds.count()
        out["t_shingle"] = round(time.time() - t0, 3)
        t0 = time.time()
        sig = ds.select("doc_id", *D._minhash_cols(F.col("shingles"))).persist()
        sig.count()
        out["t_sig"] = round(time.time() - t0, 3)
        t0 = time.time()
        bands = D._band_frame(sig)
        cand = capped_candidates(
            bands.select("doc_id", F.col("band_fp")), args.cap, "star"
        ).persist()
        out["n_cand"] = cand.count()
        out["t_cand"] = round(time.time() - t0, 3)
        t0 = time.time()
        verified = D._verify_jaccard(
            cand, ds, D.JACCARD_THRESHOLD, single_partition_sort=False
        )
        out["n_pairs"] = verified.count()
        out["t_verify"] = round(time.time() - t0, 3)
        out["key_balance"] = _key_balance(cand)
        cand.unpersist()
        sig.unpersist()
        ds.unpersist()
        spark.catalog.clearCache()
        return out

    stages(dirs[scales[0]])  # warmup

    per_scale: dict[int, list[dict]] = {s: [] for s in scales}
    for _ in range(args.runs):
        for s in scales:
            per_scale[s].append(stages(dirs[s]))

    result = {}
    for s in scales:
        runs = per_scale[s]
        result[str(s)] = {
            k: (
                runs[-1][k]
                if k.startswith("n_") or k == "key_balance"
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
