"""Shared physical-plan helpers for operators."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def driver_rows_df(spark, rows, schema) -> DataFrame:
    """DataFrame over DRIVER-RESIDENT rows laid out as ONE partition.

    ``createDataFrame(list)`` parallelizes tiny driver payloads across
    ``defaultParallelism`` slices, so every broadcast built from one (a
    centroid row, a codebook, a routing index, a rotation matrix) pays
    a defaultParallelism-task mini-job with a shuffle before the
    BroadcastExchange even starts — measured 0.52 s → 0.28 s per
    broadcast at local[32] for the k-means assignment device
    (OPTIMIZATION_r15.md). One slice is the right layout at every
    scale: these payloads are bounded driver state (K·dim floats) whose
    only consumers are a broadcast or a collect, and a single slice
    preserves row order exactly as the multi-slice union did, so
    downstream ``collect_list`` aggregates are bit-identical.
    """
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )


def sorted_small(df: DataFrame, *cols) -> DataFrame:
    """Total order for a SMALL (aggregate/top-k/pair-list) result without
    ``orderBy``'s range-partitioner sampling job — which re-executes the
    entire upstream lineage once just to pick partition bounds. One
    explicit shuffle to a single partition + in-partition sort produces
    the identical total order in a single pass.

    Only for dimension-sized outputs (the callers' outputs are bounded by
    group counts / top-k / near-dup pair counts). A 100 TB-sized result
    should use ``orderBy`` and accept the sampling pass.
    """
    return df.repartition(1).sortWithinPartitions(*cols)


def capped_candidates(
    bands: DataFrame,
    max_bucket_size: int,
    heavy_bucket_mode: str,
    multi_band: bool = True,
) -> DataFrame:
    """Candidate pairs from a (doc_id, band_fp) bucket frame with the
    per-bucket skew guard applied — shared by every LSH family (minhash
    bands, simhash blocks, embedding sign buckets).

    A giant near-dup cluster puts thousands of docs into ONE bucket and
    the unguarded self-join materializes |bucket|^2/2 candidate pairs —
    the 100 TB scale pain point. Buckets over ``max_bucket_size`` use
    one of two bounded strategies (both deterministic under any
    partitioning):

    - ``"star"`` (default): over-cap buckets emit only (anchor, member)
      pairs, the anchor being the first doc in xxhash64 order — LINEAR
      in bucket size, and every member stays edge-connected to the
      cluster, so downstream connected-components still collapses the
      whole group (the property dedup actually needs). Non-anchor pairs
      inside a heavy bucket are not emitted (recall trade, documented).
    - ``"sample"``: keep only the first ``max_bucket_size`` docs per
      bucket in xxhash64 order — bounded-quadratic (cap^2/2) candidates;
      docs sampled out of every bucket they touch get no edges at all.

    Under-cap buckets are untouched in both modes.

    Both build-side windows partition on ``band_fp`` — the SAME key the
    pair self-join shuffles on, so the rank/count machinery adds no
    extra exchange on the build side at scale. The in-bucket order is
    deterministic, partition-invariant, and uncorrelated with doc_id so
    a heavy bucket's anchor/sample isn't biased toward old documents —
    but the hash SEED differs by mode, deliberately:

    - ``star`` orders by ``xxhash64(doc_id)`` alone, so the anchor is a
      pure function of bucket MEMBERSHIP: two bands whose heavy buckets
      hold the same docs (the exact-duplicate-flood shape) pick the
      SAME anchor and emit the SAME (anchor, member) edges, which the
      multi-band dropDuplicates then collapses. The round-11 125x flood
      probe measured the per-band-seeded form emitting ~N_BANDS x the
      deduped pair volume (every band elected a different anchor for
      the same cluster) — 4x the verify-stage work for zero extra
      connectivity, since each bucket's own star already connects it.
    - ``sample`` keeps ``xxhash64(doc_id, band_fp)``: here per-band
      DEcorrelation is the feature — a doc sampled out of one band's
      bucket can still earn edges in another band, so recall degrades
      gracefully instead of the same victims losing every edge.

    ``multi_band=True`` (docs appear under several band keys) ends with
    a pair ``dropDuplicates``: capped emission is not
    first-shared-band-dedupable — a bucket may decline to emit, so
    suppressing later-band matches by fingerprint equality alone would
    silently drop pairs. Single-bucket families (one band key per doc,
    e.g. the embedding sign bucket) pass ``multi_band=False``: a pair
    can only form once, and the dedup would be a provably-no-op
    exchange."""
    if heavy_bucket_mode not in ("star", "sample"):
        raise ValueError(
            f"heavy_bucket_mode must be 'star' or 'sample', got {heavy_bucket_mode!r}"
        )
    wb = Window.partitionBy("band_fp")
    order = (
        (F.xxhash64(F.col("doc_id")), F.col("doc_id"))
        if heavy_bucket_mode == "star"
        else (F.xxhash64(F.col("doc_id"), F.col("band_fp")), F.col("doc_id"))
    )
    wo = wb.orderBy(*order)
    ranked = bands.select(
        "doc_id",
        "band_fp",
        F.row_number().over(wo).alias("bk_rn"),
        F.count(F.lit(1)).over(wb).alias("bk_sz"),
    )

    def _all_pairs(side: DataFrame) -> DataFrame:
        a = side.select(F.col("doc_id").alias("a_id"), "band_fp")
        b = side.select(F.col("doc_id").alias("b_id"), "band_fp")
        return (
            a.join(b, "band_fp")
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id")
        )

    if heavy_bucket_mode == "sample":
        pairs = _all_pairs(ranked.filter(F.col("bk_rn") <= max_bucket_size))
    else:
        # the join legs are bounded BEFORE the join, not filtered after:
        # a post-join predicate would still enumerate |bucket|^2 rows
        # inside the join operator. Light buckets: all pairs. Heavy
        # buckets: one anchor row (bk_rn == 1) joined against the other
        # members — exactly |bucket| - 1 output rows per bucket.
        light = _all_pairs(ranked.filter(F.col("bk_sz") <= max_bucket_size))
        heavy = ranked.filter(F.col("bk_sz") > max_bucket_size)
        anchors = heavy.filter(F.col("bk_rn") == 1).select(
            F.col("doc_id").alias("anchor_id"), "band_fp"
        )
        star = (
            heavy.filter(F.col("bk_rn") > 1)
            .select(F.col("doc_id").alias("member_id"), "band_fp")
            .join(anchors, "band_fp")
            .select(
                F.least("anchor_id", "member_id").alias("a_id"),
                F.greatest("anchor_id", "member_id").alias("b_id"),
            )
        )
        pairs = light.unionByName(star)
    if not multi_band:
        return pairs
    return pairs.dropDuplicates(["a_id", "b_id"])


def capped_probe_bands(
    sink_bands: DataFrame,
    probe_keys: DataFrame,
    max_bucket_size: int,
    key_col: str,
    id_col: str,
) -> DataFrame:
    """Bound the SINK side of an asymmetric probe-vs-index band join —
    the admission-gate form of the skew cap, shared by the minhash gate
    (``dedup.minhash_lsh_join_indexed``) and the embedding gate
    (``streaming.embedding_ingest``) so the two cannot silently diverge.

    Two steps, both deterministic under any partitioning:

    1. PRUNE to buckets the probe actually touches: ``probe_keys`` (one
       column ``key_col``, distinct, batch-sized by the gate contract)
       broadcast-semi-joins the exploded index BEFORE any ranking, so
       per-call cost is bounded by the touched buckets — never an
       O(|sink| x bands) full-index sort per micro-batch;
    2. CAP each surviving bucket at ``max_bucket_size`` rows in
       ``xxhash64(id, key)`` order (id tiebreak) — the same order as
       ``capped_candidates``, uncorrelated with id so a flooded
       bucket's survivors aren't age-biased.

    Admission semantics: a probe near a flooded cluster still matches
    the cap's surviving members (hit/no-hit is what gates consume); the
    documented recall trade is that a capped-out true neighbor is not
    seen — callers choosing a cap accept bounded work over exhaustive
    matching."""
    pruned = sink_bands.join(
        F.broadcast(probe_keys.select(key_col).distinct()),
        key_col,
        "left_semi",
    )
    wo = Window.partitionBy(key_col).orderBy(
        F.xxhash64(F.col(id_col), F.col(key_col)), F.col(id_col)
    )
    return (
        pruned.withColumn("bk_rn", F.row_number().over(wo))
        .filter(F.col("bk_rn") <= max_bucket_size)
        .drop("bk_rn")
    )
