"""Incremental corpus ingest: streaming documents -> curated parquet.

The streaming face of ``plans/corpus.py``: new document files land in a
directory, each micro-batch is quality-annotated (same ``quality_cols``
expressions as the batch plan — one source of truth), rule-filtered, and
exact-deduplicated BOTH within the batch and against everything already
curated, then appended with batch-id lineage (I2).

Dedup-across-restarts design: a stream-side ``dropDuplicates`` on
content hash keeps unbounded state (every hash ever seen) in the state
store — at corpus scale that state IS the dataset, so the scalable
pattern is **merge-on-write**: each batch left-anti joins the curated
sink's own hash column. The sink is the state. On a cluster the sink
hash lookup is a broadcast or shuffle join against a hash-only column
pruned from the curated parquet (ReadSchema: one string column), which
also makes the ingest idempotent under micro-batch replay —
re-delivered docs anti-join away, so the sink stays exactly-once even
though foreachBatch is at-least-once.

Reference analog: the landing-zone ingest boundary (A5/A6 scroll-until-
fixpoint + content-hash card dedup, adapters/shotgun.py:116-478) —
re-expressed as availableNow backlog drains over a document lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from ..operators.textstats import quality_cols
from ..schemas import DOCUMENTS
from ._fs import path_exists
from ._merge_gate import (
    intra_batch_self_refusals,
    read_sink,
    refuse_by_content_key,
)

# The curated sink's full schema, pinned for the state read-back: reading
# with an EXPLICIT schema (instead of parquet inference) makes the sink
# read (a) total — a pre-created empty directory yields an empty frame
# instead of an infer error — and (b) forward-compatible — files written
# before index-on-write existed have no band_fps column and simply read
# it as NULL, which the gate re-indexes on the fly (see _merge_batch)
# rather than crashing or silently exempting pre-upgrade docs.
CURATED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("quality", T.DoubleType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("band_fps", T.ArrayType(T.LongType())),
        T.StructField("ingest_batch_id", T.LongType()),
    ]
)


def backfill_marker_path(sink_dir: str) -> str:
    """The swap-window fence marker for ``backfill_band_fps``: exists
    exactly while a backfill's two-rename swap is unsettled. Ingest
    refuses to start while it exists (see ``run_corpus_ingest``)."""
    return sink_dir.rstrip("/") + "__backfill_manifest"


def annotate_documents_stream(
    docs: DataFrame, min_quality: float = 0.5
) -> DataFrame:
    """Scalar stage (works identically on batch and stream frames).
    Staged tokenize — see ``textstats.text_suite``."""
    from ..operators.textstats import _tokens

    toked = docs.select(
        "doc_id", "text", "lang", "source",
        _tokens(F.col("text")).alias("toks"),
    )
    qc = quality_cols(toks=F.col("toks"))
    return toked.select(
        "doc_id",
        "text",
        "lang",
        "source",
        qc["quality"].alias("quality"),
        F.md5("text").alias("content_hash"),
    ).filter(F.col("quality") >= min_quality)


def backfill_band_fps(spark: SparkSession, sink_dir: str) -> int:
    """One-shot upgrade of a pre-index-on-write sink: rewrite it with
    ``band_fps`` populated for every row, so the armed near-dup gate
    never pays the per-batch legacy re-index again (see _merge_batch).

    Returns the number of rows that were re-indexed (0 = already fully
    indexed; the sink is left untouched then). NOT concurrency-safe:
    stop the ingest stream first. The rewrite stages to a sibling
    ``<sink>__backfill`` directory and swaps via two renames — the swap
    window is small but not atomic (parquet directories are not a
    transactional table format; at production scale put the sink behind
    a table format and make this a MERGE).

    Crash-window FENCE: a ``<sink>__backfill_manifest`` marker file is
    created before the first rename and removed only after the swap is
    fully settled. :func:`run_corpus_ingest` refuses to start while the
    marker exists, so the one state recovery cannot repair — an ingest
    recreating the sink INSIDE the swap window (the "ambiguous state"
    error) — is prevented from ever arising, instead of merely detected
    after the fact.

    Swap, fence and recovery are the SHARED ``_fs`` staged-promote
    machinery (round-10 #6 — one definition across ann_maintenance,
    the snapshot sinks and this backfill): this caller passes its
    sink-lifetime suffixes, the fence marker, and ``prefer_staged=True``
    (the tmp rewrite is fully verified before the swap begins, so a
    crash between the renames RESUMES the promote instead of discarding
    the verified work — unlike the snapshot sinks, whose staging is
    untrusted scratch)."""
    from ..operators.dedup import _shingles, _tokens, band_fps_from_shingles
    from ._fs import delete_path, promote_staged, recover_promote

    tmp_dir = sink_dir.rstrip("/") + "__backfill"
    marker_dir = backfill_marker_path(sink_dir)
    # crash-window recovery BEFORE the existence probe: a death between
    # the two renames leaves the sink missing while the corpus lives in
    # the staging dirs — without this, a rerun would report "already
    # indexed" (0) and the next ingest would silently rebuild an EMPTY
    # sink with every gate disarmed
    recover_promote(
        spark,
        sink_dir,
        staging_suffix="__backfill",
        old_suffix="__pre_backfill",
        prefer_staged=True,
    )
    if not path_exists(spark, sink_dir):
        return 0
    sink = spark.read.schema(CURATED_SCHEMA).parquet(sink_dir)
    n_legacy = sink.filter(F.col("band_fps").isNull()).count()
    if n_legacy == 0:
        # the sink is settled and fully indexed — any marker left here
        # is a stale fence from a crash after the swap completed but
        # before the marker delete; clear it so ingest can resume
        delete_path(spark, marker_dir)
        return 0
    # staged tokenize (HOF staging rule); _toks is NULL for rows that
    # already carry band_fps, so the signature pipeline only runs on the
    # legacy rows — coalesce keeps the stored fingerprints verbatim
    upgraded = (
        sink.withColumn(
            "_toks",
            F.when(F.col("band_fps").isNull(), _tokens(F.col("text"))),
        )
        .withColumn("_sh", _shingles(F.col("_toks")))
        .withColumn(
            "band_fps",
            F.coalesce("band_fps", band_fps_from_shingles(F.col("_sh"))),
        )
        .drop("_toks", "_sh")
    )
    upgraded.write.mode("overwrite").parquet(tmp_dir)
    n = spark.read.schema(CURATED_SCHEMA).parquet(tmp_dir).filter(
        F.col("band_fps").isNull()
    ).count()
    if n != 0:  # defensive: the rewrite must leave nothing unindexed
        raise RuntimeError(f"backfill left {n} rows without band_fps")
    # fenced staged swap (shared implementation): marker created before
    # the first rename, removed only once the swap settles or fully
    # rolls back — run_corpus_ingest refuses to start while it exists.
    promote_staged(
        spark,
        sink_dir,
        staging_suffix="__backfill",
        old_suffix="__pre_backfill",
        marker=marker_dir,
    )
    return n_legacy


def run_corpus_ingest(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint: str,
    min_quality: float = 0.5,
    near_dup_threshold: float | None = None,
    near_dup_max_bucket: int | None = None,
    intra_batch_near_dup: bool = False,
) -> None:
    """Drain the landing directory (availableNow) into curated parquet.

    ``near_dup_threshold`` arms the NEAR-dup admission gate on top of
    the exact merge-on-write dedup, with INDEX-ON-WRITE: every admitted
    doc is stored WITH its LSH band fingerprints (``band_fps``), so a
    later batch's probe joins the sink's stored index — the sink is
    never re-shingled or re-minhashed (per-batch cost is O(|batch|)
    index work + candidate verification, where the unindexed form would
    redo O(|sink|) signature work every batch). Any probe doc with a
    Jaccard hit >= threshold is refused admission. The sink remains the
    only state, so the gate stays idempotent under micro-batch replay
    exactly like the exact-hash path. The band_fps column is written
    even when the gate is unarmed — indexing at write is what makes
    arming it later (or any other consumer) cheap.

    Intra-batch near-dups: by DEFAULT the gate probes only the SINK, so
    two mutual near-dups (distinct hashes) arriving in one micro-batch
    are BOTH admitted — the admitted set then depends on how files were
    batched relative to one-doc-per-batch delivery. This is the cheap
    contract (no batch self-join) and it is stable under replay (the
    exact gate removes redelivered rows before the probe).
    ``intra_batch_near_dup=True`` adds a batch self-probe over the
    already-computed band index: within each batch, any doc with a
    near-neighbor of strictly smaller ``content_hash`` is refused — the
    min-hash-anchor rule, same representative convention as exact dedup.
    Deterministic and content-keyed, but transitively conservative: in a
    chain a~b~c (a<b<c, a!~c), c is refused because of b even though b
    itself was refused. Cross-batch arrival-order dependence is inherent
    to any admission gate whose state is the sink.
    ``near_dup_max_bucket`` bounds the self-probe's intra-batch buckets
    too (same deterministic cap as the sink probe), so a micro-batch
    flooded with same-bucket docs never does quadratic candidate work."""
    from ..operators.dedup import (
        _shingles,
        _tokens,
        band_fps_from_shingles,
        minhash_lsh_join_indexed,
    )

    if path_exists(spark, backfill_marker_path(out_dir)):
        raise RuntimeError(
            f"corpus ingest refused: backfill fence "
            f"{backfill_marker_path(out_dir)} exists — a "
            "backfill_band_fps swap is unsettled (in progress or "
            "crashed mid-swap). Finish or rerun the backfill (it "
            "recovers and clears the fence) before ingesting; starting "
            "now could recreate the sink inside the swap window."
        )
    stream = spark.readStream.schema(DOCUMENTS).parquet(src_dir)
    ann = annotate_documents_stream(stream, min_quality=min_quality)

    def _merge_batch(batch: DataFrame, batch_id: int) -> None:
        sink = read_sink(batch.sparkSession, out_dir, CURATED_SCHEMA)
        # the exact content-hash gate runs FIRST, on the slim annotated
        # rows: a fully-replayed micro-batch (at-least-once redelivery)
        # anti-joins to zero rows before any signature work is spent
        pruned = batch.dropDuplicates(["content_hash"])
        if sink is not None:
            pruned = pruned.join(
                sink.select("content_hash"), "content_hash", "left_anti"
            )
        # ONE signature pass per batch, on the exact-gate SURVIVORS:
        # tokenize -> shingles -> band fingerprints computed here, once,
        # serve BOTH the near-dup probe (minhash_lsh_join_indexed
        # consumes the stored band_fps directly — zero signature work
        # inside the gate) and the index-on-write of the admitted rows.
        # The signature pipeline (N_MINHASH seeded-md5 array_min passes
        # over the shingles) is the CPU-dominant per-batch cost.
        # persist() pins the frame so the probe and write subtrees share
        # the one computation; a micro-batch is memory-sized by
        # construction.
        fresh = (
            pruned.withColumn("_toks", _tokens(F.col("text")))
            .withColumn("shingles", _shingles(F.col("_toks")))
            .withColumn(
                "band_fps", band_fps_from_shingles(F.col("shingles"))
            )
            .drop("_toks")
            .persist()
        )
        try:
            surv = fresh
            if sink is not None:
                if near_dup_threshold is not None:
                    # pre-upgrade rows (band_fps NULL under the pinned
                    # schema) are re-indexed on the fly so the gate
                    # covers the WHOLE sink — explode would silently
                    # drop NULL arrays, exempting every pre-upgrade doc.
                    # ONE sink scan (the backfill's staged one-pass
                    # form), not an isNotNull/isNull filter pair
                    # unioned: that shape reads the corpus-sized sink
                    # twice per micro-batch even when the isNull leg is
                    # empty. _toks is NULL for already-indexed rows, so
                    # the signature pipeline runs only on legacy rows
                    # and coalesce keeps stored fingerprints verbatim.
                    sink_idx = (
                        sink.select("doc_id", "text", "band_fps")
                        .withColumn(
                            "_toks",
                            F.when(
                                F.col("band_fps").isNull(),
                                _tokens(F.col("text")),
                            ),
                        )
                        .withColumn("_sh", _shingles(F.col("_toks")))
                        .withColumn(
                            "band_fps",
                            F.coalesce(
                                "band_fps",
                                band_fps_from_shingles(F.col("_sh")),
                            ),
                        )
                        .select("doc_id", "text", "band_fps")
                    )
                    # the refusal identity is the CONTENT (content_hash),
                    # mirroring embedding_ingest: anti-joining near hits
                    # on doc_id would let one near-hit row delete a
                    # DISTINCT-content batch row sharing its doc_id
                    # (at-least-once upstreams re-emitting corrected
                    # text under a reused id). content_hash is unique
                    # per surv row (the exact gate dropped duplicates),
                    # so it is a valid probe id for the indexed join.
                    near_hits = (
                        minhash_lsh_join_indexed(
                            sink_idx,
                            surv.select(
                                F.col("content_hash").alias("doc_id"),
                                "text",
                                "shingles",
                                "band_fps",
                            ),
                            jaccard_threshold=near_dup_threshold,
                            max_bucket_size=near_dup_max_bucket,
                        )
                        .select(F.col("probe_id").alias("content_hash"))
                        .distinct()
                    )
                    surv = refuse_by_content_key(
                        surv, near_hits, "content_hash"
                    )
            if near_dup_threshold is not None and intra_batch_near_dup:
                # batch self-probe (shared skeleton): exact Jaccard over
                # the carried shingles is the near test; the band index
                # was already computed above (zero extra signature work)
                inter = F.size(F.array_intersect("a_sh", "b_sh"))
                union = F.size(F.array_union("a_sh", "b_sh"))
                is_near = (
                    F.round(
                        inter.cast("double") / F.greatest(union, F.lit(1)),
                        6,
                    )
                    >= near_dup_threshold
                )
                self_hits = intra_batch_self_refusals(
                    surv,
                    key_col="content_hash",
                    band_col="band_fps",
                    payload={"sh": "shingles"},
                    is_near=is_near,
                    max_bucket=near_dup_max_bucket,
                )
                surv = refuse_by_content_key(
                    surv, self_hits, "content_hash"
                )
            # index-on-write: the SAME band_fps the gate probed with
            # (4 bigints per doc)
            (
                surv.drop("shingles")
                .withColumn("ingest_batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(out_dir)
            )
        finally:
            fresh.unpersist()

    q = (
        ann.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
