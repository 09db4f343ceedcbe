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

from ..operators.textstats import quality_cols
from ..schemas import DOCUMENTS


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


def run_corpus_ingest(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint: str,
    min_quality: float = 0.5,
    near_dup_threshold: float | None = None,
    near_dup_max_bucket: int | None = None,
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
    arming it later (or any other consumer) cheap."""
    from ..operators.dedup import (
        _shingles,
        _tokens,
        band_fps_from_shingles,
        minhash_lsh_join_indexed,
    )

    stream = spark.readStream.schema(DOCUMENTS).parquet(src_dir)
    ann = annotate_documents_stream(stream, min_quality=min_quality)

    def _merge_batch(batch: DataFrame, batch_id: int) -> None:
        spark_b = batch.sparkSession
        fresh = batch.dropDuplicates(["content_hash"])
        try:
            sink = spark_b.read.parquet(out_dir)
        except Exception:  # noqa: BLE001 — first batch: no sink yet
            sink = None
        if sink is not None:
            fresh = fresh.join(
                sink.select("content_hash"), "content_hash", "left_anti"
            )
            if near_dup_threshold is not None:
                near_hits = (
                    minhash_lsh_join_indexed(
                        sink.select("doc_id", "text", "band_fps"),
                        fresh.select("doc_id", "text"),
                        jaccard_threshold=near_dup_threshold,
                        max_bucket_size=near_dup_max_bucket,
                    )
                    .select(F.col("probe_id").alias("doc_id"))
                    .distinct()
                )
                fresh = fresh.join(near_hits, "doc_id", "left_anti")
        # index-on-write: staged tokenize -> staged shingles -> stored
        # band fingerprints (4 bigints per doc)
        indexed = (
            fresh.withColumn("_toks", _tokens(F.col("text")))
            .withColumn("_sh", _shingles(F.col("_toks")))
            .withColumn("band_fps", band_fps_from_shingles(F.col("_sh")))
            .drop("_toks", "_sh")
        )
        (
            indexed.withColumn("ingest_batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    q = (
        ann.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
