"""Shared admission-gate skeleton for the streaming ingests.

Both modality ingests — ``corpus_ingest`` (documents, minhash bands)
and ``embedding_ingest`` (vectors, sign-LSH bands) — implement the same
merge-on-write contract: the sink is the only state, the refusal
identity is the CONTENT key (content_hash / vec_hash), the near gate
probes the sink's stored band index, and the optional intra-batch
self-probe refuses rows with a near-neighbor of strictly smaller
content key. The two copies drifted once already (doc_id- vs
content-keyed refusal, caught round 7→8), so the drift-prone pieces
live here as ONE definition both ingests parameterize:

- :func:`read_sink` — pinned-schema read behind an explicit existence
  probe (a real sink-read failure must surface, not masquerade as
  "first batch");
- :func:`refuse_by_content_key` — the anti-join refusal step, keyed by
  content, never by row id;
- :func:`intra_batch_self_refusals` — the batch self-probe with the
  same deterministic per-bucket cap as the sink probes.

What stays modality-specific in each ingest: the exact-gate identity
(md5 text hash vs xxhash64+array-verify), the sink near-probe (the
document path delegates to ``dedup.minhash_lsh_join_indexed``, the
vector path scores cosine in place), and the backfill fence (the
document sink is the only one with a rewrite-in-place upgrade path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.column import Column
from pyspark.sql.window import Window

from ._fs import path_exists


def read_sink(spark: SparkSession, out_dir: str, schema) -> DataFrame | None:
    """The curated sink under its PINNED schema, or None if it does not
    exist yet. Explicit existence probe, not a swallowed read exception:
    any real sink-read failure (corrupt footer, FS hiccup, permissions)
    must kill the stream loudly — treating it as "first batch" would
    disarm every gate and re-admit the world. The explicit schema also
    makes a pre-created empty directory read as an empty frame, and
    pre-upgrade files read missing columns as NULL instead of crashing."""
    return (
        spark.read.schema(schema).parquet(out_dir)
        if path_exists(spark, out_dir)
        else None
    )


def refuse_by_content_key(
    surv: DataFrame, refused: DataFrame, key_col: str
) -> DataFrame:
    """Drop survivors whose CONTENT key appears in ``refused`` (a
    one-column frame of ``key_col``). The refusal identity is always the
    content key, never the row id: anti-joining near hits on
    doc_id/vec_id would let one near-hit row delete a DISTINCT-content
    batch row sharing its id (at-least-once upstreams re-emitting
    corrected payloads under a reused id — the exact drift this module
    exists to prevent recurring)."""
    return surv.join(refused, key_col, "left_anti")


def intra_batch_self_refusals(
    surv: DataFrame,
    key_col: str,
    band_col: str,
    payload: dict[str, str],
    is_near: Column,
    max_bucket: int | None = None,
) -> DataFrame:
    """Content keys the batch SELF-probe refuses: explode the batch's
    already-computed band index (zero extra signature work), self-join
    on the band key, and refuse every row with a near-neighbor of
    strictly smaller content key — the min-hash-anchor rule, the same
    representative convention as exact dedup. Deterministic and
    content-keyed; transitively conservative on chains a~b~c (c is
    refused because of b even though b itself was refused).

    ``payload`` maps alias -> survivor column carried to the scorer;
    the pair frame exposes them as ``a_<alias>`` / ``b_<alias>`` and
    ``is_near`` is the modality's boolean near test over those names
    (built lazily — Columns resolve at analysis).

    ``max_bucket`` bounds a flooded intra-batch bucket with the SAME
    deterministic xxhash64 rank-and-keep as the sink probes
    (``util.capped_probe_bands`` order, sample semantics): without it a
    single micro-batch flooded with same-bucket rows does quadratic
    candidate work even when the sink probe is capped. The documented
    recall trade is identical — a capped-out true neighbor is not seen,
    so both members of such a pair are admitted."""
    b = surv.select(
        F.col(key_col).alias("h"),
        *[F.col(src).alias(a) for a, src in payload.items()],
        F.explode(band_col).alias("band_fp"),
    )
    if max_bucket is not None:
        wo = Window.partitionBy("band_fp").orderBy(
            F.xxhash64(F.col("h"), F.col("band_fp")), F.col("h")
        )
        b = (
            b.withColumn("bk_rn", F.row_number().over(wo))
            .filter(F.col("bk_rn") <= max_bucket)
            .drop("bk_rn")
        )
    pairs = (
        b.alias("x")
        .join(b.alias("y"), "band_fp")
        .filter(F.col("x.h") < F.col("y.h"))
        .select(
            F.col("y.h").alias(key_col),
            *[F.col(f"x.{a}").alias(f"a_{a}") for a in payload],
            *[F.col(f"y.{a}").alias(f"b_{a}") for a in payload],
        )
    )
    return pairs.filter(is_near).select(key_col).distinct()
