"""Incremental embedding ingest: streaming vectors -> curated parquet
with exact and near-dup admission — the L2 (embedding-modality) twin of
``corpus_ingest`` (SURVEY §2.I + L2 composition).

Merge-on-write, sink-is-the-state (same physics as the document path):
each availableNow micro-batch is

1. **exact-deduped** within the batch and against the sink. The sink
   probe joins on a 64-bit content key (``xxhash64`` over the float
   array) and then VERIFIES exact array equality, so the hash only
   prunes — a hash collision can never refuse a distinct vector;
2. **near-dup gated** (optional, ``near_dup_cosine``) against the
   sink's STORED sign-LSH band keys — index-on-write: ``band_keys`` is
   persisted with every admitted row, so the sink is never re-hashed;
   per batch the sink contributes a read + explode only. Any surviving
   candidate with cosine >= threshold refuses admission.

Replay idempotency: foreachBatch is at-least-once, but a re-delivered
vector exact-matches its own earlier admission (hash + equality) and
anti-joins away, so the sink stays exactly-once.

Reference analog: the content-hash card dedup of the landing-zone
ingest (A6, concerts_etl/adapters/shotgun.py:116-478) re-expressed for
the embedding modality, with the near-dup gate as the L2 counterpart of
the token-level admission check.

Scale note — sign-LSH blocking width: the default 2x4-bit band keyspace
(32 buckets) is deliberately tiny at test scale; on a large cluster
pass wider ``n_sign_bands``/``sign_bits_per_band`` (per-deployment
parameters of ``run_embedding_ingest``; pick from the measured sweep in
``similarity.near_dup_quality``) or the per-bucket candidate volume
approaches |sink|/32 per probe. The width is a SINK-LIFETIME property:
the stored ``band_keys`` index and the probe must agree, so changing it
means reindexing the sink. ``near_dup_max_bucket`` bounds a flooded
bucket meanwhile (rank by xxhash64, keep the first N — the same
deterministic cap as the minhash gate, with the same documented recall
trade: a capped-out true neighbor is not seen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.similarity import (
    N_SIGN_BANDS,
    SIGN_BITS_PER_BAND,
    _band_keys,
    _cosine_pre,
    _norm2,
)
from ..schemas import EMBEDDINGS
from ._merge_gate import (
    intra_batch_self_refusals,
    read_sink,
    refuse_by_content_key,
)

CURATED_EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
        T.StructField("vec_hash", T.LongType()),
        T.StructField("norm2", T.DoubleType()),
        T.StructField("band_keys", T.ArrayType(T.IntegerType())),
        T.StructField("ingest_batch_id", T.LongType()),
    ]
)


def run_embedding_ingest(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint: str,
    near_dup_cosine: float | None = None,
    near_dup_max_bucket: int | None = None,
    intra_batch_near_dup: bool = False,
    n_sign_bands: int = N_SIGN_BANDS,
    sign_bits_per_band: int = SIGN_BITS_PER_BAND,
) -> None:
    """Drain the embedding landing directory (availableNow) into the
    curated vector sink at ``out_dir``.

    Intra-batch near-dups: by DEFAULT the near gate probes only the
    SINK — two mutual near-dup vectors (distinct contents) arriving in
    one micro-batch are BOTH admitted, so the admitted set depends on
    batching relative to one-vector-per-batch delivery (the cheap,
    replay-stable contract — identical to the document ingest's).
    ``intra_batch_near_dup=True`` adds a batch self-probe over the
    already-computed sign-LSH index: within each batch, any vector with
    a near-neighbor of strictly smaller ``vec_hash`` is refused (the
    min-hash-anchor rule; transitively conservative on chains — see
    ``corpus_ingest.run_corpus_ingest``). ``near_dup_max_bucket`` bounds
    the self-probe's intra-batch buckets too (same deterministic cap as
    the sink probe), so a flooded micro-batch never goes quadratic."""
    stream = spark.readStream.schema(EMBEDDINGS).parquet(src_dir)

    def _merge_batch(batch: DataFrame, batch_id: int) -> None:
        sink = read_sink(batch.sparkSession, out_dir, CURATED_EMB_SCHEMA)
        # index columns computed ONCE per batch; array equality makes
        # the within-batch dedup precise (not hash-trusting). persist()
        # pins the projection + anti-join chain so the exact gate, the
        # near-gate probe, and the final write share one computation
        # (same pattern and rationale as corpus_ingest._merge_batch).
        base = (
            batch.dropDuplicates(["embedding"])
            .withColumn("vec_hash", F.xxhash64("embedding"))
            .withColumn("norm2", _norm2("embedding"))
            .withColumn(
                "band_keys",
                _band_keys(
                    "embedding", n_sign_bands, sign_bits_per_band
                ).cast("array<int>"),
            )
            .persist()
        )
        try:
            _write_gated(base, sink, batch_id)
        finally:
            base.unpersist()

    def _write_gated(base, sink, batch_id: int) -> None:
        fresh = base
        if sink is not None:
            # exact gate: hash-equi join prunes, array equality
            # verifies. The anti-join key is the dedup IDENTITY — the
            # (hash, embedding) pair — NOT vec_id: anti-joining on
            # vec_id would let one sink-matching row delete a DISTINCT
            # new vector that happens to share its vec_id (at-least-
            # once upstreams re-emitting a corrected embedding under
            # the same id).
            sink_keys = sink.select(
                F.col("vec_hash").alias("s_hash"),
                F.col("embedding").alias("s_vec"),
            )
            # eqNullSafe on the array leg: a NULL-embedding row must
            # exact-match its own earlier admission on replay (plain ==
            # evaluates NULL, keeps the row, and appends a duplicate per
            # redelivery — the md5(NULL) hazard of dedup.exact_dedup)
            fresh = fresh.join(
                sink_keys,
                (F.col("vec_hash") == F.col("s_hash"))
                & F.col("embedding").eqNullSafe(F.col("s_vec")),
                "left_anti",
            )
            if near_dup_cosine is not None:
                # the refusal identity is the CONTENT (vec_hash), same
                # as the exact gate — anti-joining near hits on vec_id
                # would drag out a distinct batch vector sharing the
                # hit row's id
                probe = fresh.select(
                    F.col("vec_hash").alias("p_hash"),
                    F.col("embedding").alias("p_vec"),
                    F.col("norm2").alias("p_n2"),
                    F.explode("band_keys").alias("band_key"),
                )
                # the cap's in-bucket id is vec_hash, not vec_id: the
                # exact gate admits multiple rows per vec_id but at most
                # one per content, so vec_hash keeps the cap's rank
                # order total (deterministic survivor selection)
                sink_bands = sink.select(
                    F.col("embedding").alias("s_vec"),
                    F.col("norm2").alias("s_n2"),
                    F.col("vec_hash").alias("s_id"),
                    F.explode("band_keys").alias("band_key"),
                )
                if near_dup_max_bucket is not None:
                    from ..operators.util import capped_probe_bands

                    sink_bands = capped_probe_bands(
                        sink_bands,
                        probe,
                        near_dup_max_bucket,
                        key_col="band_key",
                        id_col="s_id",
                    )
                near_hits = (
                    probe.join(sink_bands, "band_key")
                    .withColumn(
                        "cosine",
                        _cosine_pre("p_vec", "s_vec", "p_n2", "s_n2"),
                    )
                    .filter(F.col("cosine") >= near_dup_cosine)
                    .select(F.col("p_hash").alias("h_hash"))
                    .distinct()
                )
                fresh = refuse_by_content_key(
                    fresh,
                    near_hits.select(F.col("h_hash").alias("vec_hash")),
                    "vec_hash",
                )
        if near_dup_cosine is not None and intra_batch_near_dup:
            # batch self-probe (shared skeleton) over the already-
            # computed sign-LSH index — no re-hashing. Survivor frame is
            # exact-deduped, so vec_hash is (collision aside) unique per
            # content and a total rank key.
            self_hits = intra_batch_self_refusals(
                fresh,
                key_col="vec_hash",
                band_col="band_keys",
                payload={"v": "embedding", "n2": "norm2"},
                is_near=_cosine_pre("a_v", "b_v", "a_n2", "b_n2")
                >= near_dup_cosine,
                max_bucket=near_dup_max_bucket,
            )
            fresh = refuse_by_content_key(fresh, self_hits, "vec_hash")
        (
            fresh.withColumn("ingest_batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    q = (
        stream.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
