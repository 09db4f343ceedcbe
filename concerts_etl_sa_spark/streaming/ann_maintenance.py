"""Streaming top-k maintenance: an ANN result set that stays exact as
candidate batches land (SURVEY §2.L2 + I5 composition).

The serving shape of :func:`operators.similarity.topk_cosine_incremental_df`:
new embedding batches arrive in a landing directory; each micro-batch is
scored against the (broadcast-bounded) query set ONLY — |batch| x |queries|
work per batch, never a rescore of everything seen — and merged into the
per-query top-k state, which is snapshot-replaced (I5) via a staged
write + rename promote so the prior snapshot survives any crash window.

State design: the state IS queries x k rows — dimension-sized BY
CONSTRUCTION (independent of how many candidates ever streamed), so the
driver-side materialize-before-overwrite is a bounded collect, the same
class as the kmeans centroid sync. Top-k is a monotone merge under the
deterministic (cosine DESC, c_id ASC) order, so the state after any
sequence of batches equals the batch recomputation over their union —
pinned end-to-end in tests against the brute-force oracle, and replay
(at-least-once foreachBatch) is idempotent: re-merging rows already in
the state cannot change a deterministic top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.similarity import TOP_K, topk_cosine_incremental_df
from ..schemas import EMBEDDINGS
from ._fs import promote_staged, recover_promote, staging_dir
from ._merge_gate import read_sink

_STATE_SCHEMA = "q_id BIGINT, c_id BIGINT, cosine DOUBLE, rn INT"


def run_topk_maintenance(
    spark: SparkSession,
    src_dir: str,
    state_dir: str,
    checkpoint: str,
    queries: DataFrame,
    k: int = TOP_K,
) -> None:
    """Drain the embedding landing directory (availableNow), folding each
    batch into the per-query top-k state at ``state_dir``.

    ``queries`` needs (vec_id, embedding) — cached by the caller if its
    lineage is expensive; it is re-scored against every batch."""
    stream = spark.readStream.schema(EMBEDDINGS).parquet(src_dir)

    def _fold_batch(batch: DataFrame, batch_id: int) -> None:
        spark_b = batch.sparkSession
        recover_promote(spark_b, state_dir)
        # read_sink: explicit existence probe, NOT a swallowed read
        # exception — this sink is snapshot-replaced per batch, so
        # treating a transient read failure as "first batch" would
        # replace the entire accumulated top-k state with just this
        # batch's (the shared _merge_gate rationale).
        stored = read_sink(spark_b, state_dir, _STATE_SCHEMA)
        prior = (
            stored
            if stored is not None
            else spark_b.createDataFrame([], _STATE_SCHEMA)
        ).select("q_id", "c_id", "cosine")
        updated = topk_cosine_incremental_df(prior, queries, batch, k=k)
        # materialize BEFORE the rewrite (reading and rewriting the
        # same path in one lineage is unsafe); the state is q x k rows
        # by construction, so this is a bounded driver sync
        rows = updated.collect()
        # staged promote (shared _fs machinery): the checkpoint replays
        # an interrupted batch and the monotone merge makes the refold
        # equal the lost result
        spark_b.createDataFrame(rows, _STATE_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging_dir(state_dir))
        promote_staged(spark_b, state_dir)

    # recovery must ALSO run before the stream starts, not only inside
    # _fold_batch: after a death between the two renames, an availableNow
    # rerun with an EMPTY landing dir never invokes foreachBatch, so the
    # live state_dir would stay missing (surviving only in __old) and
    # external readers would see no snapshot despite it existing
    recover_promote(spark, state_dir)
    q = (
        stream.writeStream.foreachBatch(_fold_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
