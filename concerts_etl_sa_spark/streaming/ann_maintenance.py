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
from ._fs import path_exists

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

    staging_dir = state_dir.rstrip("/") + "__staging"
    old_dir = state_dir.rstrip("/") + "__old"

    def _recover(spark_r: SparkSession) -> None:
        """Crash-window recovery from a prior promote: a death between
        the two renames leaves the state staged aside in __old — roll
        it back (the checkpoint replays the interrupted batch, and the
        monotone merge makes the refold equal the lost result); a
        completed promote that died before the cleanup just leaves a
        stale __old to delete."""
        jvm = spark_r._jvm
        p_state = jvm.org.apache.hadoop.fs.Path(state_dir)
        fs = p_state.getFileSystem(spark_r._jsc.hadoopConfiguration())
        p_old = jvm.org.apache.hadoop.fs.Path(old_dir)
        if path_exists(spark_r, old_dir):
            if not path_exists(spark_r, state_dir):
                if not fs.rename(p_old, p_state):
                    raise RuntimeError(
                        f"topk state recovery: could not restore {old_dir}"
                    )
            else:
                fs.delete(p_old, True)

    def _fold_batch(batch: DataFrame, batch_id: int) -> None:
        spark_b = batch.sparkSession
        jvm = spark_b._jvm
        p_state = jvm.org.apache.hadoop.fs.Path(state_dir)
        fs = p_state.getFileSystem(spark_b._jsc.hadoopConfiguration())
        p_staging = jvm.org.apache.hadoop.fs.Path(staging_dir)
        p_old = jvm.org.apache.hadoop.fs.Path(old_dir)
        _recover(spark_b)
        # explicit existence probe, NOT a swallowed read exception: this
        # sink is snapshot-replaced per batch, so treating a transient
        # read failure (corrupt footer, FS hiccup, permissions) as
        # "first batch" would replace the entire accumulated top-k
        # state with just this batch's — silent, unrecoverable loss.
        # With the probe, a missing path is the only no-state signal;
        # real read failures kill the stream loudly and a retry resumes
        # from intact state. The pinned read schema makes a pre-created
        # empty dir read as an empty frame instead of a schema-infer
        # error.
        if path_exists(spark_b, state_dir):
            prior = spark_b.read.schema(_STATE_SCHEMA).parquet(
                state_dir
            ).select("q_id", "c_id", "cosine")
        else:
            prior = spark_b.createDataFrame([], _STATE_SCHEMA).select(
                "q_id", "c_id", "cosine"
            )
        updated = topk_cosine_incremental_df(prior, queries, batch, k=k)
        # materialize BEFORE the rewrite (reading and rewriting the
        # same path in one lineage is unsafe); the state is q x k rows
        # by construction, so this is a bounded driver sync
        rows = updated.collect()
        # STAGED promote, never mode('overwrite') on the live path: an
        # overwrite deletes the state dir before the new files commit,
        # so a crash in that window destroys the accumulated top-k and
        # the replayed batch silently rebuilds state from itself alone.
        # Writing to __staging and swapping via renames means the prior
        # snapshot survives every crash window (recovered above).
        spark_b.createDataFrame(rows, _STATE_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging_dir)
        if path_exists(spark_b, state_dir):
            if not fs.rename(p_state, p_old):
                raise RuntimeError(
                    f"topk state: could not stage {state_dir} aside"
                )
        if not fs.rename(p_staging, p_state):
            fs.rename(p_old, p_state)  # roll back; staging is scratch
            raise RuntimeError(
                f"topk state: could not promote {staging_dir}"
            )
        fs.delete(p_old, True)

    # recovery must ALSO run before the stream starts, not only inside
    # _fold_batch: after a death between the two renames, an availableNow
    # rerun with an EMPTY landing dir never invokes foreachBatch, so the
    # live state_dir would stay missing (surviving only in __old) and
    # external readers would see no snapshot despite it existing
    _recover(spark)
    q = (
        stream.writeStream.foreachBatch(_fold_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
