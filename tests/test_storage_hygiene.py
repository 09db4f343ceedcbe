"""Storage-hygiene regression guard (round 13): no operator may leave
ORPHANED persisted blocks behind once its result is consumed and every
reference is released.

This is the round-12 memory-cliff bug class, turned into a permanent
test: ``DataFrame.unpersist`` does not free ``localCheckpoint`` blocks
(they are not cache-manager-registered), so an iterative operator that
checkpoints per round and loses track of a generation pins executor
storage for the life of the application — invisible to correctness
tests, fatal to a long-running cluster job. The contract checked here:

1. cache-manager entries (persist/cache) must be fully releasable by
   ``spark.catalog.clearCache()`` — always true by construction;
2. NOTHING may remain pinned after that: the round-13 measurement
   (this test's origin) showed the ContextCleaner NEVER releases an
   unreferenced localCheckpoint — a minimal eager checkpoint stayed in
   getPersistentRDDs through 20 s of forced Python+JVM GC — so any
   operator returning a checkpoint-rooted frame leaks one snapshot per
   call for the application's lifetime. connected_components now
   copies its fixpoint into a normal persist and drops its final
   checkpoint generation before returning; this test pins that
   contract for every internally-persisting operator. The GC poll in
   ``_drain`` is a fallback for genuinely GC-released handles, not the
   primary lever.

Covers the operators that persist or checkpoint internally: the
iterative CC closure, the trained PQ/residual builds, semdedup,
and the full curation plan.
"""

from __future__ import annotations

import gc
import time

from concerts_etl_sa_spark.operators import components as CC

from .conftest import SF_DIR


def _pinned_rdd_ids(spark) -> set[int]:
    return CC._persistent_rdd_ids(spark.sparkContext)


def _drain(spark, baseline: set[int], timeout_s: float = 20.0) -> set[int]:
    """Drop cache-manager entries, then poll until the ContextCleaner
    has released every non-baseline pinned RDD (forcing Python and JVM
    GC each round). Returns whatever is still pinned at timeout."""
    spark.catalog.clearCache()
    deadline = time.time() + timeout_s
    leftover = _pinned_rdd_ids(spark) - baseline
    while leftover and time.time() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)
        spark.catalog.clearCache()
        leftover = _pinned_rdd_ids(spark) - baseline
    return leftover


def _run_and_release(spark, make_df) -> set[int]:
    baseline = _pinned_rdd_ids(spark)
    df = make_df()
    df.count()
    del df
    return _drain(spark, baseline)


def test_connected_components_releases_all_storage(spark):
    """The r12 bug's exact shape: per-round localCheckpoint generations
    must not outlive the run. Only the final generation may remain
    while the result is referenced — and it must drain once released."""
    from concerts_etl_sa_spark.operators.dedup import simhash_near_pairs

    leftover = _run_and_release(
        spark,
        lambda: CC.connected_components(
            simhash_near_pairs(spark, SF_DIR), driver_max_edges=0
        ),
    )
    assert not leftover, f"pinned RDDs never released: {leftover}"


def test_trained_ann_builds_release_all_storage(spark):
    from concerts_etl_sa_spark.operators import pq

    leftover = _run_and_release(
        spark, lambda: pq.topk_cosine_ivfpq_residual(spark, SF_DIR)
    )
    assert not leftover, f"pinned RDDs never released: {leftover}"
    leftover = _run_and_release(
        spark, lambda: pq.topk_cosine_pq_trained(spark, SF_DIR)
    )
    assert not leftover, f"pinned RDDs never released: {leftover}"


def test_curation_plan_releases_all_storage(spark):
    """curate_corpus scope-persists the annotate scan + flagged frame;
    the scope design resurrects them across runs, so the release lever
    is clearCache + GC — which must leave nothing pinned."""
    from concerts_etl_sa_spark.plans.corpus import curate_corpus

    leftover = _run_and_release(
        spark,
        lambda: curate_corpus(
            spark, SF_DIR, transitive_dedup=True, max_bucket_size=256
        ).curated,
    )
    assert not leftover, f"pinned RDDs never released: {leftover}"


def test_semdedup_trained_releases_all_storage(spark):
    from concerts_etl_sa_spark.operators.semdedup import semdedup_trained

    leftover = _run_and_release(
        spark, lambda: semdedup_trained(spark, SF_DIR, k_centroids=8)
    )
    assert not leftover, f"pinned RDDs never released: {leftover}"
