"""Physical-plan hygiene (SURVEY §4): the properties that keep every
operator viable at 100 TB, asserted on .explain output so regressions in
plan shape fail fast even while results stay correct.

- predicate + projection pushdown reach the parquet scan (A2/A3)
- no unbounded cross join anywhere in the fuzzy-match plans (§4 rule:
  every fuzzy predicate is pre-blocked by an equi key) — the only
  cross join allowed is the deliberate broadcast of K centroids / Q
  query vectors in the ANN operators
- small dimension joins broadcast (nation/region side of the revenue
  rollup)
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from concerts_etl_sa_spark.operators import analytics as A
from concerts_etl_sa_spark.operators import consolidate as C
from concerts_etl_sa_spark.operators import fixtures as FX
from concerts_etl_sa_spark.operators import legacy_match as L
from concerts_etl_sa_spark.sources.readers import load_table

from .conftest import SF_DIR


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_scan_pushdown_predicate_and_projection(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    q = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    plan = formatted_plan(q)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)" in plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(m.group(1).split(",")) == {
        "l_orderkey:bigint", "l_quantity:double"
    }, f"column pruning failed: {m and m.group(1)}"


def _events_frames(spark):
    ev = load_table(spark, SF_DIR, "events")
    return FX.shotgun_events(ev), FX.dice_events(ev)


def test_consolidate_plan_has_no_cross_join(spark):
    sg, dc = _events_frames(spark)
    plan = plan_of(C.consolidate(sg, dc))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_legacy_merge_plan_has_no_cross_join(spark):
    sg, dc = _events_frames(spark)
    plan = plan_of(L.legacy_merge(sg, dc))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_consolidate_pair_blocking_keys_on_day_and_token(spark):
    """The inverted token index must block on (day, tok) — never day
    alone. Round-6 shape: blocking is the single postings
    groupBy(day, tok) (collect per-side id lists), so the invariant
    moved from a pair-join key to the aggregate's grouping keys; the
    remaining joins must all be id-equi (no same-day pair join at all)."""
    sg, dc = _events_frames(spark)
    plan = plan_of(C.consolidate(sg, dc))
    agg_lines = [
        ln
        for ln in plan.splitlines()
        if "Aggregate" in ln and "tok" in ln and "keys=" in ln
    ]
    assert any(
        "day" in ln for ln in agg_lines
    ), f"no (day, tok)-keyed postings aggregate found:\n{plan[:4000]}"
    joins = [
        ln
        for ln in plan.splitlines()
        if "HashJoin" in ln or "SortMergeJoin" in ln
    ]
    day_joins = [ln for ln in joins if "day" in ln]
    assert not day_joins, f"unexpected day-keyed pair join:\n{day_joins}"


def test_small_dim_join_broadcasts(spark):
    plan = plan_of(A.revenue_by_nation(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, "nation/region dims should broadcast"


def test_whole_stage_codegen_covers_scalar_cascade(spark):
    """The B-row scalar cascades must stay JVM-side (no Python eval).

    AQE wraps any plan containing an exchange (the small-scan repartition
    in ``load_table``) in AdaptiveSparkPlan, whose pre-execution string
    hides codegen ``*(n)`` markers — so assert on a non-adaptive plan to
    keep the codegen check strong.
    """
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        sg, _ = _events_frames(spark)
        plan = plan_of(sg)
        # '*(n)' prefixes mark WholeStageCodegen spans in the compact form
        assert "*(1)" in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_bigram_scoring_joins_stay_broadcast(spark):
    """Round-11 trigram guardrail (verdict #7): the n-gram LM family's
    scale property is that BOTH model tables are top-K truncated —
    broadcast-sized BY CONSTRUCTION — so scoring is map-side broadcast
    joins over the postings. If a future n=3 member (or a K bump) let a
    model table grow past broadcast size, Spark would silently fall
    back to a SortMergeJoin ON THE POSTINGS SIDE — a corpus-sized
    shuffle where the design promises none. Pin the plan shape: the
    scoring path carries NO sort-merge join, and the model tables bound
    stays broadcast-sized (docstring contract: K * ~avg-token bytes;
    2000 + 1000 entries is ~100 KB, five orders under the 8 GB
    broadcast ceiling)."""
    from concerts_etl_sa_spark.operators import textstats as TS

    for member, n_bcast in ((TS.bigram_xent, 2), (TS.trigram_xent, 2)):
        plan = plan_of(member(spark, SF_DIR))
        assert "SortMergeJoin" not in plan, (
            f"{member.__name__} scoring must broadcast its truncated "
            "model tables"
        )
        assert plan.count("BroadcastHashJoin") >= n_bcast
    # the structural bound itself: table sizes are compile-time consts
    assert (
        TS.BIGRAM_TABLE_K + TS.UNIGRAM_VOCAB_K
        + TS.TRIGRAM_TABLE_K + TS.TRIGRAM_CONTEXT_K
    ) <= 1_000_000, (
        "model tables must stay broadcast-sized (the family's scale "
        "property is structural, not accidental)"
    )
