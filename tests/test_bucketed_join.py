"""Bucketed co-located join: both sides bucketed on the join key ->
the join plans with zero Exchange (the 100 TB recurring-join strategy)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from concerts_etl_sa_spark.sinks.writers import write_bucketed
from concerts_etl_sa_spark.sources.readers import load_table

from .conftest import SF_DIR


@pytest.fixture()
def bucketed_tables(spark):
    ev = load_table(spark, SF_DIR, "events")
    users = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    write_bucketed(ev.select("event_id", "user_id", "value"),
                   "t_events_bkt", ["user_id"], n_buckets=8,
                   sort_cols=["user_id"])
    write_bucketed(users, "t_users_bkt", ["user_id"], n_buckets=8,
                   sort_cols=["user_id"])
    yield "t_events_bkt", "t_users_bkt"
    spark.sql("DROP TABLE IF EXISTS t_events_bkt")
    spark.sql("DROP TABLE IF EXISTS t_users_bkt")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    t_ev, t_us = bucketed_tables
    # disable broadcast so the co-location (not a broadcast) removes the
    # shuffle — on a 100 TB fact/fact join neither side broadcasts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t_ev).join(spark.table(t_us), "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and it computes the right thing
        row = joined.filter(F.col("event_id") == 1).select("n_events").first()
        assert row is not None and row[0] >= 1
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_matches_unbucketed(spark, bucketed_tables):
    t_ev, t_us = bucketed_tables
    ev = load_table(spark, SF_DIR, "events")
    users = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    expected = sorted(
        map(tuple, ev.select("event_id", "user_id").join(users, "user_id")
            .select("event_id", "n_events").collect())
    )
    got = sorted(
        map(tuple, spark.table(t_ev).join(spark.table(t_us), "user_id")
            .select("event_id", "n_events").collect())
    )
    assert got == expected
