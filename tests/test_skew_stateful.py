"""Salted-join/distinct equivalence + applyInPandasWithState dedup."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from concerts_etl_sa_spark.operators.skew import (
    salted_distinct_count,
    salted_join,
)
from concerts_etl_sa_spark.sources.readers import load_table
from concerts_etl_sa_spark.streaming import incremental as SI
from concerts_etl_sa_spark.streaming.stateful import run_streaming_dedup

from .conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    # event_type is the classic skew key: very few distinct values
    ev = load_table(spark, SF_DIR, "events")
    dim = ev.select("event_type").distinct().withColumn(
        "type_weight", F.length("event_type")
    )
    plain = ev.join(dim, "event_type").select("event_id", "type_weight")
    salted = salted_join(ev, dim, "event_type", salt_from=["event_id"]).select(
        "event_id", "type_weight"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_spreads_hot_key(spark):
    ev = load_table(spark, SF_DIR, "events")
    dim = ev.select("event_type").distinct()
    out = salted_join(ev, dim, "event_type", salt_from=["event_id"], n_salt=8)
    # the physical join key includes the salt => 8x key cardinality
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan


def test_salted_distinct_count_exact(spark):
    ev = load_table(spark, SF_DIR, "events")
    expected = {
        (r[0], r[1])
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id"))
        .collect()
    }
    got = {
        (r[0], r[1])
        for r in salted_distinct_count(ev, "event_type", "user_id").collect()
    }
    assert got == expected


def test_streaming_stateful_dedup(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # same file staged twice: every event arrives in two micro-batch waves
    shutil.copy(f"{SF_DIR}/events.parquet", src / "a.parquet")
    shutil.copy(f"{SF_DIR}/events.parquet", src / "b.parquet")

    ev = SI.read_events_stream(spark, str(src))
    q = run_streaming_dedup(ev, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    assert not q.isActive

    got = spark.read.parquet(str(tmp_path / "out"))
    n_src = load_table(spark, SF_DIR, "events").count()
    # duplicates across (and within) micro-batches are dropped by state
    assert got.count() == n_src
    assert got.select("event_id").distinct().count() == n_src
