"""Canary: load_table must agree with an independent arrow read.

The driver regenerates /root/testdata between rounds and has already
changed physical encodings once (events.ts TIMESTAMP(NANOS) ->
TIMESTAMP(MICROS) in round 4), which silently corrupted every timestamp
1000x under the then-hardcoded nanos shim. This cross-checks a value
sample of every table against pyarrow's own decoding so the next format
change fails HERE, loudly, instead of as 50 red driver rows.
"""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import pyarrow.parquet as pq
import pytest

from concerts_etl_sa_spark.schemas import TESTDATA_SCHEMAS
from concerts_etl_sa_spark.sources.readers import load_table

from .conftest import SF_DIR


def _canon(v):
    if isinstance(v, float):
        return None if math.isnan(v) else round(v, 9)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    return v


@pytest.mark.parametrize("table", sorted(TESTDATA_SCHEMAS))
def test_load_table_matches_arrow(spark, table):
    at = pq.read_table(f"{SF_DIR}/{table}.parquet")
    cols = at.column_names
    # Counter, not set: a multiplicity swap between two existing rows
    # ({A:2,B:1} read as {A:1,B:2}) preserves the row SET and the total
    # count — comparing multisets catches it (and subsumes num_rows).
    arrow_rows = Counter(
        tuple(_canon(row[c]) for c in cols)
        for row in at.to_pylist()
    )
    spark_df = load_table(spark, SF_DIR, table).select(*cols)
    spark_rows = Counter(
        tuple(_canon(v) for v in row) for row in spark_df.collect()
    )
    diff = arrow_rows - spark_rows
    rdiff = spark_rows - arrow_rows
    missing = list(diff.items())[:3]
    extra = list(rdiff.items())[:3]
    assert not missing and not extra, (
        f"{table}: spark/arrow divergence (row, count-delta)\n"
        f"  arrow-only: {missing}\n  spark-only: {extra}"
    )
