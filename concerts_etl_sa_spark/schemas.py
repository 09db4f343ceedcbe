"""Explicit schemas for every table the engine reads or produces.

Reference analog: pydantic row models (concerts_etl/core/models.py:8-47)
validate on construction; the Spark engine instead pins an explicit
StructType on every read — never ``inferSchema`` (SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- testdata

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ------------------------------------------------------------ domain model

# NormalizedEvent analog (reference concerts_etl/core/models.py:27-47).
# event_datetime_local is naive-local (reference contract shotgun.py:56-58);
# the session TZ is pinned to UTC so TimestampType behaves NTZ-like and
# round-trips exactly through the DuckDB oracle's naive TIMESTAMP.
NORMALIZED_EVENT = T.StructType(
    [
        T.StructField("provider", T.StringType(), False),
        T.StructField("event_id_provider", T.StringType(), False),
        T.StructField("event_name", T.StringType(), False),
        T.StructField("city", T.StringType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("event_datetime_local", T.TimestampType(), True),
        T.StructField("timezone", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("tickets_sold_total", T.LongType(), True),
        T.StructField("gross_total", T.DecimalType(18, 2), True),
        T.StructField("net_total", T.DecimalType(18, 2), True),
        T.StructField("currency", T.StringType(), True),
        T.StructField("sell_through_pct", T.DoubleType(), True),
        T.StructField("scrape_ts_utc", T.TimestampType(), False),
        T.StructField("ingestion_run_id", T.StringType(), False),
        T.StructField("artist_name", T.StringType(), True),
        T.StructField("venue_name", T.StringType(), True),
    ]
)

# Consolidated output (reference concerts_etl/core/consolidate_events.py:121-130).
CONSOLIDATED_EVENT = T.StructType(
    [
        T.StructField("event_name", T.StringType(), False),
        T.StructField("event_datetime_local", T.DateType(), False),
        T.StructField("artist", T.StringType(), True),
        T.StructField("venue", T.StringType(), True),
        T.StructField("shotgun_tickets_sold", T.LongType(), True),
        T.StructField("dice_tickets_sold", T.LongType(), True),
        T.StructField("shotgun_event_id", T.StringType(), True),
        T.StructField("dice_event_id", T.StringType(), True),
    ]
)
