"""Dice GraphQL-landed JSONL source (SURVEY §2.A1-A3, §3.2).

The reference pages the Dice GraphQL API and normalizes each
``edges[].node`` dict in a thread pool (concerts_etl/adapters/dice.py:78-165).
The engine's ingestion boundary is the landed-JSONL file the fetcher
writes: one JSON object per line in the GraphQL node shape. From there
everything is declarative Spark —

- explicit nested schema on read, never inferSchema (§1.3): arrays of
  structs for ``artists``/``venues``, struct for ``tickets`` — the one
  semi-structured shape in the reference (dice.py:22-47)
- normalization = scalar projections: first-of-array extraction (B18,
  dice.py:59-63), ISO-Z parse (B12, dice.py:51-57), safe str->int cast
  (B21, dice.py:126-132), trim (B22), constants/defaults (B26),
  per-run lineage stamp (B24/B25, dice.py:152-153)
- the 90-day lookback (A2, dice.py:85-87) is a filter Catalyst pushes
  into the scan

Scale: a JSONL landing zone shards across executors by file split;
normalization is one whole-stage-codegen projection, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# GraphQL node shape (reference dice.py:22-47)
DICE_RAW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("startDatetime", T.StringType()),  # ISO-8601, Z suffix
        T.StructField(
            "artists",
            T.ArrayType(T.StructType([T.StructField("name", T.StringType())])),
        ),
        T.StructField(
            "venues",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("city", T.StringType()),
                        T.StructField("country", T.StringType()),
                        T.StructField("timezoneName", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "tickets",
            T.StructType([T.StructField("totalCount", T.StringType())]),
        ),
        T.StructField("currency", T.StringType()),
    ]
)


def read_dice_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Landed JSONL scan with the pinned nested schema (A1)."""
    return spark.read.schema(DICE_RAW_SCHEMA).json(path)


def _first(arr: str, field: str):
    """B18: lst[0][field], trimmed, null-safe (dice.py:59-63)."""
    v = F.try_element_at(F.col(arr), F.lit(1)).getField(field)
    return F.when(v.isNotNull(), F.trim(v))


def normalize_dice(raw: DataFrame, run_id: str = "dice-api") -> DataFrame:
    """GraphQL node -> NormalizedEvent projection (dice.py:112-156)."""
    ts_utc = F.try_to_timestamp(F.col("startDatetime"))  # B12: Z-suffix ISO
    return raw.select(
        F.lit("dice").alias("provider"),
        F.col("id").alias("event_id_provider"),
        F.coalesce(F.trim("name"), F.lit("")).alias("event_name"),
        _first("venues", "city").alias("city"),
        _first("venues", "country").alias("country"),
        # naive-local contract: reference keeps the parsed datetime naive
        ts_utc.alias("event_datetime_local"),
        F.coalesce(_first("venues", "timezoneName"), F.lit("Europe/Paris")).alias(
            "timezone"
        ),
        F.lit("on sale").alias("status"),  # B26 default (dice.py:148)
        F.col("tickets").getField("totalCount").try_cast("bigint").alias(
            "tickets_sold_total"
        ),  # B21
        F.lit(None).cast("decimal(18,2)").alias("gross_total"),
        F.lit(None).cast("decimal(18,2)").alias("net_total"),
        F.coalesce(F.trim("currency"), F.lit("EUR")).alias("currency"),
        F.lit(None).cast("double").alias("sell_through_pct"),
        F.current_timestamp().alias("scrape_ts_utc"),  # B25
        F.lit(run_id).alias("ingestion_run_id"),       # B24
        F.coalesce(_first("artists", "name"), F.trim("name")).alias(
            "artist_name"
        ),
        _first("venues", "name").alias("venue_name"),
    )


def load_dice_events(
    spark: SparkSession,
    path: str,
    lookback_days: int = 90,
    run_id: str = "dice-api",
) -> DataFrame:
    """Full source: scan + normalize + bounded lookback (A2 analog —
    the filter pushes down to the JSON scan)."""
    out = normalize_dice(read_dice_jsonl(spark, path), run_id=run_id)
    return out.filter(
        F.col("event_datetime_local").isNull()
        | (
            F.col("event_datetime_local")
            >= F.date_sub(F.current_date(), lookback_days)
        )
    )


def dice_landing_parse_sql(src_sql: str) -> str:
    """DuckDB twin of the :func:`load_dice_events` normalize path over
    any GraphQL-node relation (rotation #12): B18 first-of-array
    extraction, B12 ISO-Z parse, B21 safe int cast, projected to the
    columns consolidation consumes. The A2 lookback is omitted: oracle
    callers pass a wide ``lookback_days`` so the run's shape never
    depends on the wall clock (landing_gen's pinned 2030 dates), making
    the Spark-side filter a keep-everything no-op. ``src_sql`` is
    either the read_json scan of real landing files
    (:func:`dice_landing_sql`) or the pure-SQL re-derivation from the
    events table (``landing_gen.dice_nodes_src_sql`` — what the
    self-contained window oracle uses)."""
    first_city = "CASE WHEN venues[1].city IS NOT NULL THEN trim(venues[1].city) END"
    first_vname = "CASE WHEN venues[1].name IS NOT NULL THEN trim(venues[1].name) END"
    first_artist = "CASE WHEN artists[1].name IS NOT NULL THEN trim(artists[1].name) END"
    # B12 'Z'-suffix parse, host-tz-safe (round-15 review finding #1):
    # Spark's try_to_timestamp converts the UTC instant into the
    # SESSION timezone's wall clock; a bare try_cast(... AS TIMESTAMP)
    # in DuckDB keeps the naive wall clock instead, so the two engines
    # disagree on every row whenever the host tz is not UTC. Parsing
    # through TIMESTAMPTZ (instant) and casting down to TIMESTAMP
    # applies DuckDB's session tz — the same host default Spark's
    # plain session inherits — restoring parity on any host. (With the
    # DERIVATION source the string itself is rendered from the stored
    # naive ts, so end-to-end tz behavior follows the repo-wide class
    # measured in BASELINE.md round-15 — resolved by the r16 NTZ
    # migration, not per-row devices.)
    ts = "try_cast(try_cast(startDatetime AS TIMESTAMPTZ) AS TIMESTAMP)"
    return f"""
SELECT
  id AS event_id_provider,
  coalesce(trim(name), '') AS event_name,
  {first_city} AS city,
  {ts} AS event_datetime_local,
  try_cast(tickets.totalCount AS BIGINT) AS tickets_sold_total,
  coalesce({first_artist}, trim(name)) AS artist_name,
  {first_vname} AS venue_name
FROM ({src_sql})
"""


def dice_landing_sql(path: str) -> str:
    """File-reading form of the landing normalize twin: read_json with
    the SAME pinned nested schema the Spark side scans (used by the
    generator↔derivation lockstep test)."""
    return dice_landing_parse_sql(
        f"""SELECT * FROM read_json('{path}/*.json',
    format='newline_delimited',
    columns={{id:'VARCHAR', name:'VARCHAR', startDatetime:'VARCHAR',
             artists:'STRUCT(name VARCHAR)[]',
             venues:'STRUCT(name VARCHAR, city VARCHAR, country VARCHAR,
                            timezoneName VARCHAR)[]',
             tickets:'STRUCT(totalCount VARCHAR)', currency:'VARCHAR'}})"""
    )
