"""Shotgun scraped-card source (SURVEY §2.A4-A6, §3.1 step 1).

The reference drives headless Chromium through login/scroll/harvest
(adapters/shotgun.py:116-478) and then parses each DOM card with plain
Python. The browser part is out of engine scope (it is the fetcher that
writes the landing zone); the ENGINE boundary is the harvested card dump
— one JSON object per card with the raw fields the DOM harvest yields.
From there the whole per-card parse loop (shotgun.py:276-463) becomes one
whole-stage-codegen projection:

- A6 card dedup      : md5 of the first 512 chars of outer_html
                       (shotgun.py:216-231's hash(outerHTML[:512]))
- C5 nameless skip   : cards with no extractable name are dropped
- B17 artist@venue   : split heuristic with hint priority
- B10/B11 datetime   : <time datetime> ISO attr -> label -> free-text
                       FR cascade (3-stage coalesce)
- B19 status         : 'COMPLET' -> sold out
- B6/B7 money + ints : fr-FR money parse, nbsp-tolerant int extraction
- C4 stat-cell pick  : first stat whose suffix isn't a daily counter
- B9/B24/B25 lineage : stable surrogate id + run-id/timestamp stamp

Scale: the landing zone shards by file split; parsing is shuffle-free and
linear — exactly what a 100 TB scrape backfill needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.dates import parse_event_datetime
from ..functions.ids import stable_event_id
from ..functions.money import parse_int, parse_money_eur_decimal
from ..functions.text import derive_status, split_artist, split_venue

# harvested-card dump shape (the DOM harvest's output, shotgun.py:210-258)
CARD_SCHEMA = T.StructType(
    [
        T.StructField("outer_html", T.StringType()),
        T.StructField("name_text", T.StringType()),      # title element text
        T.StructField("time_attr", T.StringType()),      # <time datetime=...>
        T.StructField("card_text", T.StringType()),      # full visible text
        T.StructField("gross_text", T.StringType()),     # revenue cell
        T.StructField("stat_values", T.ArrayType(T.StringType())),
        T.StructField("stat_suffixes", T.ArrayType(T.StringType())),
        T.StructField("city_text", T.StringType()),
    ]
)


def read_cards_jsonl(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(CARD_SCHEMA).json(path)


# A6 winner tie-break: the scalar card fields, ascending, NULLS FIRST
# on BOTH engines (Spark's asc default is nulls-first; DuckDB's is
# nulls-LAST, so the twin pins it explicitly). Deterministic whenever
# same-hash cards differ in any scalar field; cards identical in every
# scalar but differing only in the stat arrays would still tie — the
# reference's own rule is "first harvested wins" (arbitrary), and the
# fixture's duplicates are bit-identical full rows.
_DEDUP_ORDER_COLS = (
    "outer_html", "name_text", "time_attr", "card_text", "gross_text",
    "city_text",
)


def dedup_cards(cards: DataFrame) -> DataFrame:
    """A6: overlapping selectors harvest the same DOM node more than
    once; dedup on a content hash of the html prefix
    (hash(outerHTML[:512])). Winner selection is DETERMINISTIC (round-15
    review finding #4): the min row under ``_DEDUP_ORDER_COLS`` —
    ``dropDuplicates`` kept a partition-order-dependent row, which was
    only parity-safe while same-hash duplicates were bit-identical; a
    same-prefix-different-suffix card (real scrapes have them) would
    have made the oracle comparison flake run-to-run. Plan shape: one
    shuffle on the hash + a within-group sort of dup-multiplicity-sized
    groups — same exchange key as dropDuplicates, negligible sort."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("content_hash").orderBy(
        *[F.asc_nulls_first(c) for c in _DEDUP_ORDER_COLS]
    )
    return (
        cards.withColumn(
            "content_hash",
            F.md5(F.substring(F.coalesce("outer_html", F.lit("")), 1, 512)),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("content_hash", "_rn")
    )


def _pick_total_stat(values: str, suffixes: str):
    """C4: first value whose suffix isn't a daily counter ('aujourd')."""
    keep = F.filter(
        F.sequence(F.lit(1), F.greatest(F.size(values), F.lit(1))),
        lambda i: ~F.contains(
            F.lower(F.coalesce(F.try_element_at(suffixes, i), F.lit(""))),
            F.lit("aujourd"),
        ),
    )
    return F.try_element_at(F.col(values), F.try_element_at(keep, F.lit(1)))


def normalize_shotgun(cards: DataFrame, run_id: str = "shotgun-scrape") -> DataFrame:
    """Per-card parse loop (shotgun.py:276-463) as one projection."""
    name = F.trim(F.regexp_replace(F.coalesce("name_text", F.lit("")), r"\s+", " "))
    dt = F.coalesce(
        F.try_to_timestamp(F.col("time_attr")),          # stage 1: ISO attr
        parse_event_datetime(F.col("card_text")),        # stages 2-3: text
    )
    dt_key = F.date_format(dt, "yyyy-MM-dd'T'HH:mm:ss")
    tickets = parse_int(_pick_total_stat("stat_values", "stat_suffixes"))
    return (
        cards.filter(name != "")                         # C5 nameless skip
        .select(
            F.lit("shotgun").alias("provider"),
            stable_event_id(name, dt_key).alias("event_id_provider"),  # B9
            name.alias("event_name"),
            F.trim(F.coalesce("city_text", F.lit(""))).alias("city"),
            F.lit(None).cast("string").alias("country"),  # B26
            dt.alias("event_datetime_local"),
            F.lit("Europe/Paris").alias("timezone"),
            derive_status(F.col("card_text")).alias("status"),  # B19
            tickets.alias("tickets_sold_total"),                # B7 + C4
            # B6 — SURVEY §7.3.5: DecimalType(18,2) at rest; oracle-
            # compared expressions cast to double at the comparison
            # boundary, never at rest
            parse_money_eur_decimal(F.col("gross_text")).alias("gross_total"),
            F.lit(None).cast("decimal(18,2)").alias("net_total"),
            F.lit("EUR").alias("currency"),
            F.lit(None).cast("double").alias("sell_through_pct"),
            F.current_timestamp().alias("scrape_ts_utc"),       # B25
            F.lit(run_id).alias("ingestion_run_id"),            # B24
            split_artist(name).alias("artist_name"),            # B17
            split_venue(name).alias("venue_name"),
        )
    )


def load_shotgun_events(
    spark: SparkSession, path: str, run_id: str = "shotgun-scrape"
) -> DataFrame:
    """Full source: scan -> dedup -> parse (the reference's steps 1c-1d)."""
    return normalize_shotgun(dedup_cards(read_cards_jsonl(spark, path)), run_id)


def shotgun_landing_parse_sql(src_sql: str) -> str:
    """DuckDB twin of the :func:`load_shotgun_events` PARSE path over
    any card-dump relation (rotation #12): the same A6
    dedup-by-content-hash (deterministic winner, above), C5 nameless
    skip and parse cascade, projected to the columns consolidation
    consumes, all from the package's shared ``*_sql`` twins. Lineage
    columns (scrape_ts_utc, run id) are per-run stamps with no oracle
    meaning and are not projected. ``src_sql`` is either the read_json
    scan of real landing files (:func:`shotgun_landing_sql`) or the
    pure-SQL re-derivation from the events table
    (``landing_gen.shotgun_cards_src_sql`` — what the self-contained
    window oracle uses)."""
    from ..functions.dates import parse_event_datetime_sql
    from ..functions.ids import stable_event_id_sql
    from ..functions.money import parse_int_sql
    from ..functions.text import split_artist_sql, split_venue_sql

    name = r"trim(regexp_replace(coalesce(name_text, ''), '\s+', ' ', 'g'))"
    dt = (
        "coalesce(try_cast(time_attr AS TIMESTAMP), "
        + parse_event_datetime_sql("card_text")
        + ")"
    )
    # C4 total-stat pick (_pick_total_stat): first value whose suffix
    # is not a daily counter — same 1-based lambda indexing both engines
    pick = (
        "stat_values[list_filter("
        "generate_series(1, greatest(len(stat_values), 1)), "
        "i -> NOT contains(lower(coalesce(stat_suffixes[i], '')), "
        "'aujourd'))[1]]"
    )
    return f"""
SELECT
  {stable_event_id_sql("nm", "strftime(dt, '%Y-%m-%dT%H:%M:%S')")}
    AS event_id_provider,
  nm AS event_name,
  trim(coalesce(city_text, '')) AS city,
  dt AS event_datetime_local,
  {parse_int_sql(pick)} AS tickets_sold_total,
  {split_artist_sql("nm")} AS artist_name,
  {split_venue_sql("nm")} AS venue_name
FROM (
  SELECT *, {name} AS nm, {dt} AS dt FROM (
    SELECT * EXCLUDE (rn) FROM (
      SELECT *, row_number() OVER (
        PARTITION BY md5(substring(coalesce(outer_html, ''), 1, 512))
        ORDER BY {", ".join(c + " ASC NULLS FIRST" for c in _DEDUP_ORDER_COLS)}
      ) AS rn
      FROM ({src_sql})
    ) WHERE rn = 1
  ) WHERE {name} <> ''
)
"""


def shotgun_landing_sql(path: str) -> str:
    """File-reading form of the landing parse twin: read_json over the
    SAME landing files the Spark side scans (used by the
    generator↔derivation lockstep test)."""
    return shotgun_landing_parse_sql(
        f"""SELECT * FROM read_json('{path}/*.json',
        format='newline_delimited',
        columns={{outer_html:'VARCHAR', name_text:'VARCHAR',
                 time_attr:'VARCHAR', card_text:'VARCHAR',
                 gross_text:'VARCHAR', stat_values:'VARCHAR[]',
                 stat_suffixes:'VARCHAR[]', city_text:'VARCHAR'}})"""
    )
