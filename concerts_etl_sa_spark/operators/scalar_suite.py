"""Remaining scalar-operator queries (SURVEY §2.B5, B10-B13, B18, B20-B27, C4).

Each query exercises one or more reference row-functions over driver
testdata, with a value-identical DuckDB oracle:

- B5  date extraction       : consolidate_events.py:28-38
- B10/B11 FR datetime cascade : shotgun.py:56-84,307-373 (deterministic
  regex-cascade re-spec, SURVEY §7.3.3 — oracle-checkable because both
  engines run the same RE2-safe patterns + month map)
- B12 ISO-8601 Z parse      : dice.py:51-57
- B13 UTC ISO format        : dice.py:65-66
- B18 first-of-array-of-structs : dice.py:59-63
- B20-B27 defaults bundle   : coalesce cascades, constants, trim,
  safe casts, lowercase sort key (consolidate_events.py:111-119,
  dice.py:113-156, shotgun.py:442-460)
- C4  'aujourd' stat-cell pick : shotgun.py:409-423

ANSI note: Spark 4 runs ANSI mode — every indexed access/cast in here is
a ``try_*`` form so malformed rows degrade to null (K3 per-row error
isolation) instead of failing the job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dates as Fd
from ..sources.readers import load_table
from .fixtures import shotgun_events_sql

__all__ = [
    "date_extraction", "DATE_EXTRACTION_SQL",
    "fr_datetime_cascade", "FR_DATETIME_CASCADE_SQL",
    "iso_roundtrip", "ISO_ROUNDTRIP_SQL",
    "nested_first", "NESTED_FIRST_SQL",
    "defaults_bundle", "DEFAULTS_BUNDLE_SQL",
    "stat_cell_pick", "STAT_CELL_PICK_SQL",
    "event_scalar_suite", "EVENT_SCALAR_SUITE_SQL",
]


# ----------------------------------------------------- B5 date extraction

def date_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    date_text = F.when(
        F.col("event_id") % 2 == 0,
        F.concat(F.date_format("ts", "yyyy-MM-dd"), F.lit(" 20:00 Olympia")),
    ).otherwise(F.lit("date a confirmer"))
    return ev.select(
        "event_id",
        Fd.event_day(F.col("ts")).alias("event_day"),
        Fd.date_str_prefix(date_text).alias("date_prefix"),
    )


DATE_EXTRACTION_SQL = f"""
SELECT event_id, CAST(ts AS DATE) AS event_day,
       {Fd.date_str_prefix_sql("date_text")} AS date_prefix
FROM (
  SELECT event_id, ts,
         CASE WHEN event_id % 2 = 0
              THEN strftime(ts, '%Y-%m-%d') || ' 20:00 Olympia'
              ELSE 'date a confirmer' END AS date_text
  FROM events
)
"""


# ------------------------------------- B10/B11 FR datetime parse cascade

# cascade SQL twin moved to functions/dates.py in round 15 (shared with
# the landing-lifecycle oracle); re-exported here for back-compat
_fr_cascade_sql = Fd.parse_event_datetime_sql


def _card_text_col():
    """Synthesized scrape-card text: ISO attr / FR label / garbage."""
    pat = F.col("event_id") % 3
    return (
        F.when(
            pat == 0,
            F.concat(
                F.lit("<time> "),
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
                F.lit(" </time>"),
            ),
        )
        .when(
            pat == 1,
            F.concat(
                F.lit("ven. "),
                F.date_format("ts", "d"),
                F.element_at(
                    F.array(
                        *[
                            F.lit(f" {m}. ")
                            for m in (
                                "janv", "févr", "mars", "avr", "mai", "juin",
                                "juil", "août", "sept", "oct", "nov", "déc",
                            )
                        ]
                    ),
                    F.month("ts"),
                ),
                F.date_format("ts", "yyyy HH:mm"),
            ),
        )
        .otherwise(F.lit("billetterie bientot disponible"))
    )


_CARD_TEXT_SQL = """
CASE event_id % 3
  WHEN 0 THEN '<time> ' || strftime(ts, '%Y-%m-%dT%H:%M:%S') || ' </time>'
  WHEN 1 THEN 'ven. ' || CAST(day(ts) AS VARCHAR)
           || ([' janv. ', ' févr. ', ' mars. ', ' avr. ', ' mai. ', ' juin. ',
                ' juil. ', ' août. ', ' sept. ', ' oct. ', ' nov. ', ' déc. ']
              )[month(ts)]
           || strftime(ts, '%Y %H:%M')
  ELSE 'billetterie bientot disponible'
END
"""


def fr_datetime_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        Fd.parse_event_datetime(_card_text_col()).alias("parsed_dt"),
    )


FR_DATETIME_CASCADE_SQL = f"""
SELECT event_id, {_fr_cascade_sql("card_text")} AS parsed_dt
FROM (SELECT event_id, {_CARD_TEXT_SQL} AS card_text FROM events)
"""


# -------------------------------------------- B12/B13 ISO Z parse + format

def iso_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse Z-suffixed ISO strings (B12), re-format as UTC ISO (B13);
    malformed -> null (try_to_timestamp = reference's None-on-failure)."""
    ev = load_table(spark, sf_dir, "events")
    iso_text = F.when(
        F.col("event_id") % 7 == 0, F.lit("not-a-timestamp")
    ).otherwise(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"))
    parsed = F.try_to_timestamp(iso_text)
    return ev.select(
        "event_id",
        parsed.alias("parsed_ts"),
        Fd.iso_utc_format(parsed).alias("iso_utc"),
    )


ISO_ROUNDTRIP_SQL = """
SELECT event_id, parsed_ts, strftime(parsed_ts, '%Y-%m-%dT%H:%M:%SZ') AS iso_utc
FROM (
  SELECT event_id,
         try_cast(CASE WHEN event_id % 7 = 0 THEN 'not-a-timestamp'
                       ELSE strftime(ts, '%Y-%m-%dT%H:%M:%SZ') END
                  AS TIMESTAMP) AS parsed_ts
  FROM events
)
"""


# ------------------------------------- B18 first-of-array-of-structs

def nested_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dice GraphQL shape: venues array-of-structs + tickets struct;
    extract first venue's fields (trimmed, null-safe) + nested count."""
    cu = load_table(spark, sf_dir, "customer")
    venues = F.when(F.col("c_custkey") % 5 == 0, F.array()).otherwise(
        F.array(
            F.struct(
                F.concat(F.lit("  "), F.col("c_name"), F.lit(" ")).alias("name"),
                F.col("c_mktsegment").alias("city"),
            ),
            F.struct(F.lit("Backup Hall").alias("name"), F.lit("Lyon").alias("city")),
        )
    )
    tickets = F.struct((F.col("c_custkey") % 500).cast("string").alias("totalCount"))
    first = F.try_element_at(venues, F.lit(1))
    return cu.select(
        "c_custkey",
        F.trim(first.getField("name")).alias("venue_name"),
        first.getField("city").alias("venue_city"),
        tickets.getField("totalCount").try_cast("bigint").alias("tickets_count"),
    )


NESTED_FIRST_SQL = """
SELECT c_custkey,
       trim(venues[1].name) AS venue_name,
       venues[1].city AS venue_city,
       try_cast(tickets.totalCount AS BIGINT) AS tickets_count
FROM (
  SELECT c_custkey,
         CASE WHEN c_custkey % 5 = 0
              THEN []::STRUCT(name VARCHAR, city VARCHAR)[]
              ELSE [{'name': '  ' || c_name || ' ', 'city': c_mktsegment},
                    {'name': 'Backup Hall', 'city': 'Lyon'}] END AS venues,
         {'totalCount': CAST(c_custkey % 500 AS VARCHAR)} AS tickets
  FROM customer
)
"""


# ----------------------------- B20-B27 defaults / constants / casts bundle

def defaults_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coalesce cascades (B20), safe str->int cast (B21), trim (B22),
    constants (B24-B26), lowercase sort key (B27) over the SG fixture."""
    from .fixtures import shotgun_events

    sg = shotgun_events(load_table(spark, sf_dir, "events"))
    tickets_text = F.when(
        F.col("tickets_sold_total") % 3 == 0, F.lit("n/a")
    ).otherwise(F.col("tickets_sold_total").cast("string"))
    return sg.select(
        "event_id_provider",
        F.coalesce("venue_name", "city", F.lit("")).alias("venue_display"),
        tickets_text.try_cast("bigint").alias("tickets_safe"),
        F.trim(F.concat(F.lit(" EUR "))).alias("currency"),
        F.lit("shotgun").alias("provider_const"),
        F.coalesce(F.col("timezone"), F.lit("Europe/Paris")).alias("tz"),
        F.lower(F.coalesce("event_name", F.lit(""))).alias("sort_key"),
    )


DEFAULTS_BUNDLE_SQL = f"""
SELECT event_id_provider,
       coalesce(venue_name, city, '') AS venue_display,
       try_cast(CASE WHEN tickets_sold_total % 3 = 0 THEN 'n/a'
                     ELSE CAST(tickets_sold_total AS VARCHAR) END
                AS BIGINT) AS tickets_safe,
       trim(' EUR ') AS currency,
       'shotgun' AS provider_const,
       coalesce(timezone, 'Europe/Paris') AS tz,
       lower(coalesce(event_name, '')) AS sort_key
FROM ({shotgun_events_sql()})
"""


# ------------------- B5 + B12/B13 + B14 + B19 merged events-table suite

def event_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass scalar suite over ``events``: date extraction (B5),
    ISO Z parse + UTC format (B12/B13), 5-min floor (B14), status
    derivation (B19). Merged so the driver's bounded correctness window
    (50 registry entries) still oracle-checks every op; a single scan +
    projection is also exactly how these land in a real pipeline."""
    from ..functions import text as Ft

    ev = load_table(spark, sf_dir, "events")
    date_text = F.when(
        F.col("event_id") % 2 == 0,
        F.concat(F.date_format("ts", "yyyy-MM-dd"), F.lit(" 20:00 Olympia")),
    ).otherwise(F.lit("date a confirmer"))
    iso_text = F.when(
        F.col("event_id") % 7 == 0, F.lit("not-a-timestamp")
    ).otherwise(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"))
    parsed = F.try_to_timestamp(iso_text)
    card_text = F.when(
        F.col("event_id") % 4 == 0, F.lit("Complet — plus de places")
    ).otherwise(F.lit("Places disponibles"))
    return ev.select(
        "event_id",
        Fd.event_day(F.col("ts")).alias("event_day"),
        Fd.date_str_prefix(date_text).alias("date_prefix"),
        Fd.round5(F.col("ts")).alias("ts5"),
        parsed.alias("parsed_ts"),
        Fd.iso_utc_format(parsed).alias("iso_utc"),
        Ft.derive_status(card_text).alias("status"),
    )


def _event_scalar_suite_sql() -> str:
    from ..functions import text as Ft

    return f"""
SELECT event_id,
       CAST(ts AS DATE) AS event_day,
       {Fd.date_str_prefix_sql("date_text")} AS date_prefix,
       {Fd.round5_sql("ts")} AS ts5,
       parsed_ts,
       strftime(parsed_ts, '%Y-%m-%dT%H:%M:%SZ') AS iso_utc,
       {Ft.derive_status_sql("card_text")} AS status
FROM (
  SELECT event_id, ts,
         CASE WHEN event_id % 2 = 0
              THEN strftime(ts, '%Y-%m-%d') || ' 20:00 Olympia'
              ELSE 'date a confirmer' END AS date_text,
         try_cast(CASE WHEN event_id % 7 = 0 THEN 'not-a-timestamp'
                       ELSE strftime(ts, '%Y-%m-%dT%H:%M:%SZ') END
                  AS TIMESTAMP) AS parsed_ts,
         CASE WHEN event_id % 4 = 0 THEN 'Complet — plus de places'
              ELSE 'Places disponibles' END AS card_text
  FROM events
)
"""


EVENT_SCALAR_SUITE_SQL = _event_scalar_suite_sql()


# ------------------------------------------- C4 'aujourd' stat-cell pick

def stat_cell_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scraped stat cells come as parallel (value, suffix) arrays; pick the
    first value whose suffix is NOT a daily counter (contains 'aujourd')."""
    li = load_table(spark, sf_dir, "lineitem")
    vals = F.array(
        F.col("l_quantity").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    sufs = F.when(
        F.col("l_orderkey") % 2 == 0,
        F.array(F.lit("vendus aujourd'hui"), F.lit("vendus au total")),
    ).otherwise(F.array(F.lit("vendus au total"), F.lit("vendus aujourd'hui")))
    keep_idx = F.filter(
        F.sequence(F.lit(1), F.lit(2)),
        lambda i: ~F.contains(F.try_element_at(sufs, i), F.lit("aujourd")),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_element_at(vals, F.try_element_at(keep_idx, F.lit(1))).alias(
            "total_stat"
        ),
    )


STAT_CELL_PICK_SQL = """
SELECT l_orderkey, l_linenumber,
       vals[list_filter([1, 2], i -> NOT contains(sufs[i], 'aujourd'))[1]]
         AS total_stat
FROM (
  SELECT l_orderkey, l_linenumber,
         [CAST(l_quantity AS VARCHAR), CAST(l_linenumber AS VARCHAR)] AS vals,
         CASE WHEN l_orderkey % 2 = 0
              THEN ['vendus aujourd''hui', 'vendus au total']
              ELSE ['vendus au total', 'vendus aujourd''hui'] END AS sufs
  FROM lineitem
)
"""
