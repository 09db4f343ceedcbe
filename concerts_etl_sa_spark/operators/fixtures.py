"""Deterministic provider-event derivation from ``events.parquet``.

The consolidation operators (SURVEY §2.D) need two inputs shaped like the
reference's ``NormalizedEvent`` (concerts_etl/core/models.py:27-47).
FIXTURES.md §B specifies deriving them from the driver's ``events`` table
with pure column expressions (no randomness) so that the Spark pipeline and
the DuckDB oracle compute byte-identical inputs.

Derivation scheme (covers FIXTURES.md §B edge cases 1-9):

- ``shotgun_events``: rows with event_id % 3 == 0; name pattern by
  event_id % 4 — 'ARTIST @ VENUE' / 'A feat B' / 'A x B' / plain artist.
  Null event_datetime_local when event_id % 17 == 0 (C1).
- ``dice_events``: rows with event_id % 3 == 1; name pattern by
  event_id % 5 — UPPER(artist) / 'ARTIST - VENUE' / 'A & B' /
  'Artist Live' / plain. Null datetime when event_id % 19 == 0.
- Artists drawn from a 20-name pool (accented, multi-word, stopword-laden)
  keyed on user_id so same-day cross-provider token overlaps occur
  naturally; venue pool keyed on event_id.

Both engines must agree bit-for-bit; note DuckDB rounds double->bigint
casts while Spark truncates, so tickets use floor() first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 20 artists — accents restricted to the engine's fold map (text.ACCENT_SRC)
ARTISTS = [
    "Angèle", "Stromae", "Désiré Dubois", "Müller Brothers", "La Femme",
    "Justice", "Phoenix", "Sébastien Tellier", "Aya Nakamura",
    "Christine and the Queens", "Caravan Palace", "Fakear", "Petit Biscuit",
    "Polo & Pan", "Vitalic", "Rone", "Yelle", "Flavien Berger", "Camille",
    "Air",
]

VENUES = [
    "Olympia", "Zenith Paris", "La Cigale", "Bataclan", "Accor Arena",
    "Elysée Montmartre", "Trabendo",
]

CITIES = ["Paris", "Lyon", "Marseille", "Lille", "Nantes"]

# Injected as-of date for the past-date filter (C2) — SURVEY §7.4 replaces
# the reference's wall-clock date.today() with a fixed literal so results
# are reproducible. events.ts spans 2024-01-01..2024-01-30 at every sf, so
# mid-month keeps ~half the rows and drops ~half (exercises both sides).
AS_OF = "2024-01-15"


def _pick(pool: list[str], idx: Column) -> Column:
    """pool[idx] via element_at (1-based, mirrors DuckDB list indexing)."""
    return F.element_at(F.array(*[F.lit(s) for s in pool]), idx)


def _pick_sql(pool: list[str], idx_e: str) -> str:
    inner = ", ".join("'" + s.replace("'", "''") + "'" for s in pool)
    return f"([{inner}])[{idx_e}]"


def _common_cols(side: str):
    artist_idx = (F.col("user_id") % 20 + 1).cast("int")
    artist2_idx = ((F.col("user_id") + 7) % 20 + 1).cast("int")
    venue_idx = (F.col("event_id") % 7 + 1).cast("int")
    city_idx = (F.col("event_id") % 5 + 1).cast("int")
    return {
        "artist": _pick(ARTISTS, artist_idx),
        "artist2": _pick(ARTISTS, artist2_idx),
        "venue": _pick(VENUES, venue_idx),
        "city": _pick(CITIES, city_idx),
    }


_COMMON_SQL = {
    "artist": _pick_sql(ARTISTS, "CAST(user_id % 20 + 1 AS INT)"),
    "artist2": _pick_sql(ARTISTS, "CAST((user_id + 7) % 20 + 1 AS INT)"),
    "venue": _pick_sql(VENUES, "CAST(event_id % 7 + 1 AS INT)"),
    "city": _pick_sql(CITIES, "CAST(event_id % 5 + 1 AS INT)"),
}


def shotgun_events(events: DataFrame) -> DataFrame:
    """Shotgun-side NormalizedEvent projection of the events table."""
    c = _common_cols("sg")
    pat = F.col("event_id") % 4
    name = (
        F.when(pat == 0, F.concat(c["artist"], F.lit(" @ "), c["venue"]))
        .when(pat == 1, F.concat(c["artist"], F.lit(" feat "), c["artist2"]))
        .when(pat == 2, F.concat(c["artist"], F.lit(" x "), c["artist2"]))
        .otherwise(c["artist"])
    )
    dt = F.when(F.col("event_id") % 17 == 0, F.lit(None)).otherwise(F.col("ts"))
    return (
        events.filter(F.col("event_id") % 3 == 0)
        .select(
            F.lit("shotgun").alias("provider"),
            F.concat(F.lit("sg-"), F.col("event_id")).alias("event_id_provider"),
            name.alias("event_name"),
            c["city"].alias("city"),
            dt.cast("timestamp").alias("event_datetime_local"),
            F.lit("Europe/Paris").alias("timezone"),
            F.floor(F.col("value")).cast("bigint").alias("tickets_sold_total"),
            c["artist"].alias("artist_name"),
            F.when(pat == 0, c["venue"]).alias("venue_name"),
        )
    )


def shotgun_events_sql(events_rel: str = "events") -> str:
    a, a2, v, ci = (
        _COMMON_SQL["artist"], _COMMON_SQL["artist2"],
        _COMMON_SQL["venue"], _COMMON_SQL["city"],
    )
    return f"""
SELECT
  'shotgun' AS provider,
  'sg-' || CAST(event_id AS VARCHAR) AS event_id_provider,
  CASE event_id % 4
    WHEN 0 THEN {a} || ' @ ' || {v}
    WHEN 1 THEN {a} || ' feat ' || {a2}
    WHEN 2 THEN {a} || ' x ' || {a2}
    ELSE {a}
  END AS event_name,
  {ci} AS city,
  CASE WHEN event_id % 17 = 0 THEN NULL ELSE ts END AS event_datetime_local,
  'Europe/Paris' AS timezone,
  CAST(floor(value) AS BIGINT) AS tickets_sold_total,
  {a} AS artist_name,
  CASE WHEN event_id % 4 = 0 THEN {v} ELSE NULL END AS venue_name
FROM {events_rel}
WHERE event_id % 3 = 0
"""


def dice_events(events: DataFrame) -> DataFrame:
    """Dice-side NormalizedEvent projection of the events table."""
    c = _common_cols("dc")
    pat = F.col("event_id") % 5
    name = (
        F.when(pat == 0, F.upper(c["artist"]))
        .when(pat == 1, F.concat(c["artist"], F.lit(" - "), c["venue"]))
        .when(pat == 2, F.concat(c["artist"], F.lit(" & "), c["artist2"]))
        .when(pat == 3, F.concat(c["artist"], F.lit(" Live")))
        .otherwise(c["artist"])
    )
    dt = F.when(F.col("event_id") % 19 == 0, F.lit(None)).otherwise(F.col("ts"))
    return (
        events.filter(F.col("event_id") % 3 == 1)
        .select(
            F.lit("dice").alias("provider"),
            F.concat(F.lit("dc-"), F.col("event_id")).alias("event_id_provider"),
            name.alias("event_name"),
            c["city"].alias("city"),
            dt.cast("timestamp").alias("event_datetime_local"),
            F.lit("Europe/Paris").alias("timezone"),
            F.floor(F.col("value") / 2).cast("bigint").alias("tickets_sold_total"),
            c["artist"].alias("artist_name"),
            F.when(pat == 1, c["venue"]).alias("venue_name"),
        )
    )


def dice_events_sql(events_rel: str = "events") -> str:
    a, a2, v, ci = (
        _COMMON_SQL["artist"], _COMMON_SQL["artist2"],
        _COMMON_SQL["venue"], _COMMON_SQL["city"],
    )
    return f"""
SELECT
  'dice' AS provider,
  'dc-' || CAST(event_id AS VARCHAR) AS event_id_provider,
  CASE event_id % 5
    WHEN 0 THEN upper({a})
    WHEN 1 THEN {a} || ' - ' || {v}
    WHEN 2 THEN {a} || ' & ' || {a2}
    WHEN 3 THEN {a} || ' Live'
    ELSE {a}
  END AS event_name,
  {ci} AS city,
  CASE WHEN event_id % 19 = 0 THEN NULL ELSE ts END AS event_datetime_local,
  'Europe/Paris' AS timezone,
  CAST(floor(value / 2) AS BIGINT) AS tickets_sold_total,
  {a} AS artist_name,
  CASE WHEN event_id % 5 = 1 THEN {v} ELSE NULL END AS venue_name
FROM {events_rel}
WHERE event_id % 3 = 1
"""
