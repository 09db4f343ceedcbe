"""Landing-zone file generator — bench/scale fixture for the §3.1
lifecycle entry (``plans.pipeline.run_all_from_landing``).

The reference's production entry point is: fetchers write the landing
zone (harvested Shotgun card dumps, paged Dice GraphQL JSONL), then the
engine runs scan → dedup → parse cascade → consolidate → snapshot +
preview. Every parse/normalize semantic is oracle-checked on small
golden files; what had NO bench row or scale point through round 13 was
the end-to-end path itself (round-14 verdict #6). This module derives
REAL landing files from the driver's ``events`` table with pure column
expressions — the same derivation discipline as ``operators.fixtures``
(zero RNG, bit-stable across processes) — so the lifecycle can be
benched at any sf and scale-probed at 1×/25×/125×.

Date shifting: ``events.ts`` spans 2024-01-01..2024-01-30 at every sf,
but ``load_dice_events`` applies the reference's 90-day lookback
relative to ``current_date()`` — 2024 dates would all be dropped at the
source today. The generator shifts every event date +6 years (2030: a
fixed interval, NOT wall-clock-derived, so files are deterministic) and
callers pass ``AS_OF_LANDING`` (the same mid-month split point shifted
identically) so the C2 past-date filter keeps/drops the same halves as
the flagship's AS_OF does over the unshifted table.

What the generated files exercise (the full benched parse surface):
- cards: A6 dup harvest (~10% of cards emitted twice), C5 nameless
  skip (~3%), 3-stage datetime cascade (ISO attr / FR free-text
  'ven. 10 oct. 2030 19:30' / missing → C1 drop downstream), B19
  COMPLET status, B6 fr-FR money ('12 345,67 €'), C4 stat-cell
  suffix pick, B17 artist@venue split
- dice: nested GraphQL node shape (B18 first-of-array with ~4% empty
  artist arrays, K3 malformed startDatetime, B21 string ticket counts)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.fixtures import ARTISTS, CITIES, VENUES, _pick, _pick_sql
from .readers import load_table

# AS_OF (2024-01-15) shifted by the same +6 years as the generated dates
AS_OF_LANDING = "2030-01-15"

# month(ts) -> FR abbreviation accepted by the B10 regex cascade
_FR_MON = [
    "janv.", "févr.", "mars", "avr.", "mai", "juin",
    "juil.", "août", "sept.", "oct.", "nov.", "déc.",
]


def _shifted_ts():
    return F.timestamp_add("YEAR", F.lit(6), F.col("ts"))


def _name_cols():
    artist_idx = (F.col("user_id") % 20 + 1).cast("int")
    artist2_idx = ((F.col("user_id") + 7) % 20 + 1).cast("int")
    venue_idx = (F.col("event_id") % 7 + 1).cast("int")
    city_idx = (F.col("event_id") % 5 + 1).cast("int")
    return (
        _pick(ARTISTS, artist_idx),
        _pick(ARTISTS, artist2_idx),
        _pick(VENUES, venue_idx),
        _pick(CITIES, city_idx),
    )


def shotgun_cards_df(events: DataFrame) -> DataFrame:
    """Harvested-card dump rows (sources.shotgun_cards.CARD_SCHEMA
    shape) for the event_id % 3 == 0 slice — the same slice and name
    patterns as ``fixtures.shotgun_events`` so consolidation matches at
    the flagship's density."""
    artist, artist2, venue, city = _name_cols()
    pat = F.col("event_id") % 4
    name = (
        F.when(pat == 0, F.concat(artist, F.lit(" @ "), venue))
        .when(pat == 1, F.concat(artist, F.lit(" feat "), artist2))
        .when(pat == 2, F.concat(artist, F.lit(" x "), artist2))
        .otherwise(artist)
    )
    # C5: ~3% of harvested cards have no extractable title
    name = F.when(F.col("event_id") % 31 == 0, F.lit("   ")).otherwise(name)
    ts6 = _shifted_ts()
    iso = F.date_format(ts6, "yyyy-MM-dd'T'HH:mm:ss")
    fr_text = F.concat(
        F.date_format(ts6, "d"),
        F.lit(" "),
        F.element_at(
            F.array(*[F.lit(m) for m in _FR_MON]), F.month(ts6)
        ),
        F.lit(" "),
        F.date_format(ts6, "yyyy H:mm"),
    )
    # datetime source split: %17 missing entirely (C1 downstream),
    # %11 FR free-text only (stage-3 cascade), else ISO attr (stage 1)
    time_attr = F.when(
        (F.col("event_id") % 17 == 0) | (F.col("event_id") % 11 == 0),
        F.lit(None).cast("string"),
    ).otherwise(iso)
    date_text = F.when(F.col("event_id") % 17 == 0, F.lit("")).otherwise(
        F.when(F.col("event_id") % 11 == 0, fr_text).otherwise(iso)
    )
    card_text = F.concat_ws(
        " ",
        name,
        F.when(F.col("event_id") % 13 == 0, F.lit("— COMPLET —")),
        date_text,
    )
    # fr-FR money: '1,234.57' -> '1 234,57 €' (one-pass char map)
    gross = F.when(
        F.col("event_id") % 7 != 0,
        F.concat(
            F.translate(F.format_number(F.col("value"), 2), ",.", " ,"),
            F.lit(" €"),
        ),
    )
    base = events.filter(F.col("event_id") % 3 == 0).select(
        F.concat(
            F.lit("<div id='sg-"), F.col("event_id"), F.lit("'>"),
            name, F.lit("</div>"),
        ).alias("outer_html"),
        name.alias("name_text"),
        time_attr.alias("time_attr"),
        card_text.alias("card_text"),
        gross.alias("gross_text"),
        F.array(
            (F.col("value").cast("bigint") % 97).cast("string"),
            F.floor("value").cast("bigint").cast("string"),
        ).alias("stat_values"),
        F.array(
            F.lit("vendus aujourd'hui"), F.lit("vendus au total")
        ).alias("stat_suffixes"),
        city.alias("city_text"),
    )
    # A6: ~10% of cards are harvested twice by overlapping selectors
    dupes = base.filter(F.col("outer_html").rlike("sg-\\d*0'"))
    return base.unionAll(dupes)


def dice_nodes_df(events: DataFrame) -> DataFrame:
    """GraphQL node rows (sources.dice_json.DICE_RAW_SCHEMA shape) for
    the event_id % 3 == 1 slice — same patterns as
    ``fixtures.dice_events``."""
    artist, artist2, venue, city = _name_cols()
    pat = F.col("event_id") % 5
    name = (
        F.when(pat == 0, F.upper(artist))
        .when(pat == 1, F.concat(artist, F.lit(" - "), venue))
        .when(pat == 2, F.concat(artist, F.lit(" & "), artist2))
        .when(pat == 3, F.concat(artist, F.lit(" Live")))
        .otherwise(artist)
    )
    ts6 = _shifted_ts()
    start = F.when(
        F.col("event_id") % 19 == 0, F.lit("not-a-date")  # K3 malformed
    ).otherwise(F.date_format(ts6, "yyyy-MM-dd'T'HH:mm:ss'Z'"))
    artists = F.when(
        F.col("event_id") % 23 == 0,
        F.array().cast("array<struct<name:string>>"),  # B18 empty-array
    ).otherwise(F.array(F.struct(artist.alias("name"))))
    return events.filter(F.col("event_id") % 3 == 1).select(
        F.concat(F.lit("dc-"), F.col("event_id")).alias("id"),
        name.alias("name"),
        start.alias("startDatetime"),
        artists.alias("artists"),
        F.array(
            F.struct(
                venue.alias("name"),
                city.alias("city"),
                F.lit("FR").alias("country"),
                F.lit("Europe/Paris").alias("timezoneName"),
            )
        ).alias("venues"),
        F.struct(
            F.floor(F.col("value") / 2).cast("bigint").cast("string")
            .alias("totalCount")
        ).alias("tickets"),
        F.lit("EUR").alias("currency"),
    )


def _name_cols_sql() -> tuple[str, str, str, str]:
    return (
        _pick_sql(ARTISTS, "CAST(user_id % 20 + 1 AS INT)"),
        _pick_sql(ARTISTS, "CAST((user_id + 7) % 20 + 1 AS INT)"),
        _pick_sql(VENUES, "CAST(event_id % 7 + 1 AS INT)"),
        _pick_sql(CITIES, "CAST(event_id % 5 + 1 AS INT)"),
    )


def shotgun_cards_src_sql(events_rel: str = "events") -> str:
    """DuckDB twin of :func:`shotgun_cards_df`: re-derives the card-dump
    rows from the events table in pure SQL (round 15). This makes the
    `pipeline_landing` oracle SELF-CONTAINED — no read of the Spark-side
    generated files, hence no cross-process ordering/race coupling —
    and STRICTER: a generator bug now mismatches the oracle instead of
    being read back identically by both engines. Bit-exactness vs the
    actually-generated JSONL is pinned in tests/test_landing_gen.py
    (zero mismatching rows at derivation, both sf0.001 prototypes)."""
    a, _a2, _v, ci = _name_cols_sql()
    mon = "(CASE month(ts6) " + " ".join(
        f"WHEN {i + 1} THEN '{m}'" for i, m in enumerate(_FR_MON)
    ) + " END)"
    name = f"""(
  CASE WHEN event_id % 31 = 0 THEN '   '
  ELSE CASE event_id % 4
    WHEN 0 THEN {a} || ' @ ' || {_v}
    WHEN 1 THEN {a} || ' feat ' || {_a2}
    WHEN 2 THEN {a} || ' x ' || {_a2}
    ELSE {a}
  END END)"""
    return f"""
WITH ev AS (
  SELECT *, ts + INTERVAL 6 YEAR AS ts6 FROM {events_rel}
  WHERE event_id % 3 = 0
),
base AS (
  SELECT
    '<div id=''sg-' || CAST(event_id AS VARCHAR) || '''>' || {name}
      || '</div>' AS outer_html,
    {name} AS name_text,
    CASE WHEN event_id % 17 = 0 OR event_id % 11 = 0 THEN NULL
         ELSE strftime(ts6, '%Y-%m-%dT%H:%M:%S') END AS time_attr,
    concat_ws(' ', {name},
      CASE WHEN event_id % 13 = 0 THEN '— COMPLET —' END,
      CASE WHEN event_id % 17 = 0 THEN ''
           WHEN event_id % 11 = 0 THEN
             strftime(ts6, '%-d') || ' ' || {mon} || ' '
               || strftime(ts6, '%Y %-H:%M')
           ELSE strftime(ts6, '%Y-%m-%dT%H:%M:%S') END) AS card_text,
    CASE WHEN event_id % 7 <> 0
         THEN translate(printf('%.2f', value), ',.', ' ,') || ' €'
    END AS gross_text,
    [CAST(CAST(trunc(value) AS BIGINT) % 97 AS VARCHAR),
     CAST(CAST(floor(value) AS BIGINT) AS VARCHAR)] AS stat_values,
    ['vendus aujourd''hui', 'vendus au total'] AS stat_suffixes,
    {ci} AS city_text
  FROM ev
)
SELECT * FROM base
UNION ALL
SELECT * FROM base WHERE regexp_matches(outer_html, 'sg-\\d*0''')
"""


def dice_nodes_src_sql(events_rel: str = "events") -> str:
    """DuckDB twin of :func:`dice_nodes_df` (see
    :func:`shotgun_cards_src_sql` for why the derivation form exists)."""
    a, a2, v, ci = _name_cols_sql()
    name = f"""(CASE event_id % 5
    WHEN 0 THEN upper({a})
    WHEN 1 THEN {a} || ' - ' || {v}
    WHEN 2 THEN {a} || ' & ' || {a2}
    WHEN 3 THEN {a} || ' Live'
    ELSE {a} END)"""
    return f"""
SELECT
  'dc-' || CAST(event_id AS VARCHAR) AS id,
  {name} AS name,
  CASE WHEN event_id % 19 = 0 THEN 'not-a-date'
       ELSE strftime(ts + INTERVAL 6 YEAR, '%Y-%m-%dT%H:%M:%SZ')
  END AS startDatetime,
  CASE WHEN event_id % 23 = 0 THEN []::STRUCT(name VARCHAR)[]
       ELSE [{{'name': {a}}}] END AS artists,
  [{{'name': {v}, 'city': {ci}, 'country': 'FR',
     'timezoneName': 'Europe/Paris'}}] AS venues,
  {{'totalCount': CAST(CAST(floor(value / 2) AS BIGINT) AS VARCHAR)}}
    AS tickets,
  'EUR' AS currency
FROM {events_rel} WHERE event_id % 3 = 1
"""


def generate_landing(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> tuple[str, str]:
    """Write (cards_jsonl_dir, dice_jsonl_dir) under out_dir. JSONL via
    the JSON sink — both loaders read directories of part files, which
    is exactly how a sharded landing zone arrives at scale."""
    events = load_table(spark, sf_dir, "events")
    cards_path = f"{out_dir}/cards_jsonl"
    dice_path = f"{out_dir}/dice_jsonl"
    shotgun_cards_df(events).write.mode("overwrite").json(cards_path)
    dice_nodes_df(events).write.mode("overwrite").json(dice_path)
    return cards_path, dice_path
