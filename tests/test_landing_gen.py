"""Landing-zone generator + §3.1 lifecycle bench row (round-14 verdict
#6): the generated card-dump / dice JSONL must exercise the full parse
surface and the end-to-end run must consolidate with all three leg
types, deterministically."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from concerts_etl_sa_spark.sources.landing_gen import (
    AS_OF_LANDING,
    dice_nodes_df,
    generate_landing,
    shotgun_cards_df,
)
from concerts_etl_sa_spark.sources.readers import load_table

from .conftest import SF_DIR


def _events(spark):
    return load_table(spark, SF_DIR, "events")


def test_cards_exercise_dedup_and_cascade(spark):
    from concerts_etl_sa_spark.sources.shotgun_cards import (
        dedup_cards,
        normalize_shotgun,
    )

    cards = shotgun_cards_df(_events(spark))
    n_raw = cards.count()
    n_distinct = cards.select("outer_html").distinct().count()
    assert n_raw > n_distinct  # A6 dup harvest present (~10%)
    deduped = dedup_cards(cards)
    assert deduped.count() == n_distinct

    out = normalize_shotgun(deduped)
    # C5: nameless cards dropped
    assert out.count() < n_distinct
    # the three datetime regimes all occur: ISO attr rows, FR free-text
    # rows (parsed by the stage-3 cascade), and missing (null -> C1)
    parsed = out.filter(F.col("event_datetime_local").isNotNull()).count()
    nulls = out.filter(F.col("event_datetime_local").isNull()).count()
    assert parsed > 0 and nulls > 0
    # FR cascade actually FIRES (not merely: FR-formatted input rows
    # exist): normalize ONLY the no-time_attr FR-text slice and require
    # parsed datetimes — a generator/parser format drift that nulled
    # every stage-3 parse would otherwise hide behind the ISO rows
    # (round-14 review finding)
    fr_slice = deduped.filter(
        F.col("time_attr").isNull() & (F.trim("name_text") != "")
        & (F.col("card_text").rlike(r"\d{4} \d{1,2}:\d{2}"))
    )
    assert fr_slice.count() > 0
    fr_parsed = (
        normalize_shotgun(fr_slice)
        .filter(F.col("event_datetime_local").isNotNull())
        .count()
    )
    assert fr_parsed == fr_slice.count()  # every FR row parses
    # money + stats + status parse
    assert out.filter(F.col("gross_total").isNotNull()).count() > 0
    assert out.filter(F.col("tickets_sold_total").isNotNull()).count() > 0
    assert out.filter(F.col("status") == "sold out").count() > 0
    # dates landed in the shifted window (2030), not 2024
    assert (
        out.filter(F.year("event_datetime_local") == 2030).count() == parsed
    )


def test_dice_nodes_exercise_b18_and_k3(spark):
    from concerts_etl_sa_spark.sources.dice_json import normalize_dice

    nodes = dice_nodes_df(_events(spark))
    out = normalize_dice(nodes)
    # K3: malformed startDatetime -> null, row survives
    assert out.filter(F.col("event_datetime_local").isNull()).count() > 0
    # B18: empty artist arrays fall back to the event name
    empty_artists = nodes.filter(F.size("artists") == 0).count()
    assert empty_artists > 0
    assert out.filter(F.col("tickets_sold_total").isNotNull()).count() > 0


def test_lifecycle_consolidates_all_three_legs(spark, tmp_path):
    from concerts_etl_sa_spark.plans.pipeline import run_all_from_landing

    cards, dice = generate_landing(spark, SF_DIR, str(tmp_path / "landing"))
    # wide dice lookback: fixture dates are pinned at 2030, and the
    # test's shape must not depend on the wall clock (same contract as
    # bench.LANDING_LOOKBACK_DAYS)
    res = run_all_from_landing(
        spark, cards, dice, str(tmp_path / "out"), as_of=AS_OF_LANDING,
        dice_lookback_days=36500,
    )
    assert res.shotgun_count > 0 and res.dice_count > 0
    assert res.consolidated_count > 0
    legs = res.consolidated.select(
        F.count(
            F.when(
                F.col("shotgun_event_id").isNotNull()
                & F.col("dice_event_id").isNotNull(),
                1,
            )
        ).alias("matched"),
        F.count(
            F.when(
                F.col("shotgun_event_id").isNotNull()
                & F.col("dice_event_id").isNull(),
                1,
            )
        ).alias("sg_only"),
        F.count(F.when(F.col("shotgun_event_id").isNull(), 1)).alias(
            "dc_only"
        ),
    ).collect()[0]
    assert legs["matched"] > 0 and legs["sg_only"] > 0 and legs["dc_only"] > 0
    # the snapshot + preview sinks landed
    snap = spark.read.parquet(str(tmp_path / "out" / "consolidated"))
    assert snap.count() == res.consolidated_count
    res.consolidated.unpersist()


def test_generation_is_deterministic(spark, tmp_path):
    """Two generations produce byte-identical JSONL content (zero RNG —
    the fixtures-module discipline), so bench marks are comparable
    across processes and rounds."""

    def _lines(base):
        cards, dice = generate_landing(spark, SF_DIR, base)
        out = []
        for d in (cards, dice):
            body = []
            for f in glob.glob(f"{d}/part-*"):
                with open(f) as fh:
                    body.extend(fh.read().splitlines())
            out.append(sorted(body))
        return out

    a = _lines(str(tmp_path / "g1"))
    b = _lines(str(tmp_path / "g2"))
    assert a == b
    assert sum(len(x) for x in a) > 0


def test_derivation_sql_matches_generated_files(spark, tmp_path):
    """Generator↔derivation LOCKSTEP (round-15 final oracle form): the
    pure-SQL re-derivations (`shotgun_cards_src_sql` /
    `dice_nodes_src_sql`) that the self-contained pipeline_landing
    oracle consumes must be BIT-EXACT with the JSONL the Spark
    generator actually writes — every column including gross_text and
    the duplicate-harvest union. A drift here means the window oracle
    is checking a different corpus than the engine reads. Also pins the
    no-thousands-grouping regime the derivation's printf money format
    assumes (events.value < 1000 at every sf; DuckDB's fmt cannot
    group floats, so a >=1000 value would need a manual grouping
    expression)."""
    import duckdb

    from concerts_etl_sa_spark.sources.dice_json import dice_landing_sql
    from concerts_etl_sa_spark.sources.landing_gen import (
        dice_nodes_src_sql,
        shotgun_cards_src_sql,
    )
    from concerts_etl_sa_spark.sources.shotgun_cards import (
        shotgun_landing_sql,
    )

    cards, dice = generate_landing(spark, SF_DIR, str(tmp_path / "landing"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    assert con.execute(
        "SELECT max(value) FROM events"
    ).fetchone()[0] < 1000  # printf money-format regime guard

    card_cols = (
        "{outer_html:'VARCHAR', name_text:'VARCHAR', time_attr:'VARCHAR',"
        " card_text:'VARCHAR', gross_text:'VARCHAR',"
        " stat_values:'VARCHAR[]', stat_suffixes:'VARCHAR[]',"
        " city_text:'VARCHAR'}"
    )
    files = sorted(map(repr, con.execute(
        f"SELECT * FROM read_json('{cards}/*.json',"
        f" format='newline_delimited', columns={card_cols})"
    ).fetchall()))
    derived = sorted(map(repr, con.execute(shotgun_cards_src_sql()).fetchall()))
    assert files == derived

    dice_cols = (
        "{id:'VARCHAR', name:'VARCHAR', startDatetime:'VARCHAR',"
        " artists:'STRUCT(name VARCHAR)[]',"
        " venues:'STRUCT(name VARCHAR, city VARCHAR, country VARCHAR,"
        " timezoneName VARCHAR)[]',"
        " tickets:'STRUCT(totalCount VARCHAR)', currency:'VARCHAR'}"
    )
    files = sorted(map(repr, con.execute(
        f"SELECT * FROM read_json('{dice}/*.json',"
        f" format='newline_delimited', columns={dice_cols})"
    ).fetchall()))
    derived = sorted(map(repr, con.execute(dice_nodes_src_sql()).fetchall()))
    assert files == derived

    # and the PARSE twins agree across source forms: file-reading vs
    # derivation-fed produce identical normalized relations
    a = sorted(map(repr, con.execute(shotgun_landing_sql(cards)).fetchall()))
    from concerts_etl_sa_spark.sources.shotgun_cards import (
        shotgun_landing_parse_sql,
    )
    b = sorted(map(repr, con.execute(
        shotgun_landing_parse_sql(shotgun_cards_src_sql())
    ).fetchall()))
    assert a == b
    from concerts_etl_sa_spark.sources.dice_json import (
        dice_landing_parse_sql,
    )
    a = sorted(map(repr, con.execute(dice_landing_sql(dice)).fetchall()))
    b = sorted(map(repr, con.execute(
        dice_landing_parse_sql(dice_nodes_src_sql())
    ).fetchall()))
    assert a == b
