"""Golden end-to-end test of the flagship consolidation (SURVEY §5.2.2).

Hand-built provider rows exercising the FIXTURES.md §B edge cases against
a hand-verified expected output: accent folding, multi-artist separators,
argmax + tie-break, 1:1 constraint, residual legs, null-date/past-date
filters.
"""

from __future__ import annotations

import datetime as dt

import pytest

from concerts_etl_sa_spark.operators.consolidate import consolidate
from concerts_etl_sa_spark.schemas import NORMALIZED_EVENT


def _ev(pid, name, when, artist=None, venue=None, city=None, tickets=None):
    provider = "shotgun" if pid.startswith("sg") else "dice"
    return (
        provider, pid, name, city, None,
        when, "Europe/Paris", "on sale", tickets, None, None, "EUR", None,
        dt.datetime(2024, 1, 1, 6, 0, 0), "run-1", artist, venue,
    )


D = dt.datetime
AS_OF = "2024-01-10"


@pytest.fixture(scope="module")
def result(spark):
    sg_rows = [
        # matches dc-1 by token overlap on the same day (accent-folded)
        _ev("sg-1", "Angèle @ Olympia", D(2024, 1, 15, 20, 0), artist="Angèle",
            venue="Olympia", tickets=100),
        # two dice rows same day compete for this one -> 1:1 keeps best
        _ev("sg-2", "Stromae feat Camille", D(2024, 1, 16, 21, 0),
            artist="Stromae", city="Lyon", tickets=50),
        # no dice counterpart -> SG residual
        _ev("sg-3", "Justice", D(2024, 1, 17, 22, 0), artist="Justice",
            city="Paris", tickets=75),
        # null date -> excluded entirely (C1)
        _ev("sg-4", "Phoenix", None, artist="Phoenix", tickets=10),
        # past date -> filtered (C2, as_of=2024-01-10)
        _ev("sg-5", "Vitalic", D(2024, 1, 5, 20, 0), artist="Vitalic",
            tickets=20),
    ]
    dc_rows = [
        # ANGELE uppercase matches sg-1 (accents + case fold)
        _ev("dc-1", "ANGELE", D(2024, 1, 15, 19, 30), artist="Angèle",
            tickets=80),
        # overlap 1 ('stromae') with sg-2 — loses to dc-3 (overlap 2)
        _ev("dc-2", "Stromae Live", D(2024, 1, 16, 20, 0), artist="Stromae",
            tickets=30),
        # overlap 2 ('stromae','camille') with sg-2 — wins
        _ev("dc-3", "Stromae x Camille", D(2024, 1, 16, 21, 0),
            artist="Stromae", tickets=40),
        # no sg counterpart -> DICE residual
        _ev("dc-4", "Aya Nakamura", D(2024, 1, 18, 20, 0),
            artist="Aya Nakamura", city="Lille", tickets=60),
    ]
    return sg_rows, dc_rows


def _run(spark, sg_rows, dc_rows):
    sg = spark.createDataFrame(sg_rows, NORMALIZED_EVENT)
    dc = spark.createDataFrame(dc_rows, NORMALIZED_EVENT)
    rows = consolidate(sg, dc, as_of=AS_OF).collect()
    return {
        (r.shotgun_event_id, r.dice_event_id): r for r in rows
    }, rows


def test_golden_consolidation(spark, result):
    sg_rows, dc_rows = result
    by_pair, rows = _run(spark, sg_rows, dc_rows)

    # matched: sg-1 x dc-1 (accent/case fold), sg-2 x dc-3 (argmax overlap 2)
    assert ("sg-1", "dc-1") in by_pair
    assert ("sg-2", "dc-3") in by_pair
    m = by_pair[("sg-1", "dc-1")]
    assert m.event_name == "Angèle @ Olympia"  # SG name preferred
    assert m.venue == "Olympia"
    assert m.shotgun_tickets_sold == 100 and m.dice_tickets_sold == 80

    # 1:1: dc-2 lost the argmax -> DICE residual
    assert (None, "dc-2") in by_pair
    # residual legs
    assert ("sg-3", None) in by_pair
    assert (None, "dc-4") in by_pair
    aya = by_pair[(None, "dc-4")]
    assert aya.venue == "Lille"  # venue falls back to city

    # sg-4 (null date) and sg-5 (past) absent everywhere
    ids = {r.shotgun_event_id for r in rows} | {r.dice_event_id for r in rows}
    assert "sg-4" not in ids and "sg-5" not in ids

    assert len(rows) == 5


def test_consolidation_is_order_independent(spark, result):
    sg_rows, dc_rows = result
    _, rows1 = _run(spark, sg_rows, dc_rows)
    _, rows2 = _run(spark, list(reversed(sg_rows)), list(reversed(dc_rows)))
    key = lambda r: (r.event_datetime_local, r.event_name, str(r.shotgun_event_id))
    assert sorted(map(tuple, rows1)) == sorted(map(tuple, rows2))


def test_output_sorted_by_date_then_name(spark, result):
    sg_rows, dc_rows = result
    _, rows = _run(spark, sg_rows, dc_rows)
    keys = [(r.event_datetime_local, r.event_name.lower()) for r in rows]
    assert keys == sorted(keys)


def test_df_cap_drops_heavy_hitter_tokens(spark, result):
    """A token whose per-day document frequency exceeds df_cap must not
    generate candidate pairs on its own (the O(df²) skew guard); rare
    tokens keep matching unchanged."""
    sg_rows, dc_rows = result
    # 4 sg + 4 dc rows on one day sharing ONLY the hot token 'toulouse'
    day = D(2024, 1, 20, 20, 0)
    hot_sg = [
        _ev(f"sg-h{i}", f"Toulouse night {i}", day, artist=f"Uniq{i}")
        for i in range(4)
    ]
    hot_dc = [
        _ev(f"dc-h{i}", f"Toulouse club {i}", day, artist=f"Other{i}")
        for i in range(4)
    ]
    from concerts_etl_sa_spark.schemas import NORMALIZED_EVENT as S

    sg = spark.createDataFrame(sg_rows + hot_sg, S)
    dc = spark.createDataFrame(dc_rows + hot_dc, S)

    capped = consolidate(sg, dc, as_of=AS_OF, df_cap=3).collect()
    # every hot-day row surfaces as a residual, never as a matched pair
    hot_pairs = [
        r for r in capped
        if (r.shotgun_event_id or "").startswith("sg-h")
        and r.dice_event_id is not None
    ]
    assert hot_pairs == []
    # the golden matches elsewhere are untouched by the cap
    pairs = {
        (r.shotgun_event_id, r.dice_event_id)
        for r in capped
        if r.shotgun_event_id and r.dice_event_id
    }
    assert ("sg-1", "dc-1") in pairs and ("sg-2", "dc-3") in pairs

    # with the default (high) cap the same input DOES match hot-day rows
    # on the shared token — proving the cap, not the data, removed them
    uncapped = consolidate(sg, dc, as_of=AS_OF).collect()
    assert any(
        (r.shotgun_event_id or "").startswith("sg-h") and r.dice_event_id
        for r in uncapped
    )
