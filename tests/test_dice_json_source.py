"""Dice landed-JSONL source: nested schema scan + normalization parity
with the reference's _build_normalized (dice.py:112-156)."""

from __future__ import annotations

import json

from concerts_etl_sa_spark.sources.dice_json import (
    load_dice_events,
    normalize_dice,
    read_dice_jsonl,
)

NODES = [
    {
        "id": "dc-1",
        "name": "  Angèle  ",
        "startDatetime": "2030-03-01T20:30:00Z",
        "artists": [{"name": " Angèle "}, {"name": "Support Act"}],
        "venues": [
            {
                "name": " Olympia ",
                "city": " Paris ",
                "country": "FR",
                "timezoneName": "Europe/Paris",
            }
        ],
        "tickets": {"totalCount": "1234"},
        "currency": " EUR ",
    },
    {  # degenerate node: empty arrays, malformed datetime + count
        "id": "dc-2",
        "name": "Mystery Show",
        "startDatetime": "not-a-date",
        "artists": [],
        "venues": [],
        "tickets": {"totalCount": "soon"},
        "currency": None,
    },
]


def _write_jsonl(tmp_path):
    p = tmp_path / "dice.jsonl"
    p.write_text("\n".join(json.dumps(n) for n in NODES))
    return str(p)


def test_nested_scan_and_normalize(spark, tmp_path):
    raw = read_dice_jsonl(spark, _write_jsonl(tmp_path))
    assert raw.schema["artists"].dataType.simpleString() == "array<struct<name:string>>"
    rows = {r["event_id_provider"]: r for r in normalize_dice(raw).collect()}

    r1 = rows["dc-1"]
    assert r1["event_name"] == "Angèle"
    assert r1["artist_name"] == "Angèle"           # B18 first-of-array, trimmed
    assert r1["venue_name"] == "Olympia"
    assert r1["city"] == "Paris"
    assert r1["timezone"] == "Europe/Paris"
    assert r1["tickets_sold_total"] == 1234         # B21 safe cast
    assert r1["currency"] == "EUR"                  # B22 trim
    assert r1["event_datetime_local"].year == 2030  # B12 Z-suffix parse
    assert r1["provider"] == "dice" and r1["status"] == "on sale"

    r2 = rows["dc-2"]
    assert r2["event_datetime_local"] is None       # K3: malformed -> null
    assert r2["tickets_sold_total"] is None
    assert r2["artist_name"] == "Mystery Show"      # fallback to event name
    assert r2["venue_name"] is None and r2["city"] is None
    assert r2["currency"] == "EUR"                  # B26 default


def test_lookback_filter(spark, tmp_path):
    out = load_dice_events(spark, _write_jsonl(tmp_path), lookback_days=90)
    ids = {r["event_id_provider"] for r in out.collect()}
    # dc-1 is in 2030 (future: kept); dc-2 undated (kept per reference —
    # the null-date drop happens at consolidation, C1, not at the source)
    assert ids == {"dc-1", "dc-2"}
