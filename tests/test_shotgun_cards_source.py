"""Shotgun harvested-card source: dedup + full parser cascade parity
with the reference's per-card loop (shotgun.py:276-463)."""

from __future__ import annotations

import json

from concerts_etl_sa_spark.sources.shotgun_cards import (
    dedup_cards,
    load_shotgun_events,
    read_cards_jsonl,
)

CARDS = [
    {   # full card: ISO time attr, artist @ venue, money, stats with C4
        "outer_html": "<div id='c1'>Angèle @ Olympia</div>",
        "name_text": "  Angèle   @  Olympia ",
        "time_attr": "2025-10-10T19:30:00",
        "card_text": "Angèle @ Olympia ven. 10 oct. 2025 19:30",
        "gross_text": "12 345,67 €",
        "stat_values": ["12", "845"],
        "stat_suffixes": ["vendus aujourd'hui", "vendus au total"],
        "city_text": " Paris ",
    },
    {   # duplicate DOM node harvested by a second selector (A6)
        "outer_html": "<div id='c1'>Angèle @ Olympia</div>",
        "name_text": "  Angèle   @  Olympia ",
        "time_attr": "2025-10-10T19:30:00",
        "card_text": "Angèle @ Olympia ven. 10 oct. 2025 19:30",
        "gross_text": "12 345,67 €",
        "stat_values": ["12", "845"],
        "stat_suffixes": ["vendus aujourd'hui", "vendus au total"],
        "city_text": " Paris ",
    },
    {   # no time attr: FR free-text date cascade; COMPLET status
        "outer_html": "<div id='c2'>Justice</div>",
        "name_text": "Justice",
        "time_attr": None,
        "card_text": "Justice — COMPLET — sam. 1 févr. 2025 21:00",
        "gross_text": None,
        "stat_values": ["1200 billets", "1 200 billets"],
        "stat_suffixes": ["vendus au total", "vendus au total bis"],
        "city_text": "Lyon",
    },
    {   # nameless card: dropped (C5)
        "outer_html": "<div id='c3'></div>",
        "name_text": "   ",
        "time_attr": None,
        "card_text": "placeholder",
        "gross_text": None,
        "stat_values": [],
        "stat_suffixes": [],
        "city_text": None,
    },
]


def _write(tmp_path):
    p = tmp_path / "cards.jsonl"
    p.write_text("\n".join(json.dumps(c) for c in CARDS))
    return str(p)


def test_dedup_and_parse_cascade(spark, tmp_path):
    path = _write(tmp_path)
    assert read_cards_jsonl(spark, path).count() == 4
    assert dedup_cards(read_cards_jsonl(spark, path)).count() == 3  # A6

    rows = {r["event_name"]: r for r in load_shotgun_events(spark, path).collect()}
    assert set(rows) == {"Angèle @ Olympia", "Justice"}  # C5 dropped blank

    a = rows["Angèle @ Olympia"]
    assert a["artist_name"] == "Angèle"                 # B17 split
    assert a["venue_name"] == "Olympia"
    assert a["event_datetime_local"].isoformat() == "2025-10-10T19:30:00"
    assert float(a["gross_total"]) == 12345.67          # B6 fr-FR money
    # §7.3.5: money is DecimalType(18,2) AT REST on the landing path
    assert dict(load_shotgun_events(spark, path).dtypes)["gross_total"] == (
        "decimal(18,2)"
    )
    assert a["tickets_sold_total"] == 845               # C4 skips 'aujourd'
    assert a["status"] == "on sale"
    assert a["city"] == "Paris"
    assert a["event_id_provider"].startswith("angele-olympia-")  # B9 slug id

    j = rows["Justice"]
    assert j["event_datetime_local"].isoformat() == "2025-02-01T21:00:00"  # B10 FR
    assert j["status"] == "sold out"                    # B19 COMPLET
    # B7: first digit RUN, exactly like the reference — a thousands space
    # splits the run ('1 200' -> 1), so the fixture uses the unspaced form
    assert j["tickets_sold_total"] == 1200


def test_stable_id_deterministic(spark, tmp_path):
    path = _write(tmp_path)
    a = {r["event_name"]: r["event_id_provider"]
         for r in load_shotgun_events(spark, path).collect()}
    b = {r["event_name"]: r["event_id_provider"]
         for r in load_shotgun_events(spark, path).collect()}
    assert a == b
