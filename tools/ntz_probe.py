"""TimestampNTZ migration probe (round-15 → round-16 handoff).

Measures how much of the plain-session host-timezone fragility
(BASELINE.md round-15: 40/50 under TZ=Europe/Paris) the NTZ schema
migration fixes BY ITSELF: swaps every TimestampType in
TESTDATA_SCHEMAS to TimestampNTZType in-process, then runs the
historically tz-failing rows against the DuckDB oracle under whatever
TZ the caller exports.

Round-15 measurement (TZ=Europe/Paris, sf0.001): the swap alone fixes
9 of the 10 failing rows (fixtures, flagship, d9, e3, f5, b10, b_sg —
plus pipeline_landing stays green). The two residues, localized:

- d8_legacy_merge — `functions.dates.round5` builds the 5-minute grid
  via unix_timestamp → timestamp_seconds, and timestamp_seconds
  returns session-tz TimestampType (an LTZ island inside an NTZ plan);
- b_event_scalar_suite — same round5 column plus the B12 Z-suffix
  parse (try_to_timestamp on a 'Z' string converts to session tz; the
  twin's try_cast keeps naive — the dice_landing_sql fix pattern
  applies).

Round-16 plan: swap the schema types, make round5 NTZ-closed
(e.g. ts + make_interval arithmetic, or cast the rebuilt timestamp
back to NTZ), apply the TIMESTAMPTZ-downcast device to the remaining
Z-parse twins, then re-verify 50/50 at three sfs under BOTH UTC and a
non-UTC TZ, plus the streaming suite (watermarks accept NTZ since
Spark 3.4 — confirm on 4.1).

Usage: TZ=Europe/Paris python tools/ntz_probe.py [sf_dir]
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import math
import sys

sys.path.insert(0, "/root/repo")

TARGETS = [
    "fixture_shotgun_events", "fixture_dice_events", "consolidate_flagship",
    "d8_legacy_merge", "d9_asof_purchase_state", "e3_events_daily_stats",
    "f5_session_windows_native", "b10_fr_datetime_cascade",
    "b_event_scalar_suite", "b_sg_scalar_suite", "pipeline_landing",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(round(v, 9))
    if isinstance(v, _dec.Decimal):
        return repr(round(float(v), 9))
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def main() -> int:
    from pyspark.sql import types as T

    from concerts_etl_sa_spark import schemas as SCH

    def ntzify(st):
        return T.StructType([
            T.StructField(
                f.name,
                T.TimestampNTZType()
                if isinstance(f.dataType, T.TimestampType)
                else f.dataType,
                f.nullable,
            )
            for f in st.fields
        ])

    for k in list(SCH.TESTDATA_SCHEMAS):
        SCH.TESTDATA_SCHEMAS[k] = ntzify(SCH.TESTDATA_SCHEMAS[k])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.ui.enabled", "false")
        .appName("ntz_probe")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    fails = 0
    for name in TARGETS:
        try:
            sdf = qs[name](spark, sf)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            spark.catalog.clearCache()
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            is_ = sorted(range(len(scols)), key=lambda i: scols[i])
            io_ = sorted(range(len(ocols)), key=lambda i: ocols[i])
            sl = sorted("\x01".join(canon(r[i]) for i in is_) for r in srows)
            ol = sorted("\x01".join(canon(r[i]) for i in io_) for r in orows)
            ok = sorted(scols) == sorted(ocols) and sl == ol
            print(f"{name}: {'PASS' if ok else 'FAIL'} rows {len(sl)}/{len(ol)}")
            fails += 0 if ok else 1
        except Exception as ex:  # noqa: BLE001 — probe reports, not raises
            print(f"{name}: ERROR {str(ex)[:160]}")
            fails += 1
    print(f"{len(TARGETS) - fails}/{len(TARGETS)} pass with NTZ schemas")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
