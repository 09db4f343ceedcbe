"""Config-robustness gate: oracle parity under a DEFAULT SparkSession.

The driver's correctness run uses a plain ``SparkSession.builder
.getOrCreate()`` — none of ``session.py``'s configs (UTC session
timezone, nanosAsLong, AQE, broadcast threshold). Round 1's
f4_user_sessions passed the tuned local verifier but failed the driver:
its float epoch arithmetic was config-dependent. This test re-runs every
timestamp-touching registry query under a plain session (subprocess —
a second differently-configured session can't coexist in the test JVM)
and fails if any diverges from its DuckDB oracle.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

# Every registry query whose result depends on timestamp/date semantics
# (parse, format, arithmetic, windowing, day-bucketing).
TS_QUERIES = [
    "fixture_shotgun_events",
    "fixture_dice_events",
    "consolidate_flagship",
    "f4_user_sessions",
    "f5_session_windows_native",
    "b_event_scalar_suite",
    "b10_fr_datetime_cascade",
    "b_dc_scalar_suite",
    "b_sg_scalar_suite",
    "d9_asof_purchase_state",
    "d5d6_legacy_candidates",
    "d8_legacy_merge",
    "e3_events_daily_stats",
    # e7_daily_distinct_users rotated out of the window in round 13
    # (rotation #10); its daily-bucketing timestamp semantics are the
    # same to_date(ts) path e3 above pins under the plain session
    "f3_event_lag_lead",
]


def test_timestamp_queries_pass_oracle_under_plain_session():
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_VERIFY_SESSION", None)  # plain is the default
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "verify_local.py"),
         SF_DIR, *TS_QUERIES],
        capture_output=True,
        text=True,
        timeout=900,
        env=env,
        cwd=REPO,
    )
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, (
        f"plain-session oracle mismatch:\n{tail}\n{proc.stderr[-2000:]}"
    )
    assert f"{len(TS_QUERIES)}/{len(TS_QUERIES)} queries pass" in proc.stdout, tail
