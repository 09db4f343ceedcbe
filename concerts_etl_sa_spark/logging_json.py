"""JSON structured logging (SURVEY §2.K4).

Reference: concerts_etl/core/logging.py:3-11 emits ts/level/logger/msg
JSON lines. The engine analog: ``log_json`` for driver-side messages and
``timed_action`` wrapping any DataFrame action with a completed/failed
JSON line (duration + row count). PySpark 4 exposes no Python
QueryExecutionListener; for executor/JVM-side logs the production knob is
a log4j2 JSON layout — this module covers the driver lifecycle the
reference logged.
"""

from __future__ import annotations

import json
import sys
import time
from contextlib import contextmanager


def log_json(level: str, msg: str, **fields) -> None:
    rec = {
        "ts": time.time(),
        "level": level,
        "logger": "concerts_etl_sa_spark",
        "msg": msg,
        **fields,
    }
    print(json.dumps(rec, default=str), file=sys.stderr)


@contextmanager
def timed_action(name: str, **fields):
    """K4: one JSON line per completed/failed pipeline action."""
    t0 = time.time()
    try:
        yield
    except Exception as exc:
        log_json(
            "error", "action failed", action=name,
            duration_ms=round((time.time() - t0) * 1000, 1),
            error=str(exc)[:500], **fields,
        )
        raise
    log_json(
        "info", "action completed", action=name,
        duration_ms=round((time.time() - t0) * 1000, 1), **fields,
    )
