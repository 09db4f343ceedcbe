"""Dump-on-mismatch capture hook (round-10 verdict #2a).

The one unreproduced IVF hash mismatch taught the expensive lesson: a
mismatch whose rows are not captured before the rerun is a lost event.
``tools/verify_local.dump_mismatch`` writes both engines' full canonical
row sets + the symmetric diff to a file BEFORE the verdict returns;
these tests force a mismatch through the hook and check the artifact.
"""

from __future__ import annotations

import importlib.util
import os
import sys


def _verify_mod():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "verify_local.py",
    )
    spec = importlib.util.spec_from_file_location("verify_local_mod", path)
    mod = importlib.util.module_from_spec(spec)
    # verify_local reads sys.argv at import; pin a clean one
    argv, sys.argv = sys.argv, ["verify_local.py"]
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.argv = argv
    return mod


def test_dump_mismatch_writes_full_capture(tmp_path):
    V = _verify_mod()
    V.DUMP_DIR = str(tmp_path / "captures")
    slines = ["a\x011", "b\x012", "spark_extra\x013"]
    olines = ["a\x011", "b\x012", "duck_extra\x019"]
    path = V.dump_mismatch("forced_query", "/root/testdata/sf0.001",
                           slines, olines)
    assert os.path.exists(path)
    body = open(path).read()
    # the symmetric diff names exactly the divergent rows
    assert "spark_extra\x013" in body
    assert "duck_extra\x019" in body
    # BOTH full row sets are present (a diff alone can't answer
    # "was the row missing or merely different?")
    assert body.count("a\x011") >= 2
    assert "spark-only: 1" in body and "duck-only: 1" in body
    assert "forced_query" in body


def test_dump_mismatch_survives_rerun(tmp_path):
    """Two captures of the same query must not clobber each other —
    the flake scenario is exactly 'mismatch, then rerun'."""
    import time

    V = _verify_mod()
    V.DUMP_DIR = str(tmp_path / "captures")
    p1 = V.dump_mismatch("q", "sf", ["x"], ["y"])
    time.sleep(1.1)  # filename granularity is 1 s
    p2 = V.dump_mismatch("q", "sf", ["x2"], ["y2"])
    assert p1 != p2
    assert os.path.exists(p1) and os.path.exists(p2)
