"""Fault-injection for the staged-promote swap (round-14 verdict #5).

The existing crash-window tests RECONSTRUCT the post-crash directory
state by hand (rename/copytree) and check recovery; none of them kills
the writer INSIDE ``promote_staged`` between its two renames. Here a
proxy filesystem raises from the second rename call — the exception
propagates out of ``promote_staged`` exactly like a process death at
that point (no rollback code runs) — and the assertions pin that:

- the crash window leaves live missing, the original staged aside in
  __old and the new generation still in staging (the invariant every
  recovery path relies on);
- ``recover_promote`` default policy serves the ORIGINAL generation
  (staging is scratch for the snapshot sinks);
- ``recover_promote(prefer_staged=True)`` serves the STAGED generation
  (the backfill policy: staging was verified before the swap began);
- a re-run of the full promote after recovery converges to the new
  generation with no leftover dirs;
- with a fence ``marker``, the marker survives the crash window (the
  fence holds exactly while the live dir is missing).

Reference anchor: the reference's idempotence strategy is
clear+rewrite on a Sheets worksheet (core/gsheet.py:114-117); the
staged swap is its scale-safe filesystem equivalent, so the crash
window between the renames is the one place its exactly-once story
could silently break.
"""

from __future__ import annotations

import os

import pytest

from concerts_etl_sa_spark.streaming import _fs


def _mkgen(path: str, gen: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-00000.txt"), "w") as f:
        f.write(gen)


def _gen(path: str) -> str:
    with open(os.path.join(path, "part-00000.txt")) as f:
        return f.read()


class _CrashOnRename:
    """Py4j-fs proxy whose Nth rename() call dies before acting —
    everything else delegates to the real Hadoop filesystem."""

    def __init__(self, real, crash_at: int):
        self._real = real
        self._calls = 0
        self._crash_at = crash_at

    def rename(self, src, dst):
        self._calls += 1
        if self._calls == self._crash_at:
            raise RuntimeError("injected crash: writer died mid-swap")
        return self._real.rename(src, dst)

    def __getattr__(self, name):
        return getattr(self._real, name)


@pytest.fixture
def crash_second_rename(monkeypatch):
    """Arm the injector: the next promote_staged's SECOND rename (the
    staging->live promote; the first is live->old) kills the writer."""
    real = _fs._fs_and_paths

    def wrapped(spark, live_dir, staging_suffix="__staging",
                old_suffix="__old"):
        fs, p_live, p_staging, p_old = real(
            spark, live_dir, staging_suffix, old_suffix
        )
        return _CrashOnRename(fs, 2), p_live, p_staging, p_old

    monkeypatch.setattr(_fs, "_fs_and_paths", wrapped)
    yield
    monkeypatch.setattr(_fs, "_fs_and_paths", real)


def _crash_mid_swap(spark, live: str) -> None:
    with pytest.raises(RuntimeError, match="injected crash"):
        _fs.promote_staged(spark, live)
    # the crash-window invariant every recovery path relies on
    assert not os.path.isdir(live)
    assert _gen(live + "__old") == "gen1"
    assert _gen(live + "__staging") == "gen2"


def test_crash_between_renames_default_recovery_rolls_back(
    spark, tmp_path, crash_second_rename
):
    live = str(tmp_path / "snap")
    _mkgen(live, "gen1")
    _mkgen(live + "__staging", "gen2")
    _crash_mid_swap(spark, live)

    _fs.recover_promote(spark, live)
    # snapshot policy: staging is scratch — serve the original
    assert _gen(live) == "gen1"
    assert not os.path.isdir(live + "__old")


def test_crash_between_renames_prefer_staged_serves_staged_then_converges(
    spark, tmp_path, crash_second_rename, monkeypatch
):
    live = str(tmp_path / "snap")
    _mkgen(live, "gen1")
    _mkgen(live + "__staging", "gen2")
    _crash_mid_swap(spark, live)

    _fs.recover_promote(spark, live, prefer_staged=True)
    # backfill policy: staging was verified before the swap — the
    # recovery RESUMES the promote and serves the staged generation
    assert _gen(live) == "gen2"
    assert not os.path.isdir(live + "__old")
    assert not os.path.isdir(live + "__staging")

    # re-run converges: the injector is spent (monkeypatch restored by
    # the fixture teardown ordering is NOT relied on — rearm counting
    # from a fresh promote with no crash index reachable), so a full
    # staged write + promote lands gen3 cleanly on top
    monkeypatch.undo()
    _mkgen(live + "__staging", "gen3")
    _fs.promote_staged(spark, live)
    assert _gen(live) == "gen3"
    assert not os.path.isdir(live + "__old")
    assert not os.path.isdir(live + "__staging")


def test_crash_between_renames_fence_marker_survives(
    spark, tmp_path, crash_second_rename, monkeypatch
):
    """The fence marker must still exist after a mid-swap death: it is
    the only thing stopping a concurrent writer from recreating the
    live dir inside the window recovery cannot repair."""
    live = str(tmp_path / "snap")
    marker = str(tmp_path / "snap.swap_marker")
    _mkgen(live, "gen1")
    _mkgen(live + "__staging", "gen2")

    with pytest.raises(RuntimeError, match="injected crash"):
        _fs.promote_staged(spark, live, marker=marker)
    assert os.path.exists(marker)  # fence held through the crash
    assert not os.path.isdir(live)

    # recovery + a clean re-promote clears the fence
    monkeypatch.undo()
    _fs.recover_promote(spark, live, prefer_staged=True)
    assert _gen(live) == "gen2"
    _mkgen(live + "__staging", "gen3")
    _fs.promote_staged(spark, live, marker=marker)
    assert _gen(live) == "gen3"
    assert not os.path.exists(marker)
