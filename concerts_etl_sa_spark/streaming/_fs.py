"""Tiny Hadoop-FS helpers for the foreachBatch sinks.

The merge-on-write sinks (``corpus_ingest``, ``ann_maintenance``) read
their own output path as state. "State absent" must be decided by an
EXPLICIT existence probe, not by swallowing read exceptions: a bare
``except`` around the read treats ANY transient failure (corrupt
footer, FS hiccup, permission error) as "first batch", which for an
overwrite-mode sink silently destroys the accumulated state. With the
probe, a missing path is the only no-state signal and every real read
failure surfaces to the stream (which dies loudly and is retryable).

This module is the ONE staged-promote implementation (round-10 #6 —
the same rationale as the round-8 merge-gate extraction: the swap/fence
logic is the drift-prone safety piece, so its three callers must share
a single definition). Callers differ only in knobs:

- the snapshot sinks (``ann_maintenance``, ``sinks.writers``) use the
  defaults: ``__staging``/``__old`` suffixes, no fence, and recovery
  that prefers ROLLING BACK to the staged-aside snapshot (staging is
  scratch — it is rewritten every cycle, so its content is not trusted
  after a crash);
- the corpus backfill (``corpus_ingest.backfill_band_fps``) passes its
  sink-lifetime suffixes (``__backfill``/``__pre_backfill``), a fence
  ``marker`` (ingest refuses to start while it exists, closing the
  one unrecoverable window — an ingest recreating the sink mid-swap),
  and ``prefer_staged=True`` recovery (the staged rewrite was fully
  VERIFIED before the swap began, so a crash resumes the promote
  instead of discarding the verified work).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def path_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on its Hadoop filesystem (works for
    local paths, HDFS, and object stores alike — whatever the session's
    Hadoop configuration resolves)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def delete_path(spark: SparkSession, path: str, recursive: bool = False) -> None:
    """Best-effort delete of ``path`` (no error when absent)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        fs.delete(hpath, recursive)


def staging_dir(live_dir: str, suffix: str = "__staging") -> str:
    return live_dir.rstrip("/") + suffix


def _old_dir(live_dir: str, suffix: str = "__old") -> str:
    return live_dir.rstrip("/") + suffix


def _fs_and_paths(
    spark: SparkSession,
    live_dir: str,
    staging_suffix: str = "__staging",
    old_suffix: str = "__old",
):
    jvm = spark._jvm
    p_live = jvm.org.apache.hadoop.fs.Path(live_dir)
    fs = p_live.getFileSystem(spark._jsc.hadoopConfiguration())
    p_staging = jvm.org.apache.hadoop.fs.Path(
        staging_dir(live_dir, staging_suffix)
    )
    p_old = jvm.org.apache.hadoop.fs.Path(_old_dir(live_dir, old_suffix))
    return fs, p_live, p_staging, p_old


def recover_promote(
    spark: SparkSession,
    live_dir: str,
    staging_suffix: str = "__staging",
    old_suffix: str = "__old",
    prefer_staged: bool = False,
) -> None:
    """Crash-window recovery for a prior :func:`promote_staged`: a death
    between the two renames leaves the snapshot staged aside in the old
    dir — roll it back; a completed promote that died before the cleanup
    just leaves a stale old dir to delete. Run this BOTH before the
    stream starts (an availableNow rerun with no new files never enters
    foreachBatch) and at each batch start.

    ``prefer_staged=True`` (the backfill policy — staging content was
    fully verified before the swap began): a crash between the renames
    RESUMES the interrupted promote instead of rolling back, and
    live+old+staging ALL present is refused as ambiguous — it means
    someone recreated the live dir inside the crash window, and deleting
    the old dir would silently destroy the original state."""
    fs, p_live, p_staging, p_old = _fs_and_paths(
        spark, live_dir, staging_suffix, old_suffix
    )
    old_path = _old_dir(live_dir, old_suffix)
    staging_path = staging_dir(live_dir, staging_suffix)
    if not path_exists(spark, old_path):
        return
    if path_exists(spark, live_dir):
        if prefer_staged and path_exists(spark, staging_path):
            # a genuinely completed swap has no staging dir left (it was
            # renamed onto the live dir). live+old+staging all present
            # means the live dir was recreated INSIDE the crash window —
            # the original state lives in the old dir and deleting it
            # here would silently destroy it. Fail loudly instead.
            raise RuntimeError(
                f"promote recovery: ambiguous state — {live_dir}, "
                f"{old_path} and {staging_path} all exist. The live dir "
                "was likely recreated during an interrupted swap; the "
                "original state is in the old dir. Reconcile manually "
                "(merge the recreated rows into the staged state) "
                "before rerunning."
            )
        fs.delete(p_old, True)  # completed-swap leftover
        return
    if prefer_staged and path_exists(spark, staging_path):
        # staging was fully verified before the swap began — resume the
        # interrupted promote, then drop the staged-aside original
        if not fs.rename(p_staging, p_live):
            raise RuntimeError(
                f"promote recovery: could not promote {staging_path}"
            )
        fs.delete(p_old, True)
        return
    if not fs.rename(p_old, p_live):
        raise RuntimeError(f"promote recovery: could not restore {live_dir}")


def promote_staged(
    spark: SparkSession,
    live_dir: str,
    staging_suffix: str = "__staging",
    old_suffix: str = "__old",
    marker: str | None = None,
) -> None:
    """Swap a snapshot written to the staging dir into place:
    live -> old, staging -> live, drop old. NEVER ``mode('overwrite')``
    on the live path — an overwrite deletes the dir before the new files
    commit, so a crash in that window destroys the accumulated state;
    with the staged swap the prior snapshot survives every crash window
    (recovered by :func:`recover_promote`).

    ``marker`` arms the crash-window FENCE: the marker file is created
    before the first rename and removed only after the swap is fully
    settled (or fully rolled back). Callers that could recreate the live
    dir concurrently (the corpus ingest) refuse to start while the
    marker exists, so the one state recovery cannot repair — a recreate
    INSIDE the swap window — is prevented from arising instead of merely
    detected. ``createNewFile`` returns False instead of throwing when
    it cannot create (e.g. the file already exists) — False with NO
    marker on disk means the swap would proceed UNFENCED; fail before
    the first rename instead. (False with the marker present is fine: a
    prior run crashed after fencing but before its first rename — the
    fence is already in place.)"""
    fs, p_live, p_staging, p_old = _fs_and_paths(
        spark, live_dir, staging_suffix, old_suffix
    )
    p_marker = None
    if marker is not None:
        p_marker = spark._jvm.org.apache.hadoop.fs.Path(marker)
        if not fs.createNewFile(p_marker) and not path_exists(spark, marker):
            raise RuntimeError(
                f"promote: could not create fence marker {marker}; "
                "refusing to start the swap unfenced"
            )
    staged_aside = False
    if path_exists(spark, live_dir):
        if not fs.rename(p_live, p_old):
            if p_marker is not None:
                fs.delete(p_marker, False)  # swap never started
            raise RuntimeError(f"promote: could not stage {live_dir} aside")
        staged_aside = True
    if not fs.rename(p_staging, p_live):
        if not staged_aside:
            # first-ever snapshot: no live dir was staged aside, so there
            # is nothing to roll back (and the rollback rename would
            # necessarily fail, surfacing the misleading "could not roll
            # back ... reconcile manually" error — round-10 advisory).
            # The pre-swap state (no live dir) already holds; unfence.
            if p_marker is not None:
                fs.delete(p_marker, False)
            raise RuntimeError(
                f"promote: could not promote "
                f"{staging_dir(live_dir, staging_suffix)}"
            )
        # roll back so the live dir is never left missing. The fence
        # marker is removed ONLY when the rollback lands: with the live
        # dir still missing, the marker is the sole thing stopping a
        # concurrent writer from recreating it mid-swap (the documented
        # unrecoverable state) — an unconditional delete here would
        # unfence exactly that window.
        if fs.rename(p_old, p_live):
            if p_marker is not None:
                fs.delete(p_marker, False)
            raise RuntimeError(
                f"promote: could not promote "
                f"{staging_dir(live_dir, staging_suffix)}"
            )
        raise RuntimeError(
            f"promote: could not promote "
            f"{staging_dir(live_dir, staging_suffix)} AND could not roll "
            f"back {_old_dir(live_dir, old_suffix)}"
            + (
                " — fence marker left in place; reconcile manually "
                "(restore the live dir from the old dir), then delete "
                "the marker"
                if p_marker is not None
                else ""
            )
        )
    fs.delete(p_old, True)
    if p_marker is not None:
        fs.delete(p_marker, False)
