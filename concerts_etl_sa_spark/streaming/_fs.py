"""Tiny Hadoop-FS helpers for the foreachBatch sinks.

The merge-on-write sinks (``corpus_ingest``, ``ann_maintenance``) read
their own output path as state. "State absent" must be decided by an
EXPLICIT existence probe, not by swallowing read exceptions: a bare
``except`` around the read treats ANY transient failure (corrupt
footer, FS hiccup, permission error) as "first batch", which for an
overwrite-mode sink silently destroys the accumulated state. With the
probe, a missing path is the only no-state signal and every real read
failure surfaces to the stream (which dies loudly and is retryable).
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


def staging_dir(live_dir: str) -> str:
    return live_dir.rstrip("/") + "__staging"


def _old_dir(live_dir: str) -> str:
    return live_dir.rstrip("/") + "__old"


def _fs_and_paths(spark: SparkSession, live_dir: str):
    jvm = spark._jvm
    p_live = jvm.org.apache.hadoop.fs.Path(live_dir)
    fs = p_live.getFileSystem(spark._jsc.hadoopConfiguration())
    p_staging = jvm.org.apache.hadoop.fs.Path(staging_dir(live_dir))
    p_old = jvm.org.apache.hadoop.fs.Path(_old_dir(live_dir))
    return fs, p_live, p_staging, p_old


def recover_promote(spark: SparkSession, live_dir: str) -> None:
    """Crash-window recovery for a prior :func:`promote_staged`: a death
    between the two renames leaves the snapshot staged aside in __old —
    roll it back; a completed promote that died before the cleanup just
    leaves a stale __old to delete. Run this BOTH before the stream
    starts (an availableNow rerun with no new files never enters
    foreachBatch) and at each batch start."""
    fs, p_live, _, p_old = _fs_and_paths(spark, live_dir)
    if path_exists(spark, _old_dir(live_dir)):
        if not path_exists(spark, live_dir):
            if not fs.rename(p_old, p_live):
                raise RuntimeError(
                    f"promote recovery: could not restore {live_dir}"
                )
        else:
            fs.delete(p_old, True)


def promote_staged(spark: SparkSession, live_dir: str) -> None:
    """Swap a snapshot written to ``staging_dir(live_dir)`` into place:
    live -> __old, __staging -> live, drop __old. NEVER
    ``mode('overwrite')`` on the live path — an overwrite deletes the
    dir before the new files commit, so a crash in that window destroys
    the accumulated state; with the staged swap the prior snapshot
    survives every crash window (recovered by :func:`recover_promote`).
    """
    fs, p_live, p_staging, p_old = _fs_and_paths(spark, live_dir)
    if path_exists(spark, live_dir):
        if not fs.rename(p_live, p_old):
            raise RuntimeError(
                f"promote: could not stage {live_dir} aside"
            )
    if not fs.rename(p_staging, p_live):
        fs.rename(p_old, p_live)  # roll back; staging is scratch
        raise RuntimeError(
            f"promote: could not promote {staging_dir(live_dir)}"
        )
    fs.delete(p_old, True)
