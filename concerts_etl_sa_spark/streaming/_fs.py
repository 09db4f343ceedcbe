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
