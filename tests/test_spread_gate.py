"""Pin the small-scan spread gate (sources/readers._needs_spread).

The gate decides when load_table round-robins a single-file scan so
CPU-heavy projections/partial aggregates don't serialize on one core.
Three regimes:
- small file (byte gate): spread
- mid-size file with fewer row groups than cores (unsplittable despite
  its size — Spark tasks read whole row groups): spread
- directory dataset / many-row-group file / huge file: never spread
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from concerts_etl_sa_spark.sources import readers as R


def _write(path, n_rows, row_group_size):
    tbl = pa.table({"x": pa.array(range(n_rows), type=pa.int64())})
    pq.write_table(tbl, path, row_group_size=row_group_size)


def test_small_file_spreads(tmp_path):
    f = tmp_path / "small.parquet"
    _write(str(f), 1000, 1000)
    assert R._needs_spread(str(f), parallelism=32)


def test_directory_never_spreads(tmp_path):
    d = tmp_path / "ds"
    d.mkdir()
    _write(str(d / "part-0.parquet"), 1000, 1000)
    assert not R._needs_spread(str(d), parallelism=32)


def test_midsize_single_row_group_spreads(tmp_path, monkeypatch):
    f = tmp_path / "mid.parquet"
    _write(str(f), 5000, 5000)  # ONE row group
    # pretend it is 100 MB (over the byte gate, under the probe cap)
    monkeypatch.setattr(
        R.os.path, "getsize", lambda p: 100 << 20
    )
    R._RG_COUNT_CACHE.pop(R._stat_key(str(f)), None)
    assert R._needs_spread(str(f), parallelism=32)


def test_midsize_many_row_groups_does_not_spread(tmp_path, monkeypatch):
    f = tmp_path / "many.parquet"
    _write(str(f), 6400, 100)  # 64 row groups
    monkeypatch.setattr(R.os.path, "getsize", lambda p: 100 << 20)
    R._RG_COUNT_CACHE.pop(R._stat_key(str(f)), None)
    assert not R._needs_spread(str(f), parallelism=32)


def test_huge_file_does_not_spread(tmp_path, monkeypatch):
    f = tmp_path / "huge.parquet"
    _write(str(f), 1000, 1000)
    monkeypatch.setattr(R.os.path, "getsize", lambda p: 2 << 30)
    assert not R._needs_spread(str(f), parallelism=32)


def test_rewritten_file_row_groups_reprobed(tmp_path, monkeypatch):
    """In-place rewrite changing the row grouping must re-probe, not
    serve the stale row-group count (cache keys on path+mtime+size)."""
    import os

    f = tmp_path / "rw.parquet"
    _write(str(f), 5000, 5000)  # ONE row group -> spread
    monkeypatch.setattr(R.os.path, "getsize", lambda p: 100 << 20)
    assert R._needs_spread(str(f), parallelism=32)
    _write(str(f), 6400, 100)  # 64 row groups -> no spread
    st = os.stat(str(f))
    os.utime(str(f), ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert not R._needs_spread(str(f), parallelism=32)
