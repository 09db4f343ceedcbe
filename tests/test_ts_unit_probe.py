"""Footer probe guards (sources/readers._parquet_ts_units).

The probe decides whether a timestamp column is read as raw nanos (long)
or native micros; a wrong answer corrupts every timestamp 1000x. Pins:
- directory datasets probe multiple members and REFUSE mixed units
- an empty directory is not negative-cached (streaming source dirs start
  empty; the first file landing must be seen on the next probe)
- homogeneous directories resolve to the shared unit
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from concerts_etl_sa_spark.sources.readers import (
    _TS_UNIT_CACHE,
    _parquet_ts_units,
)


def _write(path, unit):
    tbl = pa.table(
        {"ts": pa.array([1_700_000_000_000], type=pa.timestamp(unit))}
    )
    pq.write_table(tbl, path)


def test_mixed_units_raise(tmp_path):
    d = tmp_path / "mixed"
    d.mkdir()
    _write(d / "part-0.parquet", "ns")
    _write(d / "part-1.parquet", "us")
    with pytest.raises(ValueError, match="mixed parquet timestamp units"):
        _parquet_ts_units(str(d))
    assert str(d) not in _TS_UNIT_CACHE


def test_empty_dir_not_negative_cached(tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    assert _parquet_ts_units(str(d)) == {}
    assert str(d) not in _TS_UNIT_CACHE
    # first file lands -> the very next probe must see it
    _write(d / "part-0.parquet", "ns")
    assert _parquet_ts_units(str(d)) == {"ts": "ns"}
    assert _TS_UNIT_CACHE.get(str(d)) == {"ts": "ns"}


def test_homogeneous_dir_and_cache(tmp_path):
    d = tmp_path / "homog"
    d.mkdir()
    for i in range(4):  # more members than the probe window
        _write(d / f"part-{i}.parquet", "us")
    assert _parquet_ts_units(str(d)) == {"ts": "us"}
    assert _TS_UNIT_CACHE.get(str(d)) == {"ts": "us"}


def test_single_file_probe(tmp_path):
    f = tmp_path / "one.parquet"
    _write(str(f), "ns")
    assert _parquet_ts_units(str(f)) == {"ts": "ns"}
