from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from concerts_etl_sa_spark.session import get_spark

    s = get_spark("tests")
    yield s


SF_DIR = "/root/testdata/sf0.001"
