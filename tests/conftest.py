from __future__ import annotations

import importlib.util
import os
import signal
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --timeout fallback (round-13 verdict item #6): a hung Spark test must
# not block the whole suite indefinitely in CI-like runs. The real
# pytest-timeout plugin is preferred when installed (same flag name,
# richer reporting); this container cannot pip install, so provide a
# SIGALRM-based stand-in — per-test, main-thread, cancelled on exit.
#
# SHARED-SESSION CAVEAT (round-13 advisory): the alarm fires at an
# arbitrary point in the runtest protocol — possibly mid-py4j socket
# call or during teardown — and the Spark fixture is session-scoped, so
# a timeout in one test can leave the shared gateway connection in a
# state that cascades failures into later tests. This flag is a
# CI-abort device ("fail loudly instead of hanging forever"), not a
# precision per-test budget: after any timeout fires, treat subsequent
# failures in the same run as suspect and re-run without --timeout (or
# install pytest-timeout, whose thread-based method has the same
# limitation but reports it).
_HAVE_PYTEST_TIMEOUT = importlib.util.find_spec("pytest_timeout") is not None


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run the @pytest.mark.slow bench-scale (sf0.1) quality pins",
    )
    if not _HAVE_PYTEST_TIMEOUT:
        parser.addoption(
            "--timeout",
            action="store",
            type=float,
            default=0,
            help=(
                "per-test wall-clock ceiling in seconds (0 = off); "
                "SIGALRM fallback when pytest-timeout is not installed"
            ),
        )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: bench-scale (sf0.1) quality pins — skipped unless "
        "--runslow or SPARK_GRAFT_SLOW=1 (round-15 verdict #3)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get(
        "SPARK_GRAFT_SLOW"
    ) == "1":
        return
    skip = pytest.mark.skip(
        reason="slow sf0.1 pin: pass --runslow or SPARK_GRAFT_SLOW=1"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


if not _HAVE_PYTEST_TIMEOUT and hasattr(signal, "SIGALRM"):

    @pytest.hookimpl(wrapper=True)
    def pytest_runtest_protocol(item, nextitem):
        limit = float(item.config.getoption("--timeout") or 0)
        if limit <= 0:
            return (yield)

        def _raise_timeout(signum, frame):
            raise TimeoutError(
                f"test exceeded --timeout={limit:g}s: {item.nodeid}"
            )

        prev = signal.signal(signal.SIGALRM, _raise_timeout)
        # whole-protocol alarm (setup+call+teardown share one budget —
        # the session-scoped Spark fixture makes per-phase budgets
        # meaningless for the first test anyway)
        signal.setitimer(signal.ITIMER_REAL, limit)
        try:
            return (yield)
        finally:
            signal.setitimer(signal.ITIMER_REAL, 0)
            signal.signal(signal.SIGALRM, prev)


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from concerts_etl_sa_spark.session import get_spark

    s = get_spark("tests")
    yield s


SF_DIR = "/root/testdata/sf0.001"
