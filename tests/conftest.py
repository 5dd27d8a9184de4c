import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdfplucker_spark.session import get_spark  # noqa: E402


def pytest_collection_modifyitems(config, items):
    # hostile-marked tests are opt-in (they shell out to the full
    # Tokyo+ANSI sweep, minutes of wall): skipped unless the user's -m
    # expression mentions the marker, so the default gate reports them
    # as skipped (visible, never forgotten) instead of running them.
    if "hostile" in (config.getoption("-m") or ""):
        return
    skip = pytest.mark.skip(reason="opt-in sweep: run with -m hostile")
    for item in items:
        if "hostile" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app="pdfplucker_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()
