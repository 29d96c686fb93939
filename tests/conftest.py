from __future__ import annotations

import contextlib
import os
import time

import pytest

from pyspark.sql import SparkSession


@contextlib.contextmanager
def driver_tz(tz: str):
    """Temporarily change the DRIVER process's OS timezone (the tz
    PySpark's classic naive-datetime conversions — time.mktime /
    datetime.fromtimestamp — read). Executor Python workers keep their
    own tz, which is exactly the asymmetry the tz-handling fixes must
    survive. Restores the previous tz on exit."""
    prev = os.environ.get("TZ")
    os.environ["TZ"] = tz
    time.tzset()
    try:
        yield
    finally:
        if prev is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = prev
        time.tzset()


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("choetl_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
