from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # keep test JVM small


@pytest.fixture(scope="session")
def spark():
    from storage_crawler_spark.session import build_session

    # 4g heap: the default 1g OOMed ~1400 tests into the full suite once the
    # registry builders' persisted relations accumulated (observed as a
    # Py4JJavaError/heap-space failure in whichever battery test ran next)
    s = build_session(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="module", autouse=True)
def _clear_spark_cache_between_modules():
    """Unpersist everything the previous module's registry builders cached —
    `_persist_view` relations otherwise live for the whole session and the
    cache grows monotonically across ~30 test modules (the heap-OOM class
    above).  Touches only an ALREADY-ACTIVE session; modules that never
    start Spark stay JVM-free."""
    yield
    try:
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        if active is not None:
            active.catalog.clearCache()
    except Exception:
        pass


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
