from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small local parallelism for tests


@pytest.fixture(scope="session")
def spark():
    from tabata_spark.session import get_spark

    s = get_spark("tabata_spark-tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def flights():
    """Small deterministic flight fixture (FIXTURES.md F1)."""
    from tabata_spark.sources.generator import make_flight_records

    return make_flight_records(n_records=6, seed=42, n_rows=600)


@pytest.fixture(scope="session")
def sset(spark, flights):
    from tabata_spark.core.signalset import SignalSet

    return SignalSet.from_records(spark, flights)


SF_DIR = os.environ.get("SPARK_GRAFT_SF_TEST_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
