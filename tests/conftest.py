"""Shared Spark fixture — one local session for the whole test run."""

import pytest


@pytest.fixture(scope="session")
def spark():
    from parserpdf_spark.session import get_spark

    spark = get_spark(cores=8, app_name="parserpdf_spark_tests")
    yield spark
    spark.stop()


SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_med():
    return SF_MED
