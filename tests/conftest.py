import pytest

from sql_flow_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    return get_spark("sql-flow-spark-tests")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
