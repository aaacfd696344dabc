import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from xtdb_spark.session import build_spark

    s = build_spark("xtdb-spark-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def store(spark, tmp_path):
    from xtdb_spark.tx import TableStore

    return TableStore(spark, str(tmp_path / "warehouse"))
