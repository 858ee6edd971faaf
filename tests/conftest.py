from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]


@pytest.fixture(scope="session")
def spark():
    from avro_diff_spark.session import get_spark

    s = get_spark("avro_diff_spark-tests", master="local[4]", shuffle_partitions=8, extra_conf={"spark.sql.codegen.wholeStage": "false"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
