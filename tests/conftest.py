from __future__ import annotations

import os

import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM light
    from unitdb_spark.session import get_spark

    s = get_spark("unitdb-tests", cpus=int(os.environ["SPARK_GRAFT_CPUS"]))
    yield s
    s.stop()


@pytest.fixture()
def engine(spark, tmp_path):
    from unitdb_spark.engine import Engine

    eng = Engine.open(spark, str(tmp_path / "store"))
    yield eng
    eng.destroy()
