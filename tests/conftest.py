from __future__ import annotations

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from zerox_spark.session import get_spark

    spark = get_spark("local[4]", app_name="zerox-spark-tests")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"
