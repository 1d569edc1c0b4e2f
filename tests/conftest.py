from __future__ import annotations

import shutil
import tempfile

import pytest

from belb_spark import datagen
from belb_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("belb_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_tables():
    return datagen.generate(datagen.TINY)


@pytest.fixture(scope="session")
def tiny_dir(tiny_tables):
    d = tempfile.mkdtemp(prefix="belb_tiny_")
    datagen.save(tiny_tables, d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def tiny_spark(spark, tiny_dir):
    """Spark DataFrames of the tiny synthetic tables."""
    return {
        name: spark.read.parquet(f"{tiny_dir}/{name}.parquet")
        for name in [
            "repos",
            "synonym_dict",
            "history",
            "identifier_mapping",
            "gold",
            "labeled_pairs",
        ]
    }
