import os

import pytest
from pyspark.sql import types as T

from grasper_spark import G, PropertyGraph, get_spark
from grasper_spark.plans.index_store import CALIBRATION_ENV

# hermetic: a bench-recorded index-crossover calibration in the working
# tree must not seed G handles built by tests (tests that exercise the
# seeding point the env at their own file)
os.environ.setdefault(CALIBRATION_ENV, "/nonexistent/grasper-calibration.json")

MODERN_V = [
    (1, "person", "marko", 29, None),
    (2, "person", "vadas", 27, None),
    (3, "software", "lop", None, "java"),
    (4, "person", "josh", 32, None),
    (5, "software", "ripple", None, "java"),
    (6, "person", "peter", 35, None),
]
MODERN_E = [
    (1, 2, "knows", 0.5),
    (1, 3, "created", 0.4),
    (1, 4, "knows", 1.0),
    (4, 5, "created", 1.0),
    (4, 3, "created", 0.4),
    (6, 3, "created", 0.2),
]

V_SCHEMA = T.StructType(
    [
        T.StructField("vid", T.LongType()),
        T.StructField("label", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("age", T.IntegerType()),
        T.StructField("lang", T.StringType()),
    ]
)
E_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType()),
        T.StructField("dst", T.LongType()),
        T.StructField("label", T.StringType()),
        T.StructField("weight", T.DoubleType()),
    ]
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("grasper-tests", master="local[2]", shuffle_partitions=2)
    yield s


@pytest.fixture(scope="session")
def modern(spark):
    v = spark.createDataFrame(MODERN_V, V_SCHEMA)
    e = spark.createDataFrame(MODERN_E, E_SCHEMA)
    return PropertyGraph(v, e, name="modern").cache()


@pytest.fixture(scope="session")
def g(modern):
    return G(modern)


def vals(traversal):
    """Collect the single output column as a sorted list."""
    return sorted(traversal.to_list())


def rows(df):
    return sorted(tuple(r) for r in df.collect())
