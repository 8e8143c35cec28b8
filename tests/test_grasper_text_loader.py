"""Round-trip: the reference's native text data → V/E DataFrames must
equal the hand-written modern fixture exactly (FIXTURES.md §3)."""

import os

import pytest
from conftest import MODERN_E, MODERN_V, rows

from grasper_spark import G
from grasper_spark.sources import load_grasper_text

REF_DATA = "/root/reference/data"


@pytest.fixture(scope="module")
def text_graph(spark):
    if not os.path.isdir(REF_DATA):
        pytest.skip("reference data not available")
    return load_grasper_text(spark, REF_DATA)


def test_vertices_roundtrip(text_graph):
    got = rows(text_graph.vertices)
    assert got == sorted(MODERN_V)


def test_edges_roundtrip(text_graph):
    got = rows(text_graph.edges)
    assert got == sorted(MODERN_E)


def test_schema_types(text_graph):
    types = dict(text_graph.vertices.dtypes)
    assert types["age"] == "int"  # type code 1 (vtx_property_index)
    assert types["name"] == "string"  # type code 4
    assert dict(text_graph.edges.dtypes)["weight"] == "double"  # type code 2


def test_query_on_loaded_graph(text_graph):
    g = G(text_graph)
    got = sorted(g.V().has("name", "marko").out("knows").values("age").to_list())
    assert got == [27, 32]
