"""Tabular loaders + skew utilities."""

from grasper_spark import G
from grasper_spark.skew import salted_aggregate, salted_join, top_hot_keys
from grasper_spark.sources.tabular import from_dataframes, load_csv


def test_from_dataframes_mapping(spark):
    v = spark.createDataFrame([(1, "u"), (2, "u")], ["id", "kind"])
    e = spark.createDataFrame([(1, 2, 0.5), (1, 2, 0.7)], ["a", "b", "w"])
    g = from_dataframes(v, e, vid="id", label="kind", src="a", dst="b")
    assert g.vertices.columns[:2] == ["vid", "label"]
    assert g.edges.count() == 1  # (src,dst) dedup — reference constraint
    assert G(g).V().count().to_list() == [2]


def test_load_csv_roundtrip(spark, tmp_path):
    vp, ep = str(tmp_path / "v.csv"), str(tmp_path / "e.csv")
    with open(vp, "w") as f:
        f.write("vid,label,name\n1,person,ann\n2,person,bob\n")
    with open(ep, "w") as f:
        f.write("src,dst,label\n1,2,knows\n")
    g = G(load_csv(spark, vp, ep))
    assert g.V().has("name", "ann").out("knows").values("name").to_list() == ["bob"]


def test_salted_aggregate_matches_plain(spark):
    df = spark.createDataFrame(
        [("hot", i * 1.0) for i in range(100)] + [("cold", 5.0)], ["k", "v"]
    )
    got = {
        r["k"]: (r["sum_v"], r["count_v"])
        for r in salted_aggregate(df, ["k"], {"v": "sum"}, salt_buckets=8)
        .join(
            salted_aggregate(df, ["k"], {"v": "count"}, salt_buckets=8).withColumnRenamed(
                "count_v", "count_v"
            ),
            "k",
        )
        .collect()
    }
    assert got["hot"] == (sum(range(100)), 100)
    assert got["cold"] == (5.0, 1)


def test_salted_join_matches_plain(spark):
    left = spark.createDataFrame([(1, "x")] * 50 + [(2, "y")], ["k", "lv"])
    right = spark.createDataFrame([(1, "dim1"), (2, "dim2"), (3, "dim3")], ["k", "rv"])
    got = sorted(tuple(r) for r in salted_join(left, right, "k").collect())
    want = sorted(tuple(r) for r in left.join(right, "k").collect())
    assert got == want


def test_top_hot_keys(spark):
    df = spark.createDataFrame([("a",)] * 10 + [("b",)] * 2, ["k"])
    hot = top_hot_keys(df, "k", threshold=5).collect()
    assert len(hot) == 1 and hot[0]["k"] == "a" and hot[0]["cnt"] == 10
