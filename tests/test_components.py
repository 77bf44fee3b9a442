"""Connected components: hand-built graphs with known answers."""

from dupers_spark.operators.components import connected_components, with_singletons


def _assign(spark, edges):
    df = spark.createDataFrame(edges, ["a", "b"])
    return {
        r["image_id"]: r["component_id"]
        for r in connected_components(df).collect()
    }


def test_chain(spark):
    comp = _assign(spark, [("b", "c"), ("a", "b"), ("c", "d"), ("d", "e")])
    assert len(set(comp.values())) == 1
    assert set(comp) == {"a", "b", "c", "d", "e"}
    assert set(comp.values()) == {"a"}  # root = min member


def test_two_components_and_duplicate_edges(spark):
    comp = _assign(spark, [("x", "y"), ("y", "x"), ("p", "q"), ("q", "r"), ("x", "y")])
    assert comp["x"] == comp["y"] == "x"
    assert comp["p"] == comp["q"] == comp["r"] == "p"


def test_star_and_self_loop_ignored(spark):
    comp = _assign(spark, [("hub", "s1"), ("hub", "s2"), ("hub", "s3"), ("s1", "s1")])
    assert set(comp.values()) == {"hub"}


def test_long_path_converges(spark):
    n = 40
    edges = [(f"v{i:03d}", f"v{i+1:03d}") for i in range(n)]
    comp = _assign(spark, edges)
    assert set(comp.values()) == {"v000"}
    assert len(comp) == n + 1


def test_large_star_hub_component(spark):
    """Hub safety: a star component with 50k members must converge without
    materializing any per-node neighbor array (the min+join-back path) —
    the shape that OOMed collect_set formulations at scale."""
    n = 50_000
    edges = spark.range(1, n).selectExpr(
        "concat('m', lpad(cast(id as string), 6, '0')) AS a",
        "'hub0' AS b",
    )
    assign = connected_components(edges, max_iter=10)
    roots = assign.select("component_id").distinct().collect()
    assert [r["component_id"] for r in roots] == ["hub0"]
    assert assign.count() == n  # hub + n-1 members


def test_with_singletons(spark):
    pairs = spark.createDataFrame([("a", "b")], ["a", "b"])
    allids = spark.createDataFrame([("a",), ("b",), ("z",)], ["image_id"])
    assign = with_singletons(connected_components(pairs), allids)
    comp = {r["image_id"]: r["component_id"] for r in assign.collect()}
    assert comp == {"a": "a", "b": "a", "z": "z"}
