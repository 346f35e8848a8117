from pyspark.sql import functions as F

from yaetos_spark.operators.graph import connected_components, dedup_clusters
from yaetos_spark.operators.merge import latest_snapshot, scd2, upsert


def test_connected_components_basic(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (5, 6), (8, 7)], "id1 long, id2 long")
    comps = {r.node: r.comp for r in connected_components(edges).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 7: 7, 8: 7}


def test_connected_components_chain_converges(spark):
    # a 12-node path graph needs several propagation rounds
    edges = spark.createDataFrame([(i, i + 1) for i in range(12)], "id1 long, id2 long")
    comps = {r.node: r.comp for r in connected_components(edges).collect()}
    assert set(comps.values()) == {0}
    assert len(comps) == 13


def test_dedup_clusters_with_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(1, 4), (4, 5)], "id1 long, id2 long")
    out = {r.doc_id: r.cluster_id for r in dedup_clusters(docs, pairs).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3, 4: 1, 5: 1}


def test_latest_snapshot(spark):
    df = spark.createDataFrame(
        [(1, 10, "old"), (1, 20, "new"), (2, 5, "only")], "k long, ts long, v string"
    )
    out = {r.k: r.v for r in latest_snapshot(df, ["k"], "ts").collect()}
    assert out == {1: "new", 2: "only"}


def test_upsert(spark):
    existing = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    updates = spark.createDataFrame([(2, "B"), (3, "C")], "k long, v string")
    out = {r.k: r.v for r in upsert(existing, updates, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 3: "C"}


def test_scd2_intervals(spark):
    hist = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "v1"), (1, "2024-02-01 00:00:00", "v2")],
        "k long, ts string, v string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = {r.v: r for r in scd2(hist, ["k"], "ts").collect()}
    assert str(rows["v1"].valid_to) == "2024-02-01 00:00:00"
    assert not rows["v1"].is_current
    assert rows["v2"].is_current
    assert str(rows["v2"].valid_to).startswith("9999-12-31")


def test_pagerank_fixed_point_path_graph(spark):
    """Path graph a-b-c, one iteration, hand-computed in fixed point:
    contribs -> a: r(b)//2, b: r(a)+r(c), c: r(b)//2;
    r1 = 0.15 + 0.85 * contrib."""
    from yaetos_spark.operators.graph import pagerank_fixed_point

    edges = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
    ranks = {r.node: r.rank for r in pagerank_fixed_point(edges, iters=1).collect()}
    assert ranks == {"a": 0.575, "b": 1.85, "c": 0.575}


def test_pagerank_deterministic_across_partitionings(spark):
    from yaetos_spark.operators.graph import pagerank_fixed_point

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7) % 40}") for i in range(200)], "src string, dst string"
    ).where("src != dst")
    r1 = {r.node: r.rank for r in pagerank_fixed_point(edges, iters=3).collect()}
    r2 = {
        r.node: r.rank
        for r in pagerank_fixed_point(edges.repartition(13), iters=3).collect()
    }
    assert r1 == r2  # bit-identical, not approximately equal


def test_triangle_count_known_graph(spark):
    """K4 minus one edge: vertices 1-4, edges 12 13 14 23 24 (no 34).
    Triangles: (1,2,3) and (1,2,4) -> node 1:2, 2:2, 3:1, 4:1. Edge
    direction and duplicates in the input must not matter."""
    from yaetos_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (3, 1), (1, 4), (2, 3), (4, 2), (2, 1), (1, 2)],  # mixed dir + dups
        "src int, dst int",
    )
    out = {r.node: r.n_triangles for r in triangle_count(edges).collect()}
    assert out == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_count_no_triangles(spark):
    from yaetos_spark.operators.graph import triangle_count

    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src int, dst int")
    assert triangle_count(edges).count() == 0


def test_scd2_lookup_point_in_time(spark):
    from yaetos_spark.operators.merge import scd2, scd2_lookup

    hist = spark.createDataFrame(
        [(1, "free", "2024-01-01 00:00:00"), (1, "pro", "2024-02-01 00:00:00"),
         (2, "free", "2024-01-15 00:00:00")],
        "user_id long, plan string, ts_s string",
    ).selectExpr("user_id", "plan", "CAST(ts_s AS TIMESTAMP) AS ts")
    dim = scd2(hist, ["user_id"], "ts")
    facts = spark.createDataFrame(
        [(10, 1, "2024-01-20 12:00:00"),   # during 'free'
         (11, 1, "2024-02-01 00:00:00"),   # exactly at boundary -> 'pro' (half-open)
         (12, 1, "2024-03-01 00:00:00"),   # during open 'pro' interval
         (13, 2, "2024-01-01 00:00:00"),   # before user 2 existed -> dropped (inner)
         (14, 3, "2024-01-01 00:00:00")],  # unknown user -> dropped
        "event_id long, user_id long, ts_s string",
    ).selectExpr("event_id", "user_id", "CAST(ts_s AS TIMESTAMP) AS ts")
    out = {r.event_id: r.plan for r in scd2_lookup(facts, dim, ["user_id"]).collect()}
    assert out == {10: "free", 11: "pro", 12: "pro"}
    # each fact matches exactly one version (intervals partition time)
    assert scd2_lookup(facts, dim, ["user_id"]).count() == 3
