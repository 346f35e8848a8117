from yaetos_spark.operators.quality import (
    check_pk,
    compare_fuzzy,
    compare_summary,
    datasets_equal,
    identify_non_unique_pks,
)


def test_check_pk(spark):
    ok = spark.createDataFrame([(1,), (2,), (3,)], "id bigint")
    dup = spark.createDataFrame([(1,), (2,), (2,)], "id bigint")
    assert check_pk(ok, ["id"])
    assert not check_pk(dup, ["id"])


def test_identify_non_unique(spark):
    dup = spark.createDataFrame([(1, "a"), (2, "b"), (2, "c")], "id bigint, v string")
    bad = identify_non_unique_pks(dup, ["id"])
    assert sorted(r.id for r in bad.collect()) == [2, 2]


def test_datasets_equal(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id int, v string")
    b = spark.createDataFrame([(2, "y"), (1, "x")], "id int, v string")
    c = spark.createDataFrame([(1, "x")], "id int, v string")
    assert datasets_equal(a, b)
    assert not datasets_equal(a, c)


def test_compare_fuzzy(spark):
    a = spark.createDataFrame([(1, 100.0, "x"), (2, 200.0, "y"), (3, 300.0, "z")], "id int, amt double, v string")
    b = spark.createDataFrame([(1, 100.000001, "x"), (2, 250.0, "y"), (4, 1.0, "w")], "id int, amt double, v string")
    diff = compare_fuzzy(a, b, ["id"], numeric_pct_threshold=0.01)
    by_id = {r.id: r for r in diff.collect()}
    assert by_id[1].amt_match is True  # within 0.01%
    assert by_id[2].amt_match is False  # 25% off
    assert by_id[3]._in_1 and not by_id[3]._in_2
    assert by_id[4]._in_2 and not by_id[4]._in_1
    summary = compare_summary(diff, ["amt", "v"])
    assert summary["only_in_1"] == 1 and summary["only_in_2"] == 1
