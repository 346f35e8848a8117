import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["l_orderkey", "orderdate", "revenue"]


def test_queries_have_oracles():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 30
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle without query: {missing}"
    # every query except explicitly non-SQL-expressible ones has an oracle
    no_oracle = set(qs) - set(oracles)
    assert no_oracle <= {"lsh_ann_pairs", "approx_distinct_parts"}


def test_each_query_runs(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
