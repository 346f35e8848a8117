import json

import pandas as pd
import pytest

from yaetos_spark.deploy import build_spark_submit
from yaetos_spark.pandas_job import PandasJob, pandas_on_spark
from yaetos_spark.sources.http import fetch_csv, fetch_json_records, paged_json_records
from yaetos_spark.sources.readers import expand_path_combinations, load_input, load_multi_paths


class MergeCount(PandasJob):
    """Reference ex7 shape: pandas merge + groupby at the edge."""

    def transform_pandas(self, some_events, other_events):
        df = pd.merge(some_events, other_events, on="session_id", how="inner")
        out = df.groupby("session_id", as_index=False).agg(n=("session_id", "size"))
        return out.sort_values("n", ascending=False)


def test_pandas_job(spark):
    some = spark.createDataFrame([(1,), (1,), (2,), (3,)], "session_id bigint")
    other = spark.createDataFrame([(1,), (2,)], "session_id bigint")
    job = MergeCount({"add_created_at": False})
    out = job.etl_no_io(spark, {"some_events": some, "other_events": other})
    rows = [(r.session_id, r.n) for r in out.collect()]
    assert rows == [(1, 2), (2, 1)]


def test_pandas_on_spark_bridge(spark):
    df = spark.createDataFrame([(1, 2.0), (1, 4.0), (2, 6.0)], "k bigint, v double")
    psdf = pandas_on_spark(df)
    out = psdf.groupby("k", as_index=False)["v"].mean().to_spark()
    got = {r.k: r.v for r in out.collect()}
    assert got == {1: 3.0, 2: 6.0}


def test_fetch_json_records(spark):
    payload = {"records": [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]}

    def fake(url, **kw):
        assert url == "http://api/x"
        return json.dumps(payload).encode()

    df = fetch_json_records(spark, "http://api/x", record_path="records", fetcher=fake)
    assert sorted((r.id, r.v) for r in df.collect()) == [(1, "a"), (2, "b")]


def test_fetch_csv_gzip(spark):
    import gzip

    def fake(url, **kw):
        return gzip.compress(b"id,v\n1,x\n2,y\n")

    df = fetch_csv(spark, "http://api/file.csv.gz", fetcher=fake, gzipped=True)
    assert df.count() == 2


def test_paged_json(spark):
    pages = {1: [{"id": 1}], 2: [{"id": 2}], 3: []}

    def fake(url, **kw):
        page = int(url.rsplit("=", 1)[1])
        return json.dumps(pages[page]).encode()

    df = paged_json_records(spark, "http://api/items?page={page}", fetcher=fake)
    assert sorted(r.id for r in df.collect()) == [1, 2]


def test_multi_path_union(spark, tmp_path):
    for cat in ["a", "b"]:
        spark.createDataFrame([(cat, 1)], "cat string, v int").write.parquet(
            str(tmp_path / f"cat={cat}" / "sub")
        )
    paths = expand_path_combinations(str(tmp_path) + "/cat={c}/sub", c=["a", "b"])
    df = load_multi_paths(spark, paths)
    assert df.count() == 2
    assert "_source" in df.columns


def test_excel_gated(spark, tmp_path):
    # corrupt zip: loud failure, not silent empty frame
    (tmp_path / "f.xlsx").write_bytes(b"PK\x03\x04 not really xlsx")
    with pytest.raises(Exception):
        load_input(spark, {"path": str(tmp_path / "f.xlsx"), "type": "xlsx"})
    # legacy binary .xls stays gated without xlrd (xlsx_lite is zip-XML only)
    (tmp_path / "f.xls").write_bytes(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1 legacy")
    try:
        import xlrd  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="openpyxl/xlrd"):
            load_input(spark, {"path": str(tmp_path / "f.xls"), "type": "xls"})


def test_spark_submit_builder():
    cmd = build_spark_submit(
        {"job_name": "top_users", "registry": "conf/jobs.yml"},
        master="yarn",
        executor_memory="8g",
        num_executors=200,
        conf={"spark.sql.shuffle.partitions": "2000"},
        packages=["org.postgresql:postgresql:42.7.3"],
    )
    s = " ".join(cmd)
    assert s.startswith("spark-submit --master yarn")
    assert "--executor-memory 8g" in s
    assert "--conf spark.sql.shuffle.partitions=2000" in s
    # primary resource must be a FILE (spark-submit has no -m flag)
    assert "yaetos_spark/cli.py --job_name=top_users" in s
    assert " -m " not in s
