import datetime as dt
import os

import pytest

from yaetos_spark.plans import incremental as inc
from yaetos_spark.plans import params as P
from yaetos_spark.plans import paths as PH
from yaetos_spark.plans.flow import execution_order
from yaetos_spark.plans.registry import Registry


def test_now_stamp_format():
    s = PH.now_stamp(dt.datetime(2024, 3, 5, 7, 9, 11, tzinfo=dt.timezone.utc))
    assert s == "date20240305_time070911_utc"


def test_expand_latest_and_now(tmp_path):
    for d in ["date20240101_time000000_utc", "date20240301_time120000_utc"]:
        os.makedirs(tmp_path / "out" / d)
    p = PH.expand_latest(str(tmp_path / "out" / "{{latest}}" / "data"))
    assert p.endswith("date20240301_time120000_utc/data")
    now = dt.datetime(2024, 5, 1, tzinfo=dt.timezone.utc)
    assert "date20240501_time000000_utc" in PH.expand_now("x/{{now}}/y", now)


def test_expand_path_params(tmp_path):
    os.makedirs(tmp_path / "base" / "v1")
    out = PH.expand_path(
        "{{base_path}}/{{latest}}/file", {"base_path": str(tmp_path / "base")}
    )
    assert out == f"{tmp_path}/base/v1/file"


def test_s3_rewrite():
    assert PH.to_spark_path("s3://bucket/k") == "s3a://bucket/k"
    assert PH.is_s3_path("s3a://b/k")


def test_merge_params_layering():
    merged = P.merge_params(
        yml_common={"base_path": "/common", "x": 1},
        mode_specific={"base_path": "/mode"},
        job_yml={"inputs": {"a": {"path": "p1", "type": "csv"}}, "x": 2},
        job_args={"inputs": {"a": {"type": "parquet"}}},
        cmd_args={"y": "z"},
    )
    assert merged["base_path"] == "/mode"
    assert merged["x"] == 2
    assert merged["y"] == "z"
    # dict-merge at input level: path survives, type overridden
    assert merged["inputs"]["a"] == {"path": "p1", "type": "parquet"}


def test_is_incremental_detection():
    assert P.merge_params(job_yml={"inputs": {"a": {"inc_field": "ts"}}})["is_incremental"]
    assert not P.merge_params(job_yml={"inputs": {"a": {"path": "x"}}})["is_incremental"]


def test_replace_placeholders_recursive():
    params = {
        "base": "/data",
        "sub": "{{base}}/stage",
        "inputs": {"a": {"path": "{{sub}}/a/{{latest}}"}},
    }
    out = P.replace_placeholders(params)
    # {{latest}} is preserved for path-expansion time
    assert out["inputs"]["a"]["path"] == "/data/stage/a/{{latest}}"


def test_registry_and_flow(tmp_path):
    yml = tmp_path / "jobs.yml"
    yml.write_text(
        """
common_params:
  all_mode_params:
    base_path: /tmp/data
    mode: dev
  mode_specific_params:
    prod:
      base_path: /prod/data
jobs:
  a: {output: {path: '{{base_path}}/a'}}
  b: {dependencies: [a], output: {path: '{{base_path}}/b'}}
  c: {dependencies: [a, b]}
"""
    )
    reg = Registry.from_file(str(yml))
    assert reg.job_params("a")["output"]["path"] == "/tmp/data/a"
    assert reg.job_params("a", mode="prod")["output"]["path"] == "/prod/data/a"
    order = execution_order(reg, "c")
    assert order.index("a") < order.index("b") < order.index("c")


def test_periods():
    ps = inc.get_periods("2024-01-30", dt.date(2024, 2, 2))
    assert ps == ["2024-01-30", "2024-01-31", "2024-02-01", "2024-02-02"]


def test_filter_incremental_inputs(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-02 10:00:00"), (3, "2024-01-03 10:00:00")],
        "id int, ts string",
    ).selectExpr("id", "cast(ts as timestamp) as ts")
    out = inc.filter_incremental_inputs({"t": df}, {"t": {"inc_field": "ts"}}, period="2024-01-02")
    assert [r.id for r in out["t"].collect()] == [2]
    out2 = inc.filter_incremental_inputs(
        {"t": df}, {"t": {"inc_field": "ts"}}, min_exclusive="2024-01-01 10:00:00"
    )
    assert sorted(r.id for r in out2["t"].collect()) == [2, 3]


def test_output_max_timestamp(spark, tmp_path):
    df = spark.createDataFrame([(1, "2024-01-05")], "id int, d string")
    path = str(tmp_path / "out")
    df.write.parquet(path)
    assert inc.get_output_max_timestamp(spark, path, "d") == "2024-01-05"
    assert inc.get_output_max_timestamp(spark, str(tmp_path / "missing"), "d") is None
