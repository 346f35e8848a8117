import os

import pytest

from yaetos_spark.sources.jdbc import build_read_options
from yaetos_spark.sources.kafka import build_kafka_frame
from yaetos_spark.sources.readers import load_input
from yaetos_spark.sources.writers import save_output


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id int, v string")
    save_output(df, {"path": str(tmp_path / "c"), "type": "csv"})
    back = load_input(spark, {"path": str(tmp_path / "c"), "type": "csv"})
    assert sorted((r.id, r.v) for r in back.collect()) == [(1, "x"), (2, "y")]


def test_csv_delimiter_and_schema(spark, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("id|v\n1|x\n")
    back = load_input(
        spark, {"path": str(p), "type": "csv", "csv_delimiter": "|", "schema": "id int, v string"}
    )
    assert back.collect()[0].id == 1


def test_json_and_txt(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], "id int, v string")
    save_output(df, {"path": str(tmp_path / "j"), "type": "json"})
    back = load_input(spark, {"path": str(tmp_path / "j"), "type": "json"})
    assert back.collect()[0].v == "x"
    (tmp_path / "t.txt").write_text("hello\nworld\n")
    txt = load_input(spark, {"path": str(tmp_path / "t.txt"), "type": "txt"})
    assert txt.count() == 2 and txt.columns == ["value"]


def test_source_column(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "id int")
    save_output(df, {"path": str(tmp_path / "s"), "type": "parquet"})
    back = load_input(spark, {"path": str(tmp_path / "s"), "type": "parquet", "add_source_column": True})
    assert "_source" in back.columns
    assert back.collect()[0]._source.startswith("file:")


def test_in_memory_input(spark):
    df = spark.createDataFrame([(1,)], "id int")
    out = load_input(spark, {"type": "df", "from": "up"}, loaded_inputs={"up": df})
    assert out is df


def test_write_mode_policy_error_on_existing(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "id int")
    save_output(df, {"path": str(tmp_path / "p"), "type": "parquet"})
    with pytest.raises(Exception):
        save_output(df, {"path": str(tmp_path / "p"), "type": "parquet"})
    # partitioned output defaults to append
    save_output(df.withColumn("dt", df.id), {"path": str(tmp_path / "q"), "type": "parquet", "partition_by": "dt"})
    save_output(df.withColumn("dt", df.id), {"path": str(tmp_path / "q"), "type": "parquet", "partition_by": "dt"})
    assert spark.read.parquet(str(tmp_path / "q")).count() == 2


def test_partitioned_layout(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, dt string")
    save_output(df, {"path": str(tmp_path / "part"), "type": "parquet", "partition_by": ["dt"]})
    assert os.path.isdir(tmp_path / "part" / "dt=a")


def test_metadata_sidecar(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "id int")
    save_output(df, {"path": str(tmp_path / "m"), "type": "parquet", "save_metadata": True}, job_name="j1")
    content = (tmp_path / "m" / "_metadata.txt").read_text()
    assert "job_name: j1" in content


def test_no_output_job(spark):
    df = spark.createDataFrame([(1,)], "id int")
    save_output(df, {"type": "None"})  # no-op, no path needed


def test_repartition_coalesce(spark, tmp_path):
    df = spark.createDataFrame([(i,) for i in range(100)], "id int").repartition(8)
    save_output(df, {"path": str(tmp_path / "r"), "type": "parquet", "repartition": 2})
    files = [f for f in os.listdir(tmp_path / "r") if f.endswith(".parquet")]
    assert len(files) == 2


def test_jdbc_incremental_pushdown():
    opts = build_read_options(
        {
            "type": "mysql",
            "url": "jdbc:mysql://h/db",
            "db_table": "t",
            "inc_field": "ts",
            "period": "2024-01-01",
            "period_next": "2024-01-02",
        }
    )
    assert opts["query"] == "SELECT * FROM t WHERE ts >= '2024-01-01' AND ts < '2024-01-02'"
    assert opts["fetchsize"] == "10000" and opts["numPartitions"] == "3"
    assert opts["driver"] == "com.mysql.cj.jdbc.Driver"


def test_jdbc_range_split():
    opts = build_read_options(
        {
            "type": "postgres",
            "url": "jdbc:postgresql://h/db",
            "db_table": "big",
            "partition_column": "id",
            "lower_bound": 0,
            "upper_bound": 1000000,
            "num_partitions": 16,
        }
    )
    assert opts["partitionColumn"] == "id" and opts["numPartitions"] == "16"
    assert opts["dbtable"] == "big"


def test_kafka_frame(spark):
    df = spark.createDataFrame([(1, "x")], "id int, v string")
    out = build_kafka_frame(df, key_col="id")
    row = out.collect()[0]
    assert row.key == "1" and '"v":"x"' in row.value
