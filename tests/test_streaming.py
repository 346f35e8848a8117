import pytest
from pyspark.sql import functions as F

from yaetos_spark.sources.tables import load_table
from yaetos_spark.streaming.jobs import (
    incremental_file_stream,
    run_available_now,
    run_to_memory,
    windowed_counts,
)


@pytest.fixture()
def events_dir(spark, sf_dir, tmp_path):
    # re-materialize events (ns ts already normalized) as a stream source
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_src")
    ev.write.parquet(path)
    return path, ev.schema


def test_windowed_counts_stream(spark, events_dir):
    path, schema = events_dir
    stream = incremental_file_stream(spark, path, schema)
    assert stream.isStreaming
    agg = windowed_counts(stream, window="1 hour", watermark="2 hours")
    run_to_memory(agg, "win_counts", output_mode="complete")
    out = spark.sql("SELECT * FROM win_counts")
    assert out.count() > 0
    # batch equivalent must agree
    batch = (
        spark.read.schema(schema).parquet(path)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert out.agg(F.sum("n")).collect()[0][0] == batch.agg(F.sum("n")).collect()[0][0]


def test_available_now_incremental(spark, events_dir, tmp_path):
    path, schema = events_dir
    out_path = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    stream = incremental_file_stream(spark, path, schema).filter(F.col("event_type") == "click")
    run_available_now(stream, ckpt, out_path)
    n1 = spark.read.parquet(out_path).count()
    assert n1 > 0
    # second pass: no new files → no new rows (idempotent incremental)
    stream2 = incremental_file_stream(spark, path, schema).filter(F.col("event_type") == "click")
    run_available_now(stream2, ckpt, out_path)
    assert spark.read.parquet(out_path).count() == n1
