"""Generic JDBC source/sink with incremental predicate pushdown.

Behavior parity: the reference reads MySQL/ClickHouse over JDBC with an
incremental ``query`` pushdown (``inc_field >= period AND < period_next``),
``fetchsize`` 10000 and ``numPartitions`` 3 (reference:
yaetos/etl_utils.py:504-577), and writes Redshift/ClickHouse/Oracle via
connector or chunked to_sql (reference: yaetos/redshift_spark.py:7-31,
yaetos/clickhouse.py:7-28, yaetos/oracle.py:8-20).

Here both directions are the one Spark JDBC datasource. No DB drivers
ship in this container, so these functions build the reader/writer but
only touch the network when invoked against a real URL — unit tests
cover option construction via ``build_read_options``.

Scale notes: a single-query JDBC read is one partition — fine for dim
tables, wrong for facts. ``partition_column``/``num_partitions``/
``lower_bound``/``upper_bound`` enable Spark's range-splitting parallel
read; the incremental predicate is pushed into the remote query so the
DB scans only the period slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_DRIVERS = {
    "mysql": "com.mysql.cj.jdbc.Driver",
    "postgres": "org.postgresql.Driver",
    "clickhouse": "org.postgresql.Driver",  # reference uses pg wire protocol for CH
    "oracle": "oracle.jdbc.driver.OracleDriver",
    "redshift": "com.amazon.redshift.jdbc42.Driver",
}


def build_read_options(spec: dict) -> dict:
    """Pure option-builder (unit-testable without a DB)."""
    itype = spec.get("type", "jdbc")
    opts = {
        "url": spec["url"],
        "fetchsize": str(spec.get("fetchsize", 10000)),
        "numPartitions": str(spec.get("num_partitions", 3)),
    }
    driver = spec.get("driver") or _DRIVERS.get(itype)
    if driver:
        opts["driver"] = driver
    if spec.get("user"):
        opts["user"] = spec["user"]
    if spec.get("password") is not None:
        opts["password"] = spec["password"]

    inc_field = spec.get("inc_field")
    table = spec.get("db_table") or spec.get("dbtable")
    if inc_field and spec.get("period") is not None:
        period, period_next = spec["period"], spec.get("period_next")
        if period_next is not None:
            pred = f"{inc_field} >= '{period}' AND {inc_field} < '{period_next}'"
        else:
            pred = f"{inc_field} = '{period}'"
        opts["query"] = f"SELECT * FROM {table} WHERE {pred}"
    elif spec.get("query"):
        opts["query"] = spec["query"]
    else:
        opts["dbtable"] = table

    # range-split parallel read for big tables
    if spec.get("partition_column"):
        opts["partitionColumn"] = spec["partition_column"]
        opts["lowerBound"] = str(spec["lower_bound"])
        opts["upperBound"] = str(spec["upper_bound"])
    if spec.get("custom_schema"):
        opts["customSchema"] = spec["custom_schema"]
    return opts


def load_jdbc(spark: SparkSession, spec: dict) -> DataFrame:
    return spark.read.format("jdbc").options(**build_read_options(spec)).load()


def save_jdbc(df: DataFrame, spec: dict) -> None:
    """JDBC write (replaces the reference's chunked pandas to_sql copies)."""
    opts = {
        "url": spec["url"],
        "dbtable": spec.get("db_table") or spec["dbtable"],
        "batchsize": str(spec.get("batchsize", 10000)),
    }
    driver = spec.get("driver") or _DRIVERS.get(spec.get("type", "jdbc"))
    if driver:
        opts["driver"] = driver
    if spec.get("user"):
        opts["user"] = spec["user"]
    if spec.get("password") is not None:
        opts["password"] = spec["password"]
    mode = "append" if spec.get("incremental") else spec.get("mode", "overwrite")
    df.write.format("jdbc").options(**opts).mode(mode).save()
