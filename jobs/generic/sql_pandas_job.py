"""SQL-file job executed on the PANDAS engine via DuckDB.

Behavior parity with the reference's sql_pandas job (reference:
jobs/generic/sql_pandas_job.py:1-14, yaetos/sql_pandas_job.py:4-14):
the same registry shape as the Spark SQL-file job (``sql_file`` +
``----param----`` header lines), but the query runs on pandas frames
through DuckDB instead of Spark — for small edge datasets where a JVM
round-trip is pure overhead.  Inputs are registered as DuckDB views
named by their registry keys (mirroring the Spark path's temp views);
the result converts back to a Spark DataFrame for the standard
quality-gate + save path.

Small-data contract, like PandasJob: ``toPandas()`` collects to the
driver by design.  The distributed path is SqlJob (Spark SQL).
"""

from __future__ import annotations

from yaetos_spark.job import SqlJob, strip_param_lines


class SqlPandasJob(SqlJob):
    def transform(self, **dfs):
        sql = self.params.get("sql") or strip_param_lines(open(self.sql_file).read())
        # Arrow, not pandas: an EMPTY result keeps its column types
        # (pandas object-dtype strings would make createDataFrame raise
        # CANNOT_INFER_EMPTY_SCHEMA on zero-row filters)
        out = self._run_duckdb(sql, dfs, as_arrow=True)
        return self.spark.createDataFrame(out)
