"""Driver-side DB extractors — Hive and Salesforce → pandas → Spark.

Behavior parity: the reference extracts from niche sources through
driver-side python connectors returning pandas frames (reference:
yaetos/libs/python_db_connectors/query_hive.py:20-35,
query_salesforce.py:23-30), with credentials in a ConfigParser ``.cfg``
file. These are inherently driver-side (SOQL has no Spark datasource
here; pyhive speaks thrift) — so the contract is explicit: the RESULT
must be driver-sized; the Spark side starts at ``createDataFrame``.

Neither ``pyhive`` nor ``simple_salesforce`` ships in this image, so
both are import-gated; credential parsing and the pandas→Spark bridge
are the tested surface. For Hive at scale, prefer a real metastore +
``spark.table`` — this extractor exists for parity with thrift-only
deployments.
"""

from __future__ import annotations

from configparser import ConfigParser

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def read_credentials(creds_or_file, section: str) -> dict:
    """``conf/connections.cfg`` section → dict (reference:
    query_salesforce.py:7-19 ``connect`` credential handling)."""
    if isinstance(creds_or_file, ConfigParser):
        config = creds_or_file
    else:
        config = ConfigParser()
        read = config.read(creds_or_file)
        if not read:
            raise FileNotFoundError(f"credentials file not found: {creds_or_file}")
    return dict(config.items(section))


def query_hive(query_str: str, creds_section: str, creds_or_file="conf/connections.cfg") -> pd.DataFrame:
    """Hive thrift query → pandas (reference: query_hive.py:20-35)."""
    creds = read_credentials(creds_or_file, creds_section)
    try:
        from pyhive import hive
    except ImportError as exc:
        raise NotImplementedError("hive extraction requires pyhive") from exc
    conn = hive.Connection(
        host=creds["host"], port=int(creds.get("port", 10000)), username=creds.get("user")
    )
    try:
        cursor = conn.cursor()
        cursor.execute(query_str)
        columns = [col[0] for col in cursor.description]
        return pd.DataFrame.from_records(cursor.fetchall(), columns=columns)
    finally:
        conn.close()


def query_salesforce(query_str: str, creds_section: str, creds_or_file="conf/connections.cfg") -> pd.DataFrame:
    """SOQL → pandas (reference: query_salesforce.py:23-30); drops the
    per-record ``attributes`` envelope like the reference."""
    creds = read_credentials(creds_or_file, creds_section)
    try:
        from simple_salesforce import Salesforce
    except ImportError as exc:
        raise NotImplementedError("salesforce extraction requires simple_salesforce") from exc
    domain = None if creds.get("domain", "production") == "production" else creds["domain"]
    sf = Salesforce(
        username=creds["user"],
        password=creds["password"],
        security_token=creds["token"],
        domain=domain,
    )
    rows = sf.query_all(query_str)["records"]
    for row in rows:
        row.pop("attributes", None)
    return pd.DataFrame.from_dict(rows)


def to_spark(spark: SparkSession, pdf: pd.DataFrame, schema: str | None = None) -> DataFrame:
    """Driver-side extract → Spark DataFrame (Arrow-backed)."""
    return spark.createDataFrame(pdf, schema=schema) if schema else spark.createDataFrame(pdf)
