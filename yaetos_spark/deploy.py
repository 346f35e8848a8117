"""Cluster launch — spark-submit command construction.

Behavior parity with the reference's minimal spark-submit path
(reference: yaetos/etl_utils.py:1282-1316 ``create_spark_submit``).
Cloud control planes (EMR/k8s/Airflow, reference: yaetos/deploy.py)
are orchestration, not engine — out of scope; this builder covers
submitting any registry job to a real cluster, which is where the
100 TB design actually runs.
"""

from __future__ import annotations


def build_spark_submit(
    job_args: dict,
    master: str = "yarn",
    deploy_mode: str = "client",
    executor_memory: str | None = None,
    executor_cores: int | None = None,
    num_executors: int | None = None,
    packages: list[str] | None = None,
    conf: dict | None = None,
    py_files: str | None = None,
    entry: str = "yaetos_spark/cli.py",
) -> list[str]:
    """Return the spark-submit argv for a registry job.

    ``job_args`` become ``--key=value`` CLI args for the launcher
    (job_name, registry, mode, ...). ``entry`` must be a primary
    resource FILE — spark-submit has no ``-m`` module flag — so the
    default is the cli script itself; ship the package alongside via
    ``py_files``.
    """
    cmd = ["spark-submit", "--master", master, "--deploy-mode", deploy_mode]
    if executor_memory:
        cmd += ["--executor-memory", executor_memory]
    if executor_cores:
        cmd += ["--executor-cores", str(executor_cores)]
    if num_executors:
        cmd += ["--num-executors", str(num_executors)]
    if packages:
        cmd += ["--packages", ",".join(packages)]
    for k, v in (conf or {}).items():
        cmd += ["--conf", f"{k}={v}"]
    if py_files:
        cmd += ["--py-files", py_files]
    cmd += entry.split()
    for k, v in job_args.items():
        cmd.append(f"--{k}={v}")
    return cmd


# JDBC connector coordinates for --packages, per source type
# (reference pins similar matrices in yaetos/etl_utils.py:50-55)
CONNECTOR_PACKAGES = {
    "mysql": "com.mysql:mysql-connector-j:8.4.0",
    "postgres": "org.postgresql:postgresql:42.7.3",
    "kafka": "org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0",
}
