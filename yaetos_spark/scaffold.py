"""Project scaffolding — `python -m yaetos_spark.cli new <dir>`.

Behavior parity with the reference's bootstrap flow (reference:
yaetos/scripts/yaetos_cmdline.py:64-70 `setup` subcommand +
yaetos/scripts/copy/* starter files): a new user points the CLI at an
empty folder and gets a runnable project — job registry, one SQL job,
one python job chained on it, sample data, tests, README — so the
first `--job_name=...` run works with zero extra wiring.

Templates are authored fresh for this engine's registry/job surface
(not copies of the reference's starter files).
"""

from __future__ import annotations

import os

_JOBS_YML = """\
# Job registry for {name} (see README.md).
common_params:
  all_mode_params:
    base_path: ./output
    mode: dev_local
  mode_specific_params:
    prod:
      base_path: s3://CHANGE-ME/pipelines

jobs:
  events_per_type:
    sql_file: conf/sql/events_per_type.sql
    inputs:
      events: {{path: data/sample_events.csv, type: csv}}
    output: {{path: '{{{{base_path}}}}/events_per_type/{{{{now}}}}', type: parquet}}

  top_users:
    py_job: 'jobs.top_users_job'
    dependencies: [events_per_type]
    inputs:
      per_type: {{path: '{{{{base_path}}}}/events_per_type/{{{{latest}}}}', type: parquet, from: events_per_type}}
    output: {{path: '{{{{base_path}}}}/top_users/{{{{now}}}}', type: parquet}}
"""

_SQL_JOB = """\
----param---- 'repartition': 1 ----
SELECT event_type, user_id, count(*) AS n
FROM events
GROUP BY event_type, user_id
"""

_PY_JOB = '''\
"""Example python job: top users by event count, chained on the
events_per_type SQL job via the registry's `dependencies`."""

from pyspark.sql import functions as F

from yaetos_spark.job import SparkJob


class TopUsersJob(SparkJob):
    def transform(self, per_type):
        return (
            per_type.groupBy("user_id")
            .agg(F.sum("n").alias("total_events"))
            .orderBy(F.desc("total_events"), F.asc("user_id"))
            .limit(10)
        )
'''

_SAMPLE_CSV = """\
user_id,event_type,ts,value
1,click,2024-01-01 10:00:00,0.5
1,view,2024-01-01 10:01:00,1.0
2,click,2024-01-01 10:02:00,0.25
2,click,2024-01-01 10:03:00,0.75
3,purchase,2024-01-01 10:04:00,9.99
3,view,2024-01-01 10:05:00,0.0
1,click,2024-01-01 10:06:00,0.1
"""

_CONFTEST = '''\
import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .appName("project-tests")
        .getOrCreate()
    )
'''

_TEST = '''\
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs.top_users_job import TopUsersJob


def test_top_users_transform(spark):
    per_type = spark.createDataFrame(
        [("click", 1, 3), ("view", 1, 1), ("click", 2, 5)],
        "event_type string, user_id long, n long",
    )
    out = TopUsersJob({}).transform(per_type)
    rows = [(r.user_id, r.total_events) for r in out.collect()]
    assert rows == [(2, 5), (1, 4)]
'''

_README = """\
# {name}

A data-pipeline project scaffolded by `yaetos_spark`.

## Layout

- `conf/jobs.yml` — job registry: inputs, outputs, dependencies, params.
- `conf/sql/` — SQL jobs (inputs auto-registered as temp views).
- `jobs/` — python jobs (subclass `SparkJob`, implement `transform`).
- `data/` — sample input so the starter jobs run out of the box.
- `tests/` — pytest suite with a local SparkSession fixture.

## Run

    python -m yaetos_spark.cli --job_name=events_per_type --registry=conf/jobs.yml
    python -m yaetos_spark.cli --job_name=top_users --registry=conf/jobs.yml --dependencies

## Test

    python -m pytest tests/ -q
"""

_GITIGNORE = """\
__pycache__/
*.pyc
output/
spark-warehouse/
.pytest_cache/
"""

_REQUIREMENTS = """\
pyspark>=3.5
pyarrow
pandas
pytest
"""


def scaffold_project(dest: str, project_name: str | None = None) -> list[str]:
    """Write the starter tree into ``dest`` (created if missing).
    Returns the list of files written. Refuses to overwrite existing
    files — a second run on the same dir is a no-op for present files."""
    name = project_name or os.path.basename(os.path.abspath(dest)) or "my_pipelines"
    files = {
        "conf/jobs.yml": _JOBS_YML.format(name=name),
        "conf/sql/events_per_type.sql": _SQL_JOB,
        "jobs/__init__.py": "",
        "jobs/top_users_job.py": _PY_JOB,
        "data/sample_events.csv": _SAMPLE_CSV,
        "tests/conftest.py": _CONFTEST,
        "tests/test_top_users_job.py": _TEST,
        "README.md": _README.format(name=name),
        ".gitignore": _GITIGNORE,
        "requirements.txt": _REQUIREMENTS,
    }
    written = []
    for rel, content in files.items():
        path = os.path.join(dest, rel)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        if os.path.exists(path):
            continue
        with open(path, "w") as f:
            f.write(content)
        written.append(path)
    return written
