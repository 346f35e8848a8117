"""yaetos_spark — a PySpark-native declarative data-pipeline engine.

A from-scratch rebuild of the capabilities of arthurprevot/yaetos
(reference at /root/reference, studied for behavior only): a job model
with overridable ``transform()``, a YAML job registry with layered
parameter resolution, a dependency-DAG executor, incremental loading,
multi-format I/O dispatch, path templating, and data-quality
primitives — all expressed as idiomatic PySpark DataFrame/SQL plans so
Catalyst/Tungsten/AQE do the optimizing.

Beyond reference parity, ``yaetos_spark.operators`` adds large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) designed shuffle-aware for 100 TB scale.
"""

__version__ = "0.1.0"

from yaetos_spark.session import get_spark  # noqa: F401
from yaetos_spark.job import SparkJob  # noqa: F401
