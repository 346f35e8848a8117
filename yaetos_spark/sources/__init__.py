from yaetos_spark.sources.readers import load_input  # noqa: F401
from yaetos_spark.sources.writers import save_output  # noqa: F401
