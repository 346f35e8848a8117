"""The example notebook's code cells must actually run — the notebook
is documentation with an executable contract (reference parity:
notebooks/inspect_*.ipynb are runnable demos)."""

import json
import os


def test_inspect_pipeline_notebook_cells_execute(spark):
    nb_path = os.path.join(os.path.dirname(__file__), "..", "notebooks", "inspect_pipeline.ipynb")
    with open(nb_path) as f:
        nb = json.load(f)
    ns = {}
    for cell in nb["cells"]:
        if cell["cell_type"] != "code":
            continue
        exec("".join(cell["source"]), ns)  # noqa: S102 - executing our own doc
    # the loader pulled the upstream {{latest}} output...
    assert ns["dfs"]["per_type"].count() > 0
    # ...and the SQL-on-temp-view exploration produced rows
    assert ns["top"].count() > 0
