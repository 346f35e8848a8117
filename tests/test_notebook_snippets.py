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


def test_demo_dashboard_notebook_cells_execute(spark):
    """The dashboard demo (reference parity:
    dashboards/wikipedia_demo_dashboard.ipynb) must run end-to-end:
    upstream job → InputLoader over {{latest}} → rendered dashboard."""
    nb_path = os.path.join(
        os.path.dirname(__file__), "..", "dashboards", "demo_dashboard.ipynb"
    )
    with open(nb_path) as f:
        nb = json.load(f)
    ns = {}
    for cell in nb["cells"]:
        if cell["cell_type"] != "code":
            continue
        exec("".join(cell["source"]), ns)  # noqa: S102 - executing our own doc
    assert ns["kpis"]["events"] > 0
    assert ns["by_type"].count() > 0
    # panel is absent from this image → the stdlib path wrote the page
    page = open(ns["dash_path"]).read()
    assert "<h1>Demo Dashboard</h1>" in page
    assert "Events by type" in page and "<table>" in page
