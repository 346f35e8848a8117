"""Generic HTML report job — the dashboards story without a
dashboarding dependency.

Behavior parity with the reference's dashboard role (reference:
dashboards/wikipedia_demo_dashboard.ipynb — InputLoader inputs
rendered for humans; it uses the 'panel' library, absent from this
image): this job renders any registry input as a static HTML page —
row count, schema, and a sample table — using only the stdlib, so it
runs anywhere the engine runs.

Params: ``report_path`` (where to write the .html), ``sample_rows``
(table size, default 20), optional ``title``.

Scale: the ONLY driver-side materialization is ``limit(sample_rows)``
+ a count — never a full collect; safe at any input size.
"""

from __future__ import annotations

import html

from yaetos_spark.job import SparkJob


def render_html(title: str, n_rows: int, schema_ddl: str, columns, rows) -> str:
    head = "".join(f"<th>{html.escape(str(c))}</th>" for c in columns)
    body = "".join(
        "<tr>" + "".join(f"<td>{html.escape(str(v))}</td>" for v in row) + "</tr>"
        for row in rows
    )
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{html.escape(title)}</title>"
        "<style>body{font-family:sans-serif;margin:2em}"
        "table{border-collapse:collapse}td,th{border:1px solid #999;"
        "padding:4px 8px;text-align:left}</style></head><body>"
        f"<h1>{html.escape(title)}</h1>"
        f"<p>{n_rows} rows &middot; schema: <code>{html.escape(schema_ddl)}</code></p>"
        f"<table><thead><tr>{head}</tr></thead><tbody>{body}</tbody></table>"
        "</body></html>"
    )


class ReportJob(SparkJob):
    def transform(self, **dfs):
        name, df = next(iter(dfs.items()))
        sample_n = int(self.params.get("sample_rows", 20))
        title = self.params.get("title", f"Report: {name}")
        sample = df.limit(sample_n).collect()
        page = render_html(
            title,
            n_rows=df.count(),
            schema_ddl=", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema),
            columns=df.columns,
            rows=[tuple(r) for r in sample],
        )
        out = self.params.get("report_path", "report.html")
        with open(out, "w") as f:
            f.write(page)
        return df.limit(sample_n)
