# -*- coding: utf-8 -*-
"""HTML report sink (S7): Jinja render of the collected aggregates.

Parity target: the information content of the reference's
``generate_report`` + ``src/templates/report_template.html`` (summary,
per-map counts, per-check counts with explanations, per-entity error
listing sorted by map/name — ``src/main.py:44-123``). The template here
is written fresh; only the *data* contract mirrors the reference.

Scale note: everything rendered is an aggregate or an error listing the
caller has already bounded (``max_rows``); the big verdict table itself
stays in the lake — the sink collects only the small frames.
"""

from __future__ import annotations

_TEMPLATE = """<!doctype html>
<html><head><meta charset="utf-8"><title>Serbian OSM lint report</title>
<style>
 body { font-family: sans-serif; margin: 2em; }
 table { border-collapse: collapse; margin-bottom: 2em; }
 td, th { border: 1px solid #999; padding: 4px 8px; text-align: left; }
 th { background: #eee; }
 .err { color: #a00; }
</style></head><body>
<h1>Serbian OSM lint report</h1>

<h2>Summary</h2>
<table>
<tr><th>maps</th><th>entities checked</th><th>errors</th><th>fixable errors</th></tr>
<tr><td>{{ summary.maps }}</td><td>{{ summary.count_total_checks }}</td>
<td>{{ summary.count_total_errors }}</td><td>{{ summary.count_total_fixable_errors }}</td></tr>
</table>

<h2>Per map</h2>
<table>
<tr><th>map</th><th>entities</th><th>errors</th><th>fixable</th></tr>
{% for c in countries %}
<tr><td>{{ c.map_name }}</td><td>{{ c.count_map_checks }}</td>
<td>{{ c.count_map_errors }}</td><td>{{ c.count_map_fixable_errors }}</td></tr>
{% endfor %}
</table>

<h2>Per check</h2>
<table>
<tr><th>check</th><th>explanation</th><th>evaluated</th><th>errors</th></tr>
{% for c in check_types %}
<tr><td>{{ c.check_name }}</td><td>{{ c.explanation }}</td>
<td>{{ c.count_total_checks }}</td><td>{{ c.count_total_errors }}</td></tr>
{% endfor %}
</table>

<h2>Errors ({{ errors|length }} shown)</h2>
<table>
<tr><th>map</th><th>entity</th><th>type</th><th>id</th><th>check</th><th>message</th><th>fixable</th></tr>
{% for e in errors %}
<tr class="err"><td>{{ e.overall_map }}</td><td>{{ e.display_name }}</td>
<td>{{ e.entity_type }}</td><td>{{ e.doc_id }}</td>
<td>{{ e.check_name }}</td><td>{{ e.message }}</td><td>{{ e.fixable }}</td></tr>
{% endfor %}
</table>
</body></html>
"""


def render_report(spark, verdicts, out_path: str, max_rows: int = 1000) -> str:
    """Collect the aggregates + a bounded error listing and render HTML."""
    from jinja2 import Environment

    from pyspark.sql import functions as F

    from .report import (
        merge_first_wins_df,
        per_check_report_df,
        per_map_report_df,
        summary_report_df,
    )

    summary = summary_report_df(verdicts).collect()[0].asDict()
    countries = [r.asDict() for r in per_map_report_df(verdicts).collect()]
    check_types = [r.asDict() for r in per_check_report_df(spark, verdicts).collect()]
    # entity listing sorted by display name within a map, like the
    # reference's OrderedDict(sorted(..., key=lambda c: c[1][0]))
    # (src/main.py:114-118); doc_id breaks display-name ties stably.
    errors = [
        r.asDict()
        for r in merge_first_wins_df(verdicts)
        .filter(F.col("result") == "CHECKED_ERROR")
        .orderBy("overall_map", "display_name", "doc_id", "check_name")
        .limit(max_rows)
        .collect()
    ]
    html = Environment().from_string(_TEMPLATE).render(
        summary=summary, countries=countries, check_types=check_types, errors=errors
    )
    with open(out_path, "w", encoding="utf-8") as fh:
        fh.write(html)
    return out_path
