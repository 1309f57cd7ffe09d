# -*- coding: utf-8 -*-
"""Events operators: streaming twin equals batch face; HTML report sink."""

import os

from conftest import SF_SMALL


def test_streaming_windowed_equals_batch(spark, tmp_path):
    from serbian_osm_lint_spark.operators import events

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "events")
    spark.read.parquet(f"{SF_SMALL}/events.parquet").write.parquet(src)
    events.stream_events_windowed(spark, src, out, ckpt)
    streamed = {
        (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
        for r in events.events_windowed_df(spark, SF_SMALL).collect()
    }
    # append mode emits only watermark-closed windows; the final window(s)
    # may be withheld — everything emitted must match batch exactly, and
    # nearly all windows must have been emitted.
    assert len(streamed) > 0
    for k, v in streamed.items():
        assert batch[k] == v, k
    assert len(streamed) >= len(batch) - 10


def test_sessionize_sane(spark):
    from serbian_osm_lint_spark.operators import events

    rows = events.sessionize_df(spark, SF_SMALL).collect()
    assert len(rows) > 0
    total_events = spark.read.parquet(f"{SF_SMALL}/events.parquet").count()
    assert sum(r.n_events for r in rows) == total_events
    for r in rows:
        assert 1 <= r.n_sessions <= r.n_events


def test_html_report_sink(spark, tmp_path):
    from serbian_osm_lint_spark.operators.report_html import render_report
    from serbian_osm_lint_spark.plans import lint_pipeline

    verdicts = lint_pipeline.build_verdicts(spark, SF_SMALL)
    path = render_report(spark, verdicts, str(tmp_path / "report.html"), max_rows=50)
    html = open(path, encoding="utf-8").read()
    assert "Serbian OSM lint report" in html
    assert "Serbia checks (synth)" in html
    assert "checks.NameMissingCheck" in html
    assert html.count('class="err"') == 50  # bounded error listing
    assert os.path.getsize(path) < 200_000  # sink collects aggregates, not the table
