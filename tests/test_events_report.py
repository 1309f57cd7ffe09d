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


def test_streaming_windowed_contract_needs_ordered_arrivals(spark, tmp_path):
    """VERDICT r6 item 7 — the windowed face's ordering contract, stated
    negatively: arrivals that violate event-time order ACROSS invocations
    (newer slice first) land beyond the checkpointed watermark and are
    DROPPED — visible as loss (emitted counts strictly below batch),
    never as corruption (no emitted window ever exceeds its batch count,
    and closed windows are never re-emitted with double counts). Within
    the ordered-arrival contract the face is exact
    (test_streaming_windowed_equals_batch)."""
    from pyspark.sql import functions as F

    from serbian_osm_lint_spark.operators import events

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    cutoff = "2024-01-15"
    src = str(tmp_path / "events")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # REVERSED arrival: the newer half first, the older half second
    ev.filter(F.col("ts") >= cutoff).coalesce(1).write.mode("append").parquet(src)
    events.stream_events_windowed(spark, src, out, ckpt)
    ev.filter(F.col("ts") < cutoff).coalesce(1).write.mode("append").parquet(src)
    events.stream_events_windowed(spark, src, out, ckpt)

    streamed = {
        (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
        for r in events.events_windowed_df(spark, SF_SMALL).collect()
    }
    assert len(streamed) > 0
    # no corruption: every emitted window is a (possibly partial) subset
    # of its batch twin — late data is dropped, never double-counted
    for k, (n, _s) in streamed.items():
        assert k in batch and n <= batch[k][0], k
    # and the disorder is VISIBLE as loss: the older half's events are
    # beyond the watermark, so total emitted events fall short of batch
    assert sum(n for n, _ in streamed.values()) < sum(n for n, _ in batch.values())


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


def test_asof_join_semantics(spark, tmp_path):
    """Each click is enriched with the latest view at-or-before it, per
    user: equal-ts view matches (inclusive), later views don't, users
    without a prior view get NULLs, and timestamp ties on the right are
    broken deterministically (max event_id)."""
    from serbian_osm_lint_spark.operators import events

    rows = [
        # (event_id, ts, user_id, event_type, value)
        (1, "2024-01-01 10:00:00", 1, "view", 10.0),
        (2, "2024-01-01 10:05:00", 1, "click", 1.0),   # -> view 1
        (3, "2024-01-01 10:06:00", 1, "view", 20.0),
        (4, "2024-01-01 10:06:00", 1, "view", 30.0),   # tie: id 4 wins
        (5, "2024-01-01 10:06:00", 1, "click", 2.0),   # equal-ts -> view 4
        (6, "2024-01-01 10:07:00", 1, "click", 3.0),   # -> view 4
        (7, "2024-01-01 09:00:00", 2, "click", 4.0),   # no prior view -> NULLs
        (8, "2024-01-01 09:30:00", 2, "view", 40.0),
    ]
    df = spark.createDataFrame(
        [(i, t, u, e, v, "{}") for i, t, u, e, v in rows],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type", "value", "props")
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)

    got = {
        r.event_id: (r.asof_event_id, r.asof_value)
        for r in events.asof_join_df(spark, str(tmp_path)).collect()
    }
    assert got == {
        2: (1, 10.0),
        5: (4, 30.0),
        6: (4, 30.0),
        7: (None, None),
    }


def test_asof_join_oracle_parity(spark):
    """Union+window merge ≡ DuckDB's native ASOF LEFT JOIN at sf0.001."""
    import duckdb

    from serbian_osm_lint_spark.operators import events

    sp = (
        events.asof_join_df(spark, SF_SMALL)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(sp) > 0 and sp["asof_event_id"].notna().any()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_SMALL}/events.parquet'")
    du = (
        con.execute(events.sql_asof_join())
        .df()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con.close()
    cols = sorted(sp.columns)
    assert cols == sorted(du.columns)
    assert sp[cols].astype(str).equals(du[cols].astype(str))


def test_range_join_semantics_and_parity(spark):
    """Binned equi-join + exact filter finds every |dt| <= delta pair
    exactly once (incl. cross-bin pairs), matching the straight range
    predicate in DuckDB at sf0.001."""
    import duckdb

    from serbian_osm_lint_spark.operators import events

    sp = events.range_join_df(spark, SF_SMALL).toPandas()
    assert len(sp) > 0
    assert not sp.duplicated(["event_id_l", "event_id_r"]).any()  # no bin double-count
    assert (sp["dt_s"].abs() <= 300).all()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_SMALL}/events.parquet'")
    du = con.execute(events.sql_range_join()).df()
    con.close()
    cols = sorted(sp.columns)
    key = ["event_id_l", "event_id_r"]
    sp = sp[cols].sort_values(key).reset_index(drop=True)
    du = du[cols].sort_values(key).reset_index(drop=True)
    assert sp.astype(str).equals(du.astype(str))
