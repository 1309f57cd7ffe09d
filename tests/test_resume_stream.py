# -*- coding: utf-8 -*-
"""Resume semantics: kill after k partitions, resume, identical final
table, no double-processing; streaming AvailableNow idempotency."""

import os

import pytest

from conftest import SF_SMALL


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "out")


def _verdicts_fn(spark, docs_subset):
    from serbian_osm_lint_spark.operators.checks import lint_verdicts_df
    from serbian_osm_lint_spark.sources import catalog

    wiki, wd = catalog.dims_tables(spark, SF_SMALL)
    return lint_verdicts_df(spark, docs_subset, wiki, wd)


def test_resume_after_injected_failure(spark, out_dir):
    from serbian_osm_lint_spark.sources import catalog
    from serbian_osm_lint_spark.streaming import resume

    docs = catalog.docs_table(spark, SF_SMALL)

    # run 1: dies after 3 buckets
    with pytest.raises(RuntimeError, match="injected failure"):
        resume.run_resumable(spark, docs, _verdicts_fn, out_dir, n_buckets=8, fail_after=3)
    manifest = resume.BucketManifest(os.path.join(out_dir, "_manifest"))
    done_first = set(manifest.done_buckets())
    assert len(done_first) == 3

    # run 2: resumes; must process exactly the remaining 5 buckets
    processed = resume.run_resumable(spark, docs, _verdicts_fn, out_dir, n_buckets=8)
    assert processed == 5

    # final result == single-shot run
    resumed = {
        (r.doc_id, r.map_name, r.check_name, r.result, r.message, r.fixable)
        for r in resume.read_result(spark, out_dir).collect()
    }
    single = {
        (r.doc_id, r.map_name, r.check_name, r.result, r.message, r.fixable)
        for r in _verdicts_fn(spark, docs).collect()
    }
    assert resumed == single

    # run 3: nothing left to do (idempotency / no double-processing)
    assert resume.run_resumable(spark, docs, _verdicts_fn, out_dir, n_buckets=8) == 0

    # lineage metrics: per-bucket row counts sum to the total
    total = sum(m["rows"] for m in manifest.done_buckets().values())
    assert total == len(single)


def test_streaming_dedup_exact_first_wins(spark, tmp_path):
    """Streamed dropDuplicates(fingerprint) keeps exactly one doc per
    distinct text across micro-batches, matching the batch dedup's
    canonical set; a re-run from the checkpoint adds nothing."""
    from pyspark.sql import functions as F

    from serbian_osm_lint_spark.functions.text import fingerprint_col
    from serbian_osm_lint_spark.streaming import stream

    texts = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta"), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    texts_path = str(tmp_path / "texts")
    # two files => at least two micro-batches with maxFilesPerTrigger=1,
    # so the dup (doc 3) can arrive in a later batch than its original
    texts.filter(F.col("doc_id") <= 2).write.parquet(texts_path)
    texts.filter(F.col("doc_id") == 3).write.mode("append").parquet(texts_path)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    n1 = stream.stream_dedup_exact(spark, texts_path, out, ckpt)
    assert n1 >= 1
    got = spark.read.parquet(f"{out}/canonical")
    fps = [r.fp for r in got.collect()]
    assert len(fps) == 2 and len(set(fps)) == 2  # one row per distinct text

    want_fps = {
        r.fp
        for r in texts.select(fingerprint_col(F.col("text")).alias("fp")).distinct().collect()
    }
    assert set(fps) == want_fps

    # idempotent re-run: checkpoint remembers both progress AND dedup state
    n2 = stream.stream_dedup_exact(spark, texts_path, out, ckpt)
    assert n2 == 0
    assert spark.read.parquet(f"{out}/canonical").count() == 2


def test_streaming_available_now_idempotent(spark, tmp_path):
    from serbian_osm_lint_spark.sources import catalog
    from serbian_osm_lint_spark.streaming import stream

    docs = catalog.docs_table(spark, SF_SMALL)
    docs_path = str(tmp_path / "docs")
    docs.write.parquet(docs_path)
    wiki, wd = catalog.dims_tables(spark, SF_SMALL)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    n1 = stream.stream_lint_verdicts(spark, docs_path, out, ckpt, wiki, wd)
    assert n1 >= 1
    got = {
        (r.doc_id, r.map_name, r.check_name, r.result)
        for r in spark.read.parquet(os.path.join(out, "verdicts")).collect()
    }
    want = {
        (r.doc_id, r.map_name, r.check_name, r.result)
        for r in _verdicts_fn(spark, docs).collect()
    }
    assert got == want

    # second invocation: checkpoint says done -> zero new batches, no dupes
    n2 = stream.stream_lint_verdicts(spark, docs_path, out, ckpt, wiki, wd)
    assert n2 == 0
    again = spark.read.parquet(os.path.join(out, "verdicts")).count()
    assert again == len(want)
