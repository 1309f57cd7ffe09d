# -*- coding: utf-8 -*-
"""cached_table atomicity (VERDICT r6 item 5): concurrent builders of the
same key must elect ONE builder (O_EXCL lockfile); the other reads a
COMPLETE table (atomic temp-dir rename — a reader can never scan a
half-written table); crashed-builder debris is cleaned up, not served."""

import os
import threading

import pytest


@pytest.fixture()
def cache_root(tmp_path, monkeypatch):
    root = str(tmp_path / "cache")
    monkeypatch.setenv("SPARK_GRAFT_CACHE", root)
    return root


def test_concurrent_builders_build_once_read_complete(spark, cache_root):
    from serbian_osm_lint_spark.sources import catalog

    builds = []
    build_lock = threading.Lock()

    def build_df():
        with build_lock:
            builds.append(threading.get_ident())
        # a non-trivial build: slow enough that the loser's wait path runs
        return spark.range(1000).selectExpr("id", "id * 2 AS v")

    counts = []
    errors = []

    def worker():
        try:
            df = catalog.cached_table(spark, "race_key", build_df)
            counts.append(df.count())
        except Exception as e:  # pragma: no cover - surfaced via assert
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert errors == []
    assert len(builds) == 1, f"expected exactly one build, got {len(builds)}"
    assert counts == [1000] * 4
    # no leftover lock or temp dirs
    assert not os.path.exists(os.path.join(cache_root, "race_key.lock"))
    assert [d for d in os.listdir(cache_root) if ".tmp." in d] == []


def test_stale_partial_table_is_rebuilt_not_served(spark, cache_root):
    """A directory left by a crashed pre-atomic writer (data files, no
    _SUCCESS) is debris: the next call rebuilds and atomically replaces
    it instead of reading half a table."""
    from serbian_osm_lint_spark.sources import catalog

    path = os.path.join(cache_root, "stale_key")
    # fake a partial write: parquet bytes from a different, smaller table
    spark.range(3).write.parquet(path)
    os.remove(os.path.join(path, "_SUCCESS"))  # crashed before commit

    df = catalog.cached_table(
        spark, "stale_key", lambda: spark.range(50).selectExpr("id")
    )
    assert df.count() == 50
    assert os.path.exists(os.path.join(path, "_SUCCESS"))


def test_waiter_times_out_on_orphaned_lock(spark, cache_root):
    from serbian_osm_lint_spark.sources import catalog

    os.makedirs(cache_root, exist_ok=True)
    with open(os.path.join(cache_root, "orphan_key.lock"), "w") as fh:
        fh.write("99999999")  # no such builder alive
    with pytest.raises(TimeoutError, match="stale"):
        catalog.cached_table(
            spark,
            "orphan_key",
            lambda: spark.range(1),
            wait_timeout_s=0.3,
        )
