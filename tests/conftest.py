import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from serbian_osm_lint_spark.session import get_spark

    s = get_spark("tests", cpus=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_SMALL}/{name}.parquet'"
        )
    yield con
    con.close()


def make_docs(spark, rows):
    """Build a docs DF from [(doc_id, {tag: val}, (lat, lon) | None)] rows."""
    from serbian_osm_lint_spark.synth import TAG_KEYS

    data = []
    for doc_id, tags, geom in rows:
        spans = []
        for key in TAG_KEYS:
            if key in tags and tags[key] is not None:
                spans.append(("tag", f"{key}={tags[key]}", ""))
        extra = [k for k in tags if k not in TAG_KEYS and tags[k] is not None]
        for key in sorted(extra):
            spans.append(("tag", f"{key}={tags[key]}", ""))
        if geom is not None:
            spans.append(("geom", f"{geom[0]},{geom[1]}", ""))
        spans.append(("media", "", f"img/{doc_id}"))
        data.append((doc_id, [(k, t, m, i) for i, (k, t, m) in enumerate(spans)]))
    from serbian_osm_lint_spark.schema import DOCS_SCHEMA

    return spark.createDataFrame(data, DOCS_SCHEMA)


@pytest.fixture(scope="session")
def empty_dims(spark):
    wiki = spark.createDataFrame(
        [], "title string, has_box boolean, w_lat double, w_lon double, wikidata_q string"
    )
    wd = spark.createDataFrame([], "q_id string, label_sr string")
    return wiki, wd
