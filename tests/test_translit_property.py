# -*- coding: utf-8 -*-
"""Property-based transliteration parity: for arbitrary strings over the
relevant alphabets, the Spark Column face and the DuckDB SQL face must
agree with the plain-Python reference implementation char-for-char.

Spark jobs per example would be too slow — the property drives the python
face against DuckDB per example, and a single batched Spark job checks
the full drawn corpus at the end of each test.
"""

import duckdb
from hypothesis import given, settings, strategies as st

from serbian_osm_lint_spark.functions import translit as tr

ALPHABET = (
    "".join(tr.CYR_TO_LAT.keys())
    + "".join(set("".join(tr.CYR_TO_LAT.values())))
    + "abcdefghijklmnopqrstuvwxyz ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 .,-'"
)
texts = st.text(alphabet=ALPHABET, max_size=40)

_con = duckdb.connect()


@settings(max_examples=200, deadline=None)
@given(texts)
def test_cyr2lat_sql_face_matches_python(s):
    got = _con.execute("SELECT " + tr.sql_cyr2lat("?::VARCHAR"), [s]).fetchone()[0]
    assert got == tr.cyr2lat_py(s)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_lat2cyr_sql_face_matches_python(s):
    got = _con.execute("SELECT " + tr.sql_lat2cyr("?::VARCHAR"), [s]).fetchone()[0]
    assert got == tr.lat2cyr_py(s)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_cyrillic_detect_and_romanize_sql(s):
    got = _con.execute("SELECT " + tr.sql_has_cyrillic("?::VARCHAR"), [s]).fetchone()[0]
    assert bool(got) == tr.has_cyrillic_py(s)
    got_r = _con.execute("SELECT " + tr.sql_romanize("?::VARCHAR"), [s]).fetchone()[0]
    assert got_r == tr.romanize_py(s)


@settings(max_examples=50, deadline=None)
@given(texts)
def test_cyr2lat_idempotent_on_latin(s):
    """cyr2lat output never contains Cyrillic, so it is a fixpoint."""
    once = tr.cyr2lat_py(s)
    assert not tr.has_cyrillic_py(once)
    assert tr.cyr2lat_py(once) == once


def test_spark_faces_on_drawn_corpus(spark):
    """One batched Spark job over a deterministic sample of the alphabet
    (hypothesis examples above already cover python↔SQL)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(42)
    corpus = [
        "".join(rng.choice(ALPHABET) for _ in range(rng.randrange(0, 40)))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(s,) for s in corpus], "s string")
    rows = df.select(
        "s",
        tr.cyr2lat_col(F.col("s")).alias("c2l"),
        tr.lat2cyr_col(F.col("s")).alias("l2c"),
        tr.romanize_col(F.col("s")).alias("rom"),
        tr.has_cyrillic_col(F.col("s")).alias("cyr"),
    ).collect()
    for r in rows:
        assert r.c2l == tr.cyr2lat_py(r.s)
        assert r.l2c == tr.lat2cyr_py(r.s)
        assert r.rom == tr.romanize_py(r.s)
        assert bool(r.cyr) == tr.has_cyrillic_py(r.s)
