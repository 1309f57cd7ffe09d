# -*- coding: utf-8 -*-
"""Transliteration algebra: three faces (python / Column / SQL) must agree
char-for-char, and the python face must satisfy the reference semantics
(src/transliteration.py:3-27, sparql REPLACE chains)."""

import duckdb
import pytest

from serbian_osm_lint_spark.functions import translit as tr

CORPUS = [
    "",
    "Београд",
    "Нови Сад",
    "Љиг",
    "Њујорк",
    "Џеп",
    "Ђаковица",
    "фоо",
    "foo",
    "Mix Београд latin",
    "ЉЊЏ",
    "љњџ",
    "Ljig",            # the reference lat2cyr chain quirk: "Lj" is NOT a digraph
    "LJIG NJEGOš dž",
    "Šašava Žaba Čačak Ćup Đak",
    "X-ray wyq",
    "123 .,-",
]


def test_cyr2lat_reference_semantics():
    assert tr.cyr2lat_py("Београд") == "Beograd"
    assert tr.cyr2lat_py("Љиг") == "Ljig"          # Љ -> "Lj", capital-first
    assert tr.cyr2lat_py("Њ") == "Nj"
    assert tr.cyr2lat_py("Џ") == "Dž"
    assert tr.cyr2lat_py("љњџ") == "ljnjdž"
    assert tr.cyr2lat_py("foo") == "foo"           # non-cyrillic untouched


def test_has_cyrillic_reference_semantics():
    assert tr.has_cyrillic_py("фоо")
    assert tr.has_cyrillic_py("mix ф")
    assert not tr.has_cyrillic_py("foo")
    assert not tr.has_cyrillic_py("")


def test_lat2cyr_chain_order_quirks():
    # digraphs first: "dž" -> џ not д+ж
    assert tr.lat2cyr_py("džak") == "џак"
    assert tr.lat2cyr_py("Džak") == "Џак"
    assert tr.lat2cyr_py("NJiva") == "Њива"
    # the reference chain has no "Lj" digraph: L and j replaced singly
    assert tr.lat2cyr_py("Ljig") == "Лјиг"
    assert tr.lat2cyr_py("LJig") == "Љиг"


def test_romanize():
    assert tr.romanize_py("Đakovica") == "Djakovica"
    assert tr.romanize_py("Šašava žaba") == "Sasava zaba"
    assert tr.romanize_py("ćčđžš") == "ccdjzs"


@pytest.mark.parametrize("fn_py,fn_col,fn_sql", [
    (tr.cyr2lat_py, tr.cyr2lat_col, tr.sql_cyr2lat),
    (tr.lat2cyr_py, tr.lat2cyr_col, tr.sql_lat2cyr),
    (tr.romanize_py, tr.romanize_col, tr.sql_romanize),
])
def test_three_faces_agree(spark, fn_py, fn_col, fn_sql):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in CORPUS], "s string")
    got_spark = [r[0] for r in df.select(fn_col(F.col("s"))).collect()]
    con = duckdb.connect()
    got_sql = [
        con.execute("SELECT " + fn_sql("?::VARCHAR"), [s]).fetchone()[0] for s in CORPUS
    ]
    expected = [fn_py(s) for s in CORPUS]
    assert got_spark == expected
    assert got_sql == expected


def test_cyrillic_detect_faces_agree(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in CORPUS], "s string")
    got_spark = [bool(r[0]) for r in df.select(tr.has_cyrillic_col(F.col("s"))).collect()]
    con = duckdb.connect()
    got_sql = [
        bool(con.execute("SELECT " + tr.sql_has_cyrillic("?::VARCHAR"), [s]).fetchone()[0])
        for s in CORPUS
    ]
    expected = [tr.has_cyrillic_py(s) for s in CORPUS]
    assert got_spark == expected
    assert got_sql == expected
