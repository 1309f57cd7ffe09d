# -*- coding: utf-8 -*-
"""Canonical schemas for the engine (normative shape from BASELINE.json
``input_hint``)."""

from __future__ import annotations

from pyspark.sql import types as T

#: span struct of the interleaved document (order fixed by ``offset``).
SPAN_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

#: the interleaved text+media document table.
DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_TYPE), False),
    ]
)

#: long-format lint verdict row (one per entity × check), the Spark
#: equivalent of the reference's per-entity result dict
#: (``src/engine.py:62-77``); NOT_APPLICABLE rows are filtered before
#: reporting like ``src/engine.py:79-86``.
VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("map_name", T.StringType(), False),
        T.StructField("check_name", T.StringType(), False),
        T.StructField("result", T.StringType(), False),  # CHECKED_OK | CHECKED_ERROR
        T.StructField("message", T.StringType(), True),
        T.StructField("fixable", T.BooleanType(), False),
    ]
)
