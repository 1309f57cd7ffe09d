# -*- coding: utf-8 -*-
"""End-to-end lint pipeline assembly (the reference's ``src/main.py``
lifecycle as one lazy DataFrame DAG: scan → project → check-select →
aggregate; SURVEY §3.1)."""

from __future__ import annotations

from .. import synth
from ..operators import checks
from ..sources import catalog


def build_verdicts(spark, sf_dir: str):
    """stored docs + dims + checks → long verdict table (lazy scan-based)."""
    docs = catalog.docs_table(spark, sf_dir)
    wiki, wd = catalog.dims_tables(spark, sf_dir)
    return checks.lint_verdicts_df(spark, docs, wiki, wd)


def sql_verdicts() -> str:
    return checks.sql_lint_verdicts(
        synth.sql_scalar_tags(), synth.sql_wiki_pages(), synth.sql_wikidata_items()
    )
