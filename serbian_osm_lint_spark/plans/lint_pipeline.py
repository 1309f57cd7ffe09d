# -*- coding: utf-8 -*-
"""End-to-end lint pipeline assembly (the reference's ``src/main.py``
lifecycle as one lazy DataFrame DAG: scan → project → check-select →
aggregate; SURVEY §3.1)."""

from __future__ import annotations

from .. import synth
from ..operators import checks


def build_verdicts(spark, sf_dir: str):
    """docs + dims + checks → long verdict table (lazy)."""
    docs = synth.docs_df(spark, sf_dir)
    wiki = synth.wiki_pages_df(spark, sf_dir)
    wd = synth.wikidata_items_df(spark, sf_dir)
    return checks.lint_verdicts_df(spark, docs, wiki, wd)


def sql_verdicts() -> str:
    return checks.sql_lint_verdicts(
        synth.sql_scalar_tags(), synth.sql_wiki_pages(), synth.sql_wikidata_items()
    )
