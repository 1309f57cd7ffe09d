"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship lint-verdict pipeline at sf0.001;
``queries()``/``oracle_sql()`` expose each implemented operator from
SURVEY.md §2 with a DuckDB oracle twin.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from serbian_osm_lint_spark import synth  # noqa: E402
from serbian_osm_lint_spark.plans import lint_pipeline  # noqa: E402
from serbian_osm_lint_spark.operators import queries as q29  # noqa: E402
from serbian_osm_lint_spark.operators import report, spatial  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full lint verdict table at sf0.001."""
    return lint_pipeline.build_verdicts(spark, "/root/testdata/sf0.001")


def _q_lint_verdicts(spark, sf_dir):
    return lint_pipeline.build_verdicts(spark, sf_dir)


def _q_report_per_map(spark, sf_dir):
    return report.per_map_report_df(lint_pipeline.build_verdicts(spark, sf_dir))


def _q_report_summary(spark, sf_dir):
    return report.summary_report_df(lint_pipeline.build_verdicts(spark, sf_dir))


def _q_report_per_check(spark, sf_dir):
    return report.per_check_report_df(spark, lint_pipeline.build_verdicts(spark, sf_dir))


def _q_merged_verdicts(spark, sf_dir):
    return report.merge_first_wins_df(lint_pipeline.build_verdicts(spark, sf_dir))


def _docs(spark, sf_dir):
    return synth.docs_df(spark, sf_dir)


def _mk_pipeline(name):
    return lambda spark, sf_dir: q29.ALL_PIPELINES[name](spark, _docs(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "lint_verdicts": _q_lint_verdicts,
        "report_per_map": _q_report_per_map,
        "report_summary": _q_report_summary,
        "report_per_check": _q_report_per_check,
        "merged_verdicts": _q_merged_verdicts,
        # spatial core (J2/J8/J9/A4, cell encoding)
        "point_in_serbia": lambda s, d: spatial.point_in_serbia_df(s, _docs(s, d)),
        "cell_encode": lambda s, d: spatial.cell_encode_df(s, _docs(s, d)),
        "knn_dup_names": lambda s, d: spatial.knn_dup_names_df(s, _docs(s, d)),
        "tile_assignment": lambda s, d: spatial.tile_assignment_df(s, _docs(s, d)),
        "cell_counts_salted": lambda s, d: spatial.cell_counts_salted_df(s, _docs(s, d)),
    }
    for name in q29.ALL_PIPELINES:
        q[f"sparql_{name}"] = _mk_pipeline(name)
    return q


def oracle_sql() -> dict[str, str]:
    v = lint_pipeline.sql_verdicts()
    d = synth.sql_scalar_tags()
    o = {
        "lint_verdicts": v,
        "report_per_map": report.sql_per_map_report(v),
        "report_summary": report.sql_summary_report(v),
        "report_per_check": report.sql_per_check_report(v),
        "merged_verdicts": report.sql_merge_first_wins(v),
        "point_in_serbia": spatial.sql_point_in_serbia(d),
        "cell_encode": spatial.sql_cell_encode(d),
        "knn_dup_names": spatial.sql_knn_dup_names(d),
        "tile_assignment": spatial.sql_tile_assignment(d),
        "cell_counts_salted": spatial.sql_cell_counts(d),
    }
    for name in q29.ALL_PIPELINES:
        o[f"sparql_{name}"] = q29.sql_pipeline(d, name)
    return o
