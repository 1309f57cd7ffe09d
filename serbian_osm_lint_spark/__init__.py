"""serbian_osm_lint_spark — a PySpark-native spatial lint engine.

A from-scratch re-expression of the query/data-processing capabilities of
``stalker314314/serbian-osm-lint`` (reference, read-only) as idiomatic
Spark DataFrame pipelines over an interleaved text+media document table

    doc_id: string
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

Design rules (see SURVEY.md):
  * all check predicates / transliteration / haversine are Catalyst
    built-in column expressions (whole-stage codegen, no per-row Python);
  * geometry that built-ins can't express (ray-casting point-in-polygon,
    intra-cell kNN) runs in Arrow-batched pandas UDFs;
  * every operator ships with an independent DuckDB SQL emitter used as a
    differential oracle (two implementations, one semantic spec).
"""

__version__ = "0.1.0"
