# -*- coding: utf-8 -*-
"""The 10 SPARQL queries re-expressed as DataFrame pipelines (SURVEY §2.9).

The reference ships 10 ``.sparql`` files evaluated remotely at Sophox;
each is filter-chain + scalar binds + a ``wikibase:around`` radius gate +
suggestion columns, and every returned row is a finding
(``GenericSophoxCheck``, reference ``src/checks.py:701-717``). Here each
becomes a pure Catalyst pipeline over the doc table: tag-presence
filters, the regex classes, the lat2cyr/cyr2lat/romanize REPLACE chains,
and the radius gate as native haversine column math (J1) — the moral
equivalent of the reference's remote predicate pushdown is Catalyst
pushing these filters into the parquet/Iceberg scan.

Output shape per pipeline (the Sophox SELECT): ``doc_id, name, lat, lon,
tag_1, val_1, message`` where ``message = check_description.format(name)``
(reference ``src/checks.py:715-717``).

Radius-gate centers: the reference WKT literals are ``Point(lon lat)``
(true WKT axis order; the reference's entity parser swaps them —
``src/osm_lint_entity.py:44-49`` — we pin the geographically-correct
convention and document it here).
"""

from __future__ import annotations

from ..functions.geo import haversine_km_col, sql_haversine_km
from ..functions.translit import (
    cyr2lat_col,
    english_name_col,
    has_cyrillic_col,
    lat2cyr_col,
    latin_name_col,
    romanize_col,
    sql_cyr2lat,
    sql_english_name,
    sql_has_cyrillic,
    sql_lat2cyr,
    sql_latin_name,
    sql_romanize,
)
from .spans import with_flat_entity

#: (query, center_lat, center_lon, radius_km) — from the wikibase:around
#: blocks of each .sparql file (e.g. adding_namesr_north.sparql:42-44).
REGION_CIRCLES = {
    "adding_name": (44.04751, 21.00403, 250.0),
    "changing_namesr_to_cyrillic": (44.04751, 21.00403, 250.0),
    "adding_int_name": (44.04751, 21.00403, 250.0),
    "adding_namesr_north": (45.62738, 19.86459, 57.0),
    "adding_namesr_central": (44.5576, 20.4244, 90.0),
    "adding_namesr_west": (43.70735, 20.29740, 70.0),
    "adding_namesr_east": (43.19011, 22.02201, 65.0),
    "adding_namesr_south": (42.57887, 22.10607, 31.0),
    "checking_namesr_latn_north": (45.0784, 20.0560, 150.0),
    "checking_namesr_latn_south": (43.5622, 21.0424, 130.0),
}

DESC_ADDING_NAME = "Entity {0} is missing name tag"
DESC_CHANGING = "Entity {0} is not having cyrillic name:sr tag"
DESC_ADDING_NAMESR = "Entity {0} is missing name:sr tag"
DESC_CHECKING_LATN = (
    "Entity {0} is missing name:sr-Latn tag or having name:sr-Latn tag "
    "that is not consistent with name:sr tag"
)
DESC_INT_NAME = "Entity {0} could be better searchable with int_name"


def _prep(docs):
    from pyspark.sql import functions as F

    ent = with_flat_entity(docs)
    return ent.select(
        "doc_id",
        F.col("a_name").alias("name"),
        F.col("a_name_sr").alias("name_sr"),
        F.col("a_latn").alias("name_sr_latn"),
        F.col("a_int_name").alias("int_name"),
        F.col("h_place").alias("has_place"),
        F.col("h_highway").alias("has_highway"),
        "lat",
        "lon",
    )


def _within(query_name):
    from pyspark.sql import functions as F

    clat, clon, r = REGION_CIRCLES[query_name]
    return haversine_km_col(F.col("lat"), F.col("lon"), F.lit(clat), F.lit(clon)) <= r


def _out(df, name_col, tag_1, val_1, description):
    from pyspark.sql import functions as F

    return df.select(
        "doc_id",
        name_col.alias("name"),
        F.round("lat", 6).alias("lat"),
        F.round("lon", 6).alias("lon"),
        F.lit(tag_1).alias("tag_1"),
        val_1.alias("val_1"),
        F.format_string(description.replace("{0}", "%s"), name_col).alias("message"),
    )


def adding_name_df(spark, docs):
    """sparql/adding_name.sparql:2-17 — suggest ``name = name:sr``."""
    from pyspark.sql import functions as F

    p = _prep(docs)
    p = p.filter(
        F.col("name_sr").isNotNull()
        & F.col("name").isNull()
        & (F.col("has_place") | F.col("has_highway"))
        & _within("adding_name")
    )
    return _out(p, F.col("name_sr"), "name", F.col("name_sr"), DESC_ADDING_NAME)


def changing_namesr_to_cyrillic_df(spark, docs):
    """sparql/changing_namesr_to_cyrillic.sparql:2-41 — cyrillize name:sr."""
    from pyspark.sql import functions as F

    p = _prep(docs)
    p = p.filter(
        F.col("name_sr").isNotNull()
        & (F.col("has_place") | F.col("has_highway"))
        & latin_name_col(F.col("name_sr"))
        & _within("changing_namesr_to_cyrillic")
    )
    return _out(p, F.col("name_sr"), "name:sr", lat2cyr_col(F.col("name_sr")), DESC_CHANGING)


def adding_namesr_df(spark, docs, region: str):
    """sparql/adding_namesr_{region}.sparql — suggest ``name:sr = lat2cyr(name)``
    for Latin-named highways inside the regional circle."""
    from pyspark.sql import functions as F

    p = _prep(docs)
    p = p.filter(
        F.col("name").isNotNull()
        & F.col("has_highway")
        & latin_name_col(F.col("name"))
        & ~english_name_col(F.col("name"))
        & _within(f"adding_namesr_{region}")
    )
    return _out(p, F.col("name"), "name:sr", lat2cyr_col(F.col("name")), DESC_ADDING_NAMESR)


def checking_namesr_latn_df(spark, docs, region: str):
    """sparql/checking_namesr-latn_{north,south}.sparql — bind
    ``correct = cyr2lat(name:sr)``; keep if (latn exists ∧ ≠ correct) ∨
    (¬exists ∧ name is Cyrillic) (filter at ``:37-42``)."""
    from pyspark.sql import functions as F

    p = _prep(docs)
    correct = cyr2lat_col(F.col("name_sr"))
    latn_exists = F.col("name_sr_latn").isNotNull()
    p = p.filter(
        F.col("name").isNotNull()
        & F.col("name_sr").isNotNull()
        & _within(f"checking_namesr_latn_{region}")
        & (
            (latn_exists & (correct != F.col("name_sr_latn")))
            | (~latn_exists & has_cyrillic_col(F.col("name")))
        )
    )
    return _out(p, F.col("name"), "name:sr-Latn", correct, DESC_CHECKING_LATN)


def adding_int_name_df(spark, docs):
    """sparql/adding_int_name.sparql:2-26 — romanized int_name for đ names.

    Note the reference's ``:19-20`` NOT-EXISTS + OR filter makes the
    "existing ≠ corrected" branch unreachable — only missing-int_name rows
    survive; we replicate the observable behavior.
    """
    from pyspark.sql import functions as F

    p = _prep(docs)
    p = p.filter(
        F.col("name_sr_latn").isNotNull()
        & F.col("name_sr_latn").rlike("[đĐ]")
        & F.col("int_name").isNull()
        & _within("adding_int_name")
    )
    return _out(
        p, F.col("name_sr_latn"), "int_name", romanize_col(F.col("name_sr_latn")), DESC_INT_NAME
    )


# ------------------------------------------------- C13 suggestion model
#: RDF boolean datatype — a val_N bound to 'false' with this datatype is a
#: DELETE-tag suggestion (reference ``src/checks.py:752-754``).
XSD_BOOLEAN = "http://www.w3.org/2001/XMLSchema#boolean"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

METADATA_RE = r"#defaultView:Editor\s*(.*)"
METADATA_SCHEMA = "comment string, check_description string, vote boolean"

MULTI_SUGGESTION_COMMENT = (
    "Fixing mistransliterated name:sr-Latn and dropping stale int_name"
)
MULTI_SUGGESTION_DESC = (
    "Entity {0} is having name:sr-Latn tag that is not consistent with name:sr tag"
)
#: synthetic multi-suggestion query text — the ``#defaultView:Editor``
#: header carries the metadata JSON exactly like the reference queries
#: (e.g. ``sparql/adding_int_name.sparql:1``; parsed at
#: ``src/sources/sophox_source.py:11,29-32``).
MULTI_SUGGESTION_QUERY = (
    '#defaultView:Editor{ "comment":"' + MULTI_SUGGESTION_COMMENT + '", '
    '"check_description": "' + MULTI_SUGGESTION_DESC + '", "vote":false }\n'
    "SELECT ?id ?loc ?name ?tag_1 ?val_1 ?tag_2 ?val_2 WHERE { ... }"
)


def metadata_col(query_text_col):
    """``tags['metadata']`` as a typed struct column: the JSON payload of
    the ``#defaultView:Editor`` header (src/sources/sophox_source.py:29-32)."""
    from pyspark.sql import functions as F

    return F.from_json(F.regexp_extract(query_text_col, METADATA_RE, 1), METADATA_SCHEMA)


def suggestions_col(pairs):
    """Positional (tag_N, val_N, val_N_datatype) families → the
    ``array<struct<tag, val, is_delete>>`` suggestion model.

    Semantics replicated from the reference:
      * per-row stop at the first missing ``tag_N``
        (``src/checks.py:730-736`` while-loop break);
      * RDF boolean ``false`` ⇒ delete-tag, val → NULL
        (``src/checks.py:752-754``).
    """
    from pyspark.sql import functions as F

    structs = []
    seen = F.lit(True)
    for tag, val, dt in pairs:
        seen = seen & tag.isNotNull()
        is_del = F.coalesce((val == "false") & (dt == XSD_BOOLEAN), F.lit(False))
        structs.append(
            F.when(
                seen,
                F.struct(
                    tag.alias("tag"),
                    F.when(is_del, F.lit(None).cast("string")).otherwise(val).alias("val"),
                    is_del.alias("is_delete"),
                ),
            )
        )
    return F.filter(F.array(*structs), lambda s: s.isNotNull())


def multi_suggestion_df(spark, docs):
    """C13 with the full suggestion/metadata model: a synthetic pipeline
    whose rows carry TWO suggestions — modify ``name:sr-Latn`` to the
    correct transliteration, and (when the tag exists) DELETE the stale
    ``int_name`` via an RDF boolean-false binding.

    Output: (doc_id, name, lat, lon, metadata struct, suggestions array,
    message). Use :func:`multi_suggestion_flat_df` for the
    oracle-comparable flattened face.
    """
    from pyspark.sql import functions as F

    p = _prep(docs)
    rows = p.filter(
        F.col("name_sr").isNotNull()
        & has_cyrillic_col(F.col("name_sr"))
        & F.col("name_sr_latn").isNotNull()
        & (cyr2lat_col(F.col("name_sr")) != F.col("name_sr_latn"))
        & _within("changing_namesr_to_cyrillic")
    )
    has_int = F.col("int_name").isNotNull()
    bindings = rows.select(
        "doc_id",
        "name",
        F.round("lat", 6).alias("lat"),
        F.round("lon", 6).alias("lon"),
        F.lit("name:sr-Latn").alias("tag_1"),
        cyr2lat_col(F.col("name_sr")).alias("val_1"),
        F.lit(XSD_STRING).alias("val_1_dt"),
        F.when(has_int, F.lit("int_name")).alias("tag_2"),
        F.when(has_int, F.lit("false")).alias("val_2"),
        F.when(has_int, F.lit(XSD_BOOLEAN)).alias("val_2_dt"),
    )
    sugg = suggestions_col(
        [
            (F.col("tag_1"), F.col("val_1"), F.col("val_1_dt")),
            (F.col("tag_2"), F.col("val_2"), F.col("val_2_dt")),
        ]
    )
    # message = check_description.format(name) (src/checks.py:713-717);
    # name falls back to the id for nameless entities (src/checks.py:714).
    name_or_id = F.coalesce(F.col("name"), F.expr("substring(doc_id, 2)"))
    meta = metadata_col(F.lit(MULTI_SUGGESTION_QUERY))
    return bindings.select(
        "doc_id",
        "name",
        "lat",
        "lon",
        meta.alias("metadata"),
        # the reference gates every suggestion behind interactive
        # confirmation (src/checks.py:766, ask_confirmation :170-189);
        # queries whose metadata carries vote=true additionally require a
        # community vote before applying, so only vote=false suggestions
        # are safe for unattended replay: auto_applicable := NOT vote.
        (~meta.getField("vote")).alias("auto_applicable"),
        sugg.alias("suggestions"),
        F.format_string(MULTI_SUGGESTION_DESC.replace("{0}", "%s"), name_or_id).alias(
            "message"
        ),
    )


def multi_suggestion_flat_df(spark, docs):
    """Oracle face: suggestions exploded to scalar rows, metadata fields
    as scalar columns (the driver canonicalizer cannot hash arrays)."""
    from pyspark.sql import functions as F

    d = multi_suggestion_df(spark, docs)
    return d.select(
        "doc_id",
        "name",
        "lat",
        "lon",
        "message",
        F.col("metadata.comment").alias("comment"),
        F.col("metadata.check_description").alias("check_description"),
        F.col("metadata.vote").alias("vote"),
        "auto_applicable",
        F.posexplode("suggestions").alias("sugg_idx", "s"),
    ).select(
        "doc_id",
        "name",
        "lat",
        "lon",
        "message",
        "comment",
        "check_description",
        "vote",
        "auto_applicable",
        F.col("sugg_idx").cast("int").alias("sugg_idx"),
        F.col("s.tag").alias("tag"),
        F.col("s.val").alias("val"),
        F.col("s.is_delete").alias("is_delete"),
    )


def sql_multi_suggestion(docs_sql: str) -> str:
    """DuckDB twin of the flattened multi-suggestion pipeline. The vote /
    auto_applicable columns derive from the SAME ``#defaultView:Editor``
    header the Spark face parses at runtime (parsed here in Python)."""
    import json
    import re

    meta = json.loads(re.match(METADATA_RE, MULTI_SUGGESTION_QUERY).group(1))
    vote_sql = "true" if meta["vote"] else "false"
    auto_sql = "false" if meta["vote"] else "true"
    esc = lambda s: s.replace("'", "''")  # noqa: E731
    msg = MULTI_SUGGESTION_DESC.replace("'", "''").replace("{0}", "%s")
    within = _sql_within("changing_namesr_to_cyrillic")
    elig = (
        f"SELECT * FROM ({docs_sql}) d WHERE d.name_sr IS NOT NULL "
        f"AND {sql_has_cyrillic('d.name_sr')} AND d.name_sr_latn IS NOT NULL "
        f"AND {sql_cyr2lat('d.name_sr')} <> d.name_sr_latn AND {within}"
    )
    common = (
        f"e.doc_id, e.name, round(e.lat, 6) AS lat, round(e.lon, 6) AS lon, "
        f"printf('{msg}', coalesce(e.name, substring(e.doc_id, 2))) AS message, "
        f"'{esc(MULTI_SUGGESTION_COMMENT)}' AS comment, "
        f"'{esc(MULTI_SUGGESTION_DESC)}' AS check_description, "
        f"{vote_sql} AS vote, {auto_sql} AS auto_applicable"
    )
    s1 = (
        f"SELECT {common}, 0 AS sugg_idx, 'name:sr-Latn' AS tag, "
        f"{sql_cyr2lat('e.name_sr')} AS val, false AS is_delete FROM elig e"
    )
    s2 = (
        f"SELECT {common}, 1 AS sugg_idx, 'int_name' AS tag, "
        f"CAST(NULL AS VARCHAR) AS val, true AS is_delete FROM elig e "
        f"WHERE e.int_name IS NOT NULL"
    )
    return f"WITH elig AS ({elig}) {s1} UNION ALL {s2}"


ALL_PIPELINES = {
    "adding_name": adding_name_df,
    "changing_namesr_to_cyrillic": changing_namesr_to_cyrillic_df,
    "adding_namesr_north": lambda s, d: adding_namesr_df(s, d, "north"),
    "adding_namesr_central": lambda s, d: adding_namesr_df(s, d, "central"),
    "adding_namesr_west": lambda s, d: adding_namesr_df(s, d, "west"),
    "adding_namesr_east": lambda s, d: adding_namesr_df(s, d, "east"),
    "adding_namesr_south": lambda s, d: adding_namesr_df(s, d, "south"),
    "checking_namesr_latn_north": lambda s, d: checking_namesr_latn_df(s, d, "north"),
    "checking_namesr_latn_south": lambda s, d: checking_namesr_latn_df(s, d, "south"),
    "adding_int_name": adding_int_name_df,
}


# ---------------------------------------------------------------------- sql
def _sql_within(query_name: str) -> str:
    clat, clon, r = REGION_CIRCLES[query_name]
    return f"({sql_haversine_km('d.lat', 'd.lon', str(clat), str(clon))} <= {r})"


def _sql_out(where: str, name_expr: str, tag_1: str, val_1: str, description: str) -> str:
    msg = description.replace("'", "''").replace("{0}", "%s")
    return (
        f"SELECT d.doc_id, {name_expr} AS name, round(d.lat, 6) AS lat, "
        f"round(d.lon, 6) AS lon, '{tag_1}' AS tag_1, {val_1} AS val_1, "
        f"printf('{msg}', {name_expr}) AS message "
        f"FROM base d WHERE {where}"
    )


def sql_pipeline(docs_sql: str, name: str) -> str:
    """DuckDB twin of :data:`ALL_PIPELINES`[name]."""
    has_pl = "(d.place IS NOT NULL)"
    has_hw = "(d.highway IS NOT NULL)"
    if name == "adding_name":
        body = _sql_out(
            f"d.name_sr IS NOT NULL AND d.name IS NULL AND ({has_pl} OR {has_hw}) "
            f"AND {_sql_within(name)}",
            "d.name_sr", "name", "d.name_sr", DESC_ADDING_NAME,
        )
    elif name == "changing_namesr_to_cyrillic":
        body = _sql_out(
            f"d.name_sr IS NOT NULL AND ({has_pl} OR {has_hw}) "
            f"AND {sql_latin_name('d.name_sr')} AND {_sql_within(name)}",
            "d.name_sr", "name:sr", sql_lat2cyr("d.name_sr"), DESC_CHANGING,
        )
    elif name.startswith("adding_namesr_"):
        body = _sql_out(
            f"d.name IS NOT NULL AND {has_hw} AND {sql_latin_name('d.name')} "
            f"AND NOT {sql_english_name('d.name')} AND {_sql_within(name)}",
            "d.name", "name:sr", sql_lat2cyr("d.name"), DESC_ADDING_NAMESR,
        )
    elif name.startswith("checking_namesr_latn_"):
        correct = sql_cyr2lat("d.name_sr")
        body = _sql_out(
            f"d.name IS NOT NULL AND d.name_sr IS NOT NULL AND {_sql_within(name)} "
            f"AND ((d.name_sr_latn IS NOT NULL AND {correct} <> d.name_sr_latn) "
            f"OR (d.name_sr_latn IS NULL AND {sql_has_cyrillic('d.name')}))",
            "d.name", "name:sr-Latn", correct, DESC_CHECKING_LATN,
        )
    elif name == "adding_int_name":
        body = _sql_out(
            f"d.name_sr_latn IS NOT NULL AND regexp_matches(d.name_sr_latn, '[đĐ]') "
            f"AND d.int_name IS NULL AND {_sql_within(name)}",
            "d.name_sr_latn", "int_name", sql_romanize("d.name_sr_latn"), DESC_INT_NAME,
        )
    else:
        raise KeyError(name)
    return f"WITH base AS ({docs_sql}) {body}"
