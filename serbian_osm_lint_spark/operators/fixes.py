# -*- coding: utf-8 -*-
"""S8 as data: the write-back fixes as a *proposed-fix* table.

The reference applies fixes interactively through the OSM API inside an
auto-changeset (``src/checks.py:261-296,328-356,681-698``; engine scope
note in SURVEY §2.1 S8). The engine equivalent is a column-level output:
one row per (entity, map, check) whose fix gates pass —
``(doc_id, map_name, check_name, action, tag, new_val)`` — which a thin
driver loop (or ``foreachBatch`` exporter) could replay against the API.

Fix gates replicated:
  * C3 add ``name:sr-Latn = cyr2lat(authoritative)`` — only when the
    authoritative name exists and IS Cyrillic (``src/checks.py:261-275``);
  * C4 modify ``name:sr-Latn`` to the correct transliteration
    (``src/checks.py:328-335``);
  * C12 add ``is_in:country = Serbia`` (``src/checks.py:681-698``);
  * C14 delete ``name:sr-Latn`` (``src/checks_extended.py:28-52``);
  * C6 add ``wikipedia = sr:<guess>`` from the J3 disambiguation walk
    (``src/checks.py:401-432``).
"""

from __future__ import annotations

from ..functions.translit import (
    cyr2lat_col,
    has_cyrillic_col,
    sql_cyr2lat,
    sql_has_cyrillic,
)
from .checks import APPLICABLE_PLACES, DEFAULT_MAPS
from .spans import with_flat_entity
from .wikiwalk import sql_wiki_guess, wiki_guess_df


def proposed_fixes_df(spark, docs, maps=DEFAULT_MAPS):
    from pyspark.sql import functions as F

    ent = with_flat_entity(docs)
    _t = {"name": "a_name", "name:sr": "a_name_sr", "name:sr-Latn": "a_latn",
          "is_in:country": "a_isin", "place": "a_place"}
    _h = {"name": "h_name", "name:sr": "h_name_sr", "name:sr-Latn": "h_latn",
          "is_in:country": "h_isin"}
    t = lambda key: F.col(_t[key])  # noqa: E731
    has = lambda key: F.col(_h[key])  # noqa: E731
    nonempty = lambda key: F.coalesce(t(key), F.lit("")) != ""  # noqa: E731

    base = ent.filter(t("place").isin(*APPLICABLE_PLACES))
    # exploded literal map array (BNLJ crossJoin blocks whole-stage codegen)
    maps_structs = F.array(
        *[F.struct(F.lit(m).alias("map_name"), F.lit(s).alias("is_serbia")) for m, s in maps]
    )
    base = (
        base.select("*", F.explode(maps_structs).alias("_m"))
        .select("*", F.col("_m.map_name").alias("map_name"), F.col("_m.is_serbia").alias("is_serbia"))
        .drop("_m")
    )
    is_serbia = F.col("is_serbia")
    excl = has("is_in:country") & (t("is_in:country") != "Serbia")
    auth = F.when(is_serbia, t("name")).otherwise(t("name:sr"))

    def fix_struct(check, cond, action, tag, new_val):
        return F.when(
            F.coalesce(cond, F.lit(False)),
            F.struct(
                F.lit(check).alias("check_name"),
                F.lit(action).alias("action"),
                F.lit(tag).alias("tag"),
                new_val.alias("new_val"),
            ),
        )

    # C3: latn missing; gates: authoritative name present+cyrillic
    c3_err = F.when(is_serbia, ~nonempty("name:sr-Latn")).otherwise(
        ~nonempty("name:sr-Latn") & has("name:sr")
    )
    c3_gate = F.when(is_serbia, nonempty("name")).otherwise(has("name:sr")) & has_cyrillic_col(
        F.coalesce(auth, F.lit(""))
    )
    # C4: latn present but mistransliterated
    c4_err = (
        F.when(is_serbia, has("name")).otherwise(has("name:sr"))
        & has("name:sr-Latn")
        & ~excl
        & (cyr2lat_col(auth) != t("name:sr-Latn"))
    )
    fixes = F.array(
        fix_struct("checks.LatinNameExistsCheck", c3_err & c3_gate, "add", "name:sr-Latn", cyr2lat_col(auth)),
        fix_struct("checks.LatinNameSameAsCyrillicCheck", c4_err, "modify", "name:sr-Latn", cyr2lat_col(auth)),
        fix_struct(
            "checks.IsInCountryCheck",
            ~has("is_in:country"),
            "add",
            "is_in:country",
            F.lit("Serbia"),
        ),
        fix_struct(
            "checks_extended.RemoveLatinName",
            nonempty("name:sr-Latn"),
            "delete",
            "name:sr-Latn",
            F.lit(None).cast("string"),
        ),
    )
    tag_fixes = (
        base.select("doc_id", "map_name", F.explode(fixes).alias("f"))
        .filter(F.col("f").isNotNull())
        .select(
            "doc_id",
            "map_name",
            F.col("f.check_name").alias("check_name"),
            F.col("f.action").alias("action"),
            F.col("f.tag").alias("tag"),
            F.col("f.new_val").alias("new_val"),
        )
    )

    # C6: wikipedia guess (map-independent eligibility, emitted per map like
    # the reference's per-map fix loop)
    guess = wiki_guess_df(spark, docs)
    c6 = (
        guess.select("*", F.explode(maps_structs).alias("_m"))
        .select("*", F.col("_m.map_name").alias("map_name"))
        .select(
            "doc_id",
            "map_name",
            F.lit("checks.WikipediaEntryExistsCheck").alias("check_name"),
            F.lit("add").alias("action"),
            F.lit("wikipedia").alias("tag"),
            F.concat(F.lit("sr:"), F.col("guess_title")).alias("new_val"),
        )
    )
    return tag_fixes.unionByName(c6)


def sql_proposed_fixes(docs_sql: str, maps=DEFAULT_MAPS) -> str:
    maps_values = ", ".join(f"('{m}', {str(s).lower()})" for m, s in maps)
    auth = "(CASE WHEN m.is_serbia THEN d.name ELSE d.name_sr END)"
    excl = "(d.is_in_country IS NOT NULL AND d.is_in_country <> 'Serbia')"
    nonempty = lambda c: f"(coalesce(d.{c}, '') <> '')"  # noqa: E731
    has = lambda c: f"(d.{c} IS NOT NULL)"  # noqa: E731
    c3_err = (
        f"(CASE WHEN m.is_serbia THEN NOT {nonempty('name_sr_latn')} "
        f"ELSE (NOT {nonempty('name_sr_latn')} AND {has('name_sr')}) END)"
    )
    auth_nonnull = f"coalesce({auth}, '')"
    c3_gate = (
        f"((CASE WHEN m.is_serbia THEN {nonempty('name')} ELSE {has('name_sr')} END) "
        f"AND {sql_has_cyrillic(auth_nonnull)})"
    )
    c4_err = (
        f"((CASE WHEN m.is_serbia THEN {has('name')} ELSE {has('name_sr')} END) "
        f"AND {has('name_sr_latn')} AND NOT {excl} "
        f"AND {sql_cyr2lat(auth)} <> d.name_sr_latn)"
    )
    base = (
        f"(SELECT * FROM ({docs_sql}) WHERE place IN ('city', 'town', 'village')) d "
        f"CROSS JOIN (VALUES {maps_values}) AS m(map_name, is_serbia)"
    )
    rows = [
        ("checks.LatinNameExistsCheck", f"({c3_err} AND {c3_gate})", "add", "name:sr-Latn", sql_cyr2lat(auth)),
        ("checks.LatinNameSameAsCyrillicCheck", c4_err, "modify", "name:sr-Latn", sql_cyr2lat(auth)),
        ("checks.IsInCountryCheck", f"(NOT {has('is_in_country')})", "add", "is_in:country", "'Serbia'"),
        ("checks_extended.RemoveLatinName", nonempty("name_sr_latn"), "delete", "name:sr-Latn", "NULL"),
    ]
    selects = [
        f"SELECT d.doc_id, m.map_name, '{check}' AS check_name, '{action}' AS action, "
        f"'{tag}' AS tag, CAST({val} AS VARCHAR) AS new_val FROM {base} WHERE {cond}"
        for check, cond, action, tag, val in rows
    ]
    c6 = (
        f"SELECT g.doc_id, m.map_name, 'checks.WikipediaEntryExistsCheck' AS check_name, "
        f"'add' AS action, 'wikipedia' AS tag, 'sr:' || g.guess_title AS new_val "
        f"FROM ({sql_wiki_guess(docs_sql)}) g "
        f"CROSS JOIN (VALUES {maps_values}) AS m(map_name, is_serbia)"
    )
    return " UNION ALL ".join(selects + [c6])
