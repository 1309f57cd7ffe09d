# -*- coding: utf-8 -*-
"""S8 as data: the write-back fixes as a *proposed-fix* table.

The reference applies fixes interactively through the OSM API inside an
auto-changeset (``src/checks.py:261-296,328-356,681-698``; engine scope
note in SURVEY §2.1 S8). The engine equivalent is a column-level output:
one row per (entity, map, check) whose fix gates pass —
``(doc_id, map_name, check_name, action, tag, new_val)`` — which a thin
driver loop (or ``foreachBatch`` exporter) could replay against the API.

Fix gates replicated:
  * C3 add ``name:sr-Latn = cyr2lat(authoritative)`` — gates are
    C1-passes (authoritative name present) AND C2-passes
    (``src/checks.py:261-275``). NB: C2 *skips* (passes) excluded
    entities on the Serbia map, so an excluded Latin-named entity still
    gets the fix — mirrored here (round-1 ADVICE).
  * C4 modify ``name:sr-Latn`` to the correct transliteration
    (``src/checks.py:328-335``);
  * C6 add ``wikipedia = sr:<guess>`` from the J3 disambiguation walk
    (``src/checks.py:401-432``);
  * C7 modify ``wikipedia = sr:<guess>`` when the existing entry is not
    Serbian — the same guess machinery (``src/checks.py:476-494``);
  * C9 add ``wikidata = <Q-id of the linked page>`` when C8 resolved the
    page (valid box, coords, ≤ 20 km) and wikidata is missing
    (``src/checks.py:588-607``) — the page→Q-id lookup is the broadcast
    wiki dim's ``wikidata_q`` column;
  * C12 add ``is_in:country = Serbia`` (``src/checks.py:681-698``);
  * C14 delete ``name:sr-Latn`` (``src/checks_extended.py:28-52``).

The C6/C7 guess walk is map-aware like the reference: it walks the
``name`` tag on the Serbia map and ``name:sr`` elsewhere
(``src/checks.py:409-410,477-478``) — see :func:`..wikiwalk.wiki_guess_df`
for the per-map gates.
"""

from __future__ import annotations

from ..functions.geo import haversine_km_col, sql_haversine_km
from ..functions.translit import (
    cyr2lat_col,
    has_cyrillic_col,
    sql_cyr2lat,
    sql_has_cyrillic,
)
from .checks import APPLICABLE_PLACES, DEFAULT_MAPS
from .spans import with_flat_entity
from .wikiwalk import sql_wiki_guess, wiki_guess_df


def proposed_fixes_df(spark, docs, wiki_pages, maps=DEFAULT_MAPS):
    from pyspark.sql import functions as F

    ent = with_flat_entity(docs)
    _t = {"name": "a_name", "name:sr": "a_name_sr", "name:sr-Latn": "a_latn",
          "is_in:country": "a_isin", "place": "a_place", "wikipedia": "a_wp",
          "wikidata": "a_wd"}
    _h = {"name": "h_name", "name:sr": "h_name_sr", "name:sr-Latn": "h_latn",
          "is_in:country": "h_isin", "wikipedia": "h_wp", "wikidata": "h_wd"}
    t = lambda key: F.col(_t[key])  # noqa: E731
    has = lambda key: F.col(_h[key])  # noqa: E731
    nonempty = lambda key: F.coalesce(t(key), F.lit("")) != ""  # noqa: E731

    app = ent.filter(t("place").isin(*APPLICABLE_PLACES))
    excl0 = F.coalesce(
        has("is_in:country") & (t("is_in:country") != "Serbia"), F.lit(False)
    )
    # exploded literal map array (BNLJ crossJoin blocks whole-stage codegen)
    maps_structs = F.array(
        *[F.struct(F.lit(m).alias("map_name"), F.lit(s).alias("is_serbia")) for m, s in maps]
    )
    base = (
        app.select("*", F.explode(maps_structs).alias("_m"))
        .select("*", F.col("_m.map_name").alias("map_name"), F.col("_m.is_serbia").alias("is_serbia"))
        .drop("_m")
    )
    is_serbia = F.col("is_serbia")
    excl = excl0
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

    # C3: latn missing; gates: C1 passes (authoritative present) AND C2
    # passes. C2's error condition is map-aware and skips excluded
    # entities on the Serbia map (src/checks.py:216-231), so the fix gate
    # here is NOT plain has_cyrillic(auth): exclusion lets it through.
    c3_err = F.when(is_serbia, ~nonempty("name:sr-Latn")).otherwise(
        ~nonempty("name:sr-Latn") & has("name:sr")
    )
    auth_cyr = has_cyrillic_col(F.coalesce(auth, F.lit("")))
    c2_eval = F.when(is_serbia, nonempty("name") & ~excl).otherwise(nonempty("name:sr"))
    c2_ok = ~F.coalesce(c2_eval & ~auth_cyr, F.lit(False))
    c3_gate = F.when(is_serbia, nonempty("name")).otherwise(has("name:sr")) & c2_ok
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

    def per_map(df):
        return (
            df.select("*", F.explode(maps_structs).alias("_m"))
            .select("*", F.col("_m.map_name").alias("map_name"))
            .drop("_m")
        )

    # C6/C7: wikipedia guesses — the walk is per-map (name on the Serbia
    # map, name:sr elsewhere), so its rows already carry map_name
    def guess_fixes(mode, check_name, action):
        g = wiki_guess_df(spark, docs, wikipedia_mode=mode, maps=maps)
        return g.select(
            "doc_id",
            "map_name",
            F.lit(check_name).alias("check_name"),
            F.lit(action).alias("action"),
            F.lit("wikipedia").alias("tag"),
            F.concat(F.lit("sr:"), F.col("guess_title")).alias("new_val"),
        )

    c6 = guess_fixes("missing", "checks.WikipediaEntryExistsCheck", "add")
    c7 = guess_fixes("non_sr", "checks.WikipediaEntryIsInSerbianCheck", "modify")

    # C9: wikidata from the C8-resolved page. The reference fix fires only
    # when C8's do_check cached the page (name present, sr: entry, valid
    # box + coords, ≤ 20 km) and the wikidata tag is absent.
    wdim = F.broadcast(
        wiki_pages.select(
            F.col("title").alias("w_title"), "has_box", "w_lat", "w_lon", "wikidata_q"
        )
    )
    dist = haversine_km_col(F.col("lat"), F.col("lon"), F.col("w_lat"), F.col("w_lon"))
    c9 = (
        app.filter(
            has("name")
            & has("wikipedia")
            & t("wikipedia").startswith("sr:")
            & ~excl0
            & ~has("wikidata")
        )
        .withColumn("wp_title", F.expr("substring(a_wp, 4)"))
        .join(wdim, F.col("wp_title") == F.col("w_title"))
        .filter(F.col("has_box") & F.col("w_lat").isNotNull() & (dist <= 20.0))
        .select("doc_id", "wikidata_q")
    )
    c9 = per_map(c9).select(
        "doc_id",
        "map_name",
        F.lit("checks.WikidataEntryExistsCheck").alias("check_name"),
        F.lit("add").alias("action"),
        F.lit("wikidata").alias("tag"),
        F.col("wikidata_q").alias("new_val"),
    )
    return tag_fixes.unionByName(c6).unionByName(c7).unionByName(c9)


def sql_proposed_fixes(docs_sql: str, wiki_sql: str, maps=DEFAULT_MAPS) -> str:
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
    c2_eval = (
        f"(CASE WHEN m.is_serbia THEN ({nonempty('name')} AND NOT {excl}) "
        f"ELSE {nonempty('name_sr')} END)"
    )
    c2_ok = f"(NOT coalesce({c2_eval} AND NOT {sql_has_cyrillic(auth_nonnull)}, false))"
    c3_gate = (
        f"((CASE WHEN m.is_serbia THEN {nonempty('name')} ELSE {has('name_sr')} END) "
        f"AND {c2_ok})"
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

    def guess_select(mode, check_name, action):
        return (
            f"SELECT g.doc_id, g.map_name, '{check_name}' AS check_name, "
            f"'{action}' AS action, 'wikipedia' AS tag, 'sr:' || g.guess_title AS new_val "
            f"FROM ({sql_wiki_guess(docs_sql, mode, maps)}) g"
        )

    c6 = guess_select("missing", "checks.WikipediaEntryExistsCheck", "add")
    c7 = guess_select("non_sr", "checks.WikipediaEntryIsInSerbianCheck", "modify")
    dist = sql_haversine_km("d.lat", "d.lon", "w.w_lat", "w.w_lon")
    c9 = (
        f"SELECT d.doc_id, m.map_name, 'checks.WikidataEntryExistsCheck' AS check_name, "
        f"'add' AS action, 'wikidata' AS tag, w.wikidata_q AS new_val "
        f"FROM (SELECT * FROM ({docs_sql}) WHERE place IN ('city', 'town', 'village')) d "
        f"JOIN ({wiki_sql}) w ON w.title = substring(d.wikipedia, 4) "
        f"CROSS JOIN (VALUES {maps_values}) AS m(map_name, is_serbia) "
        f"WHERE d.name IS NOT NULL AND d.wikipedia IS NOT NULL "
        f"AND starts_with(d.wikipedia, 'sr:') AND NOT {excl} AND d.wikidata IS NULL "
        f"AND w.has_box AND w.w_lat IS NOT NULL AND {dist} <= 20.0"
    )
    return " UNION ALL ".join(selects + [c6, c7, c9])
