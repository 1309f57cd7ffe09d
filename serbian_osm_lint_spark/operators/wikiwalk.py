# -*- coding: utf-8 -*-
"""J3: the bounded Wikipedia disambiguation walk as unrolled joins.

Reference ``_guess_from_wikipedia`` (``src/checks.py:46-134``): look up the
entity name; a page with a valid place box wins iff its coords are present
and ≤ 20 km from the entity (``:124-131``); a disambiguation page recurses
into its links in order (``:116-119``), preorder DFS, bailing at depth > 3
(``:69-71``). That per-entity recursive network walk becomes three
LEFT-JOIN levels against two small broadcast dims:

  * ``pages(title, is_disambig, lat, lon)``
  * ``links(parent, ord, child)``

and the DFS preorder is recovered relationally: each candidate carries a
zero-padded ordinal *path key* (root = '', depth-2 = '07', depth-3 =
'0703'); lexicographic min over keys ≡ preorder-first winner — prefix
sorts before extension, siblings sort by link order. Depth 4 simply has
no join level (the reference's bail-out).

The dim is a static literal (same constant list feeds the Spark frames
and the SQL VALUES), with per-name shapes: direct-valid page, 2-link
disambig whose first link has no coords (exception path), a 4-deep
disambig chain (must fail the depth bound), and missing page.
"""

from __future__ import annotations

from ..functions.geo import haversine_km_col, sql_haversine_km
from ..functions.translit import has_cyrillic_col, sql_has_cyrillic
from ..synth import CYR_NAMES, HOT2_LAT0, HOT2_LON0, HOT_LAT0, HOT_LON0
from .checks import APPLICABLE_PLACES, DEFAULT_MAPS
from .spans import with_flat_entity


def guess_shape(i: int) -> int:
    """Walk-shape of name index ``i``: the index QUARTER (i // 4), not
    ``i % 4`` — ``i % 4`` would be perfectly correlated with the synth
    corpus's ``name:sr``-presence modulus (k % 4), leaving the
    non-Serbia-map walk (keyed on ``name:sr``) with no resolvable page
    shapes at all."""
    return (i // 4) % 4


def _guess_dim():
    """(pages, links) literal rows; shape = :func:`guess_shape`(index)."""
    pages, links = [], []
    for i, name in enumerate(CYR_NAMES):
        m = guess_shape(i)
        if m == 0:  # direct valid page near the Belgrade hot cell
            pages.append((name, False, HOT_LAT0 + 0.05, HOT_LON0 + 0.05))
        elif m == 1:  # disambig; link 1 has no coords, link 2 wins (Novi Sad)
            pages.append((name, True, None, None))
            pages.append((f"{name} (река)", False, None, None))
            pages.append((f"{name} (насеље)", False, HOT2_LAT0 + 0.05, HOT2_LON0 + 0.05))
            links.append((name, 1, f"{name} (река)"))
            links.append((name, 2, f"{name} (насеље)"))
        elif m == 2:  # 4-deep chain: depth bound must kill it
            pages.append((name, True, None, None))
            pages.append((f"{name} А", True, None, None))
            pages.append((f"{name} Б", True, None, None))
            pages.append((f"{name} В", False, HOT_LAT0 + 0.05, HOT_LON0 + 0.05))
            links.append((name, 1, f"{name} А"))
            links.append((f"{name} А", 1, f"{name} Б"))
            links.append((f"{name} Б", 1, f"{name} В"))
        # m == 3: no page at all
    return pages, links

GUESS_PAGES, GUESS_LINKS = _guess_dim()


def wiki_guess_df(spark, docs, wikipedia_mode: str = "missing", maps=DEFAULT_MAPS):
    """Disambiguation-walk guesses, PER MAP:
    (doc_id, map_name, name, guess_title, depth).

    ``wikipedia_mode`` selects which fix the guesses feed:
      * ``"missing"`` — C6 (WikipediaEntryExistsCheck.fix,
        ``src/checks.py:401-432``): wikipedia tag absent;
      * ``"non_sr"`` — C7 (WikipediaEntryIsInSerbianCheck.fix,
        ``src/checks.py:476-494``): wikipedia present but not ``sr:``.

    Eligibility mirrors the reference fix gates exactly:
      * applicable place, mode predicate, not country-excluded (the
        excluded entity's ``do_check`` returns '' so no fix runs);
      * NameMissingCheck passes — the ``name`` tag present and non-empty
        on EVERY map (``src/checks.py:201-205`` always reads ``name``);
      * NameCyrillicCheck passes — map-aware tag
        (``src/checks.py:217-231``): ``name`` must be Cyrillic on the
        Serbia map, ``name:sr`` (when present) on other maps.

    The walked name is per map too (``src/checks.py:409-410,477-478``):
    ``tags['name']`` when 'Serbia checks' is in the map name, else
    ``tags['name:sr']``. One deviation: a non-Serbia-map entity WITHOUT
    ``name:sr`` makes the reference raise ``KeyError`` inside ``fix``
    (only ``ElementDeletedApiError`` is caught, ``src/engine.py:38-44``);
    a crash is not expressible as data, so the engine emits no guess row
    for it instead.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    pages = F.broadcast(
        spark.createDataFrame(GUESS_PAGES, "title string, is_disambig boolean, lat double, lon double")
    )
    links = F.broadcast(spark.createDataFrame(GUESS_LINKS, "parent string, ord int, child string"))

    ent = with_flat_entity(docs)
    maps_structs = F.array(
        *[
            F.struct(F.lit(m).alias("map_name"), F.lit(s).alias("is_serbia"))
            for m, s in maps
        ]
    )
    ent = (
        ent.select("*", F.explode(maps_structs).alias("_m"))
        .select(
            "*",
            F.col("_m.map_name").alias("map_name"),
            F.col("_m.is_serbia").alias("is_serbia"),
        )
        .drop("_m")
    )
    excl = F.col("h_isin") & (F.col("a_isin") != "Serbia")
    if wikipedia_mode == "missing":
        wp_pred = ~F.col("h_wp")
    elif wikipedia_mode == "non_sr":
        wp_pred = F.col("h_wp") & ~F.col("a_wp").startswith("sr:")
    else:
        raise ValueError(wikipedia_mode)
    nonempty_sr = F.coalesce(F.col("a_name_sr"), F.lit("")) != ""
    cyr_gate = F.when(F.col("is_serbia"), has_cyrillic_col(F.col("a_name"))).otherwise(
        nonempty_sr & has_cyrillic_col(F.col("a_name_sr"))
    )
    walk_name = F.when(F.col("is_serbia"), F.col("a_name")).otherwise(F.col("a_name_sr"))
    e = ent.filter(
        F.col("a_place").isin(*APPLICABLE_PLACES)
        & wp_pred
        & ~F.coalesce(excl, F.lit(False))
        & (F.coalesce(F.col("a_name"), F.lit("")) != "")
        & cyr_gate
    ).select(
        "doc_id",
        "map_name",
        walk_name.alias("name"),
        F.col("lat").alias("e_lat"),
        F.col("lon").alias("e_lon"),
    )

    def valid_win(p_prefix, df, key_col):
        dist = haversine_km_col(
            F.col("e_lat"), F.col("e_lon"), F.col(f"{p_prefix}_lat"), F.col(f"{p_prefix}_lon")
        )
        return df.filter(
            (~F.col(f"{p_prefix}_disambig"))
            & F.col(f"{p_prefix}_lat").isNotNull()
            & (dist <= 20.0)
        ).select(
            "doc_id",
            "map_name",
            "name",
            F.col(f"{p_prefix}_title").alias("guess_title"),
            key_col.alias("path_key"),
        )

    def page_alias(prefix):
        return pages.select(
            F.col("title").alias(f"{prefix}_title"),
            F.col("is_disambig").alias(f"{prefix}_disambig"),
            F.col("lat").alias(f"{prefix}_lat"),
            F.col("lon").alias(f"{prefix}_lon"),
        )

    d1 = e.join(page_alias("p1"), e["name"] == F.col("p1_title"))
    w1 = valid_win("p1", d1, F.lit(""))

    l1 = links.select(
        F.col("parent").alias("l1_parent"), F.col("ord").alias("l1_ord"), F.col("child").alias("l1_child")
    )
    d2 = (
        d1.filter(F.col("p1_disambig"))
        .join(l1, F.col("p1_title") == F.col("l1_parent"))
        .join(page_alias("p2"), F.col("l1_child") == F.col("p2_title"))
    )
    key2 = F.lpad(F.col("l1_ord").cast("string"), 2, "0")
    w2 = valid_win("p2", d2, key2)

    l2 = links.select(
        F.col("parent").alias("l2_parent"), F.col("ord").alias("l2_ord"), F.col("child").alias("l2_child")
    )
    d3 = (
        d2.filter(F.col("p2_disambig"))
        .join(l2, F.col("p2_title") == F.col("l2_parent"))
        .join(page_alias("p3"), F.col("l2_child") == F.col("p3_title"))
    )
    key3 = F.concat(key2, F.lpad(F.col("l2_ord").cast("string"), 2, "0"))
    w3 = valid_win("p3", d3, key3)

    cands = w1.unionByName(w2).unionByName(w3)
    w = Window.partitionBy("doc_id", "map_name").orderBy("path_key")
    return (
        cands.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "map_name",
            "name",
            "guess_title",
            (F.length("path_key") / 2 + 1).cast("int").alias("depth"),
        )
    )


# ---------------------------------------------------------------------- sql
def sql_wiki_guess(docs_sql: str, wikipedia_mode: str = "missing", maps=DEFAULT_MAPS) -> str:
    def esc(s):
        return s.replace("'", "''")

    if wikipedia_mode == "missing":
        wp_pred = "wikipedia IS NULL"
    elif wikipedia_mode == "non_sr":
        wp_pred = "(wikipedia IS NOT NULL AND NOT starts_with(wikipedia, 'sr:'))"
    else:
        raise ValueError(wikipedia_mode)

    maps_values = ", ".join(f"('{esc(m)}', {str(s).lower()})" for m, s in maps)
    pages_vals = ", ".join(
        f"('{esc(t)}', {str(d).lower()}, "
        + (f"{la}, {lo}" if la is not None else "NULL, NULL")
        + ")"
        for t, d, la, lo in GUESS_PAGES
    )
    links_vals = ", ".join(f"('{esc(p)}', {o}, '{esc(c)}')" for p, o, c in GUESS_LINKS)
    dist = lambda p: sql_haversine_km("e.e_lat", "e.e_lon", f"{p}.lat", f"{p}.lon")  # noqa: E731
    win = (
        lambda p: f"(NOT {p}.is_disambig AND {p}.lat IS NOT NULL AND {dist(p)} <= 20.0)"
    )  # noqa: E731
    return f"""
    WITH pages(title, is_disambig, lat, lon) AS (VALUES {pages_vals}),
    links(parent, ord, child) AS (VALUES {links_vals}),
    e AS (
      SELECT doc_id, m.map_name,
             CASE WHEN m.is_serbia THEN name ELSE name_sr END AS name,
             lat AS e_lat, lon AS e_lon
      FROM ({docs_sql}) CROSS JOIN (VALUES {maps_values}) AS m(map_name, is_serbia)
      WHERE place IN ('city', 'town', 'village') AND {wp_pred}
        AND NOT (is_in_country IS NOT NULL AND is_in_country <> 'Serbia')
        AND coalesce(name, '') <> ''
        AND (CASE WHEN m.is_serbia THEN {sql_has_cyrillic('name')}
             ELSE (coalesce(name_sr, '') <> '' AND {sql_has_cyrillic('name_sr')}) END)
    ),
    w1 AS (
      SELECT e.doc_id, e.map_name, e.name, p1.title AS guess_title, '' AS path_key
      FROM e JOIN pages p1 ON p1.title = e.name WHERE {win('p1')}
    ),
    w2 AS (
      SELECT e.doc_id, e.map_name, e.name, p2.title AS guess_title,
             lpad(CAST(l1.ord AS VARCHAR), 2, '0') AS path_key
      FROM e JOIN pages p1 ON p1.title = e.name AND p1.is_disambig
      JOIN links l1 ON l1.parent = p1.title
      JOIN pages p2 ON p2.title = l1.child
      WHERE {win('p2')}
    ),
    w3 AS (
      SELECT e.doc_id, e.map_name, e.name, p3.title AS guess_title,
             lpad(CAST(l1.ord AS VARCHAR), 2, '0') ||
             lpad(CAST(l2.ord AS VARCHAR), 2, '0') AS path_key
      FROM e JOIN pages p1 ON p1.title = e.name AND p1.is_disambig
      JOIN links l1 ON l1.parent = p1.title
      JOIN pages p2 ON p2.title = l1.child AND p2.is_disambig
      JOIN links l2 ON l2.parent = p2.title
      JOIN pages p3 ON p3.title = l2.child
      WHERE {win('p3')}
    ),
    cands AS (SELECT * FROM w1 UNION ALL SELECT * FROM w2 UNION ALL SELECT * FROM w3)
    SELECT doc_id, map_name, name, guess_title,
           CAST(length(path_key) / 2 + 1 AS INT) AS depth
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id, map_name ORDER BY path_key) AS rn
          FROM cands)
    WHERE rn = 1
    """
