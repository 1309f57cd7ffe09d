# -*- coding: utf-8 -*-
"""Deterministic synthesis of the interleaved OSM document corpus.

The engine's canonical input is an Iceberg/parquet table
``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``
(BASELINE.json ``input_hint``). No real OSM extract is available in the
sandbox, so the corpus is *derived deterministically* from the driver's
``customer`` table: every attribute of a document is pure modular
arithmetic over ``c_custkey``. The same derivation is emitted twice —

  * :func:`scalar_tags_df` / :func:`docs_df` — Spark (native columns),
  * :func:`sql_scalar_tags` — DuckDB SQL (oracle side),

so the DuckDB correctness oracle sees exactly the same entities without
ever sharing code with the Spark path (only the literal constants below).

Row populations mirror every reference unit-test permutation
(``/root/reference/test/test_checks.py``, ``test_applicability.py:27-28``):
missing/empty/Latin/Cyrillic names, mis-transliterated pairs,
``is_in:country`` ∈ {absent, Serbia, Montenegro}, wikipedia/wikidata
present/absent/dangling, the ``place=CiTy`` case-sensitivity trap, plus
a 30% "urban" hot-spot (Belgrade-like cell) for skew testing.
"""

from __future__ import annotations

from .functions.translit import cyr2lat_py, romanize_py

# 16 base place names (Serbian Cyrillic, digraph-heavy on purpose: Љ, Ђ,
# Џ, Њ, Ч, Ш, Ж cases all appear so transliteration edge cases are live).
CYR_NAMES = [
    "Београд", "Нови Сад", "Ниш", "Крагујевац",
    "Љиг", "Ђаковица", "Аранђеловац", "Књажевац",
    "Панчево", "Чачак", "Шабац", "Ужице",
    "Врање", "Зрењанин", "Џеп", "Смедерево",
]
#: correct transliterations, computed once from the python reference impl.
LAT_NAMES = [cyr2lat_py(n) for n in CYR_NAMES]
#: correct int_name romanizations of the Latin names.
INT_NAMES = [romanize_py(n) for n in LAT_NAMES]

PLACES = ["city", "town", "village", "suburb", "CiTy"]  # k%6==5 -> no tag

#: fixed span order for tag spans (then geom, then media).
TAG_KEYS = [
    "place", "name", "name:sr", "name:sr-Latn", "is_in:country",
    "wikipedia", "wikidata", "highway", "int_name",
]

# geometry grid (decimal degrees): 30% of entities land in a dense
# "Belgrade" hot cell, the rest spread over a Serbia-sized bbox.
HOT_LAT0, HOT_LON0 = 44.75, 20.40     # "Belgrade" hot cell (30% of rows)
HOT2_LAT0, HOT2_LON0 = 45.20, 19.80    # "Novi Sad" hot cell (20% of rows)
BG_LAT0, BG_LON0 = 41.8, 18.3
PRIME_LAT, PRIME_LON = 7919, 104729


# --------------------------------------------------------------- python
def entity_prefix_py(k: int) -> str:
    """doc_id prefix ⇒ entity type: n=node (most), w=way, r=relation —
    mirrors the reference's three entity types (src/osm_lint_entity.py:60-87).
    Modulus 11 is coprime to every other attribute modulus (decorrelated)."""
    m = k % 11
    return "n" if m < 7 else ("w" if m < 10 else "r")


def scalar_tags_py(k: int) -> dict:
    """Plain-Python reference derivation for one entity (tests only)."""
    i = k % 16
    cyr, lat_, intn = CYR_NAMES[i], LAT_NAMES[i], INT_NAMES[i]
    place = PLACES[k % 6] if k % 6 < 5 else None
    name = [None, "", lat_][k % 7] if k % 7 < 3 else cyr
    name_sr = [None, lat_][k % 4] if k % 4 < 2 else cyr
    name_sr_latn = [None, "", lat_, lat_ + "X", cyr][k % 5]
    is_in = {0: "Montenegro", 1: "Serbia", 2: "Serbia"}.get(k % 9)
    title = f"{cyr} {k}"
    wikipedia = {0: f"sr:{title}", 1: f"en:{lat_} {k}", 2: f"sr:{cyr} Х{k}"}.get(k % 8)
    wikidata = {0: f"Q{2 * k + 1}", 1: f"Q{2 * k}"}.get(k % 10)
    highway = "residential" if (k % 12 == 0 or k % 3 == 1) else None
    int_name = {0: intn, 1: lat_ + "Y"}.get(k % 15)
    if k % 10 < 3:
        lat = HOT_LAT0 + ((k * PRIME_LAT) % 100) / 1000.0
        lon = HOT_LON0 + ((k * PRIME_LON) % 100) / 1000.0
    elif k % 10 < 5:
        lat = HOT2_LAT0 + ((k * PRIME_LAT) % 100) / 1000.0
        lon = HOT2_LON0 + ((k * PRIME_LON) % 100) / 1000.0
    else:
        lat = BG_LAT0 + ((k * PRIME_LAT) % 4400) / 1000.0
        lon = BG_LON0 + ((k * PRIME_LON) % 4700) / 1000.0
    return {
        "doc_id": f"{entity_prefix_py(k)}{k}", "k": k, "place": place, "name": name,
        "name:sr": name_sr, "name:sr-Latn": name_sr_latn,
        "is_in:country": is_in, "wikipedia": wikipedia,
        "wikidata": wikidata, "highway": highway, "int_name": int_name,
        "lat": lat, "lon": lon, "media_ref": f"img/n{k}",
    }


# ---------------------------------------------------------------- spark
def _arr(values):
    """CASE k%n over a list of python literals (None allowed)."""
    from pyspark.sql import functions as F

    n = len(values)
    k = F.col("k")
    expr = F.lit(None).cast("string")
    for idx in range(n - 1, -1, -1):
        v = values[idx]
        expr = F.when(k % n == idx, F.lit(v).cast("string") if v is not None else F.lit(None).cast("string")).otherwise(expr)
    return expr


def _pick16(names):
    from pyspark.sql import functions as F

    # element_at is 1-based
    return F.element_at(F.array(*[F.lit(s) for s in names]), (F.col("k") % 16 + 1).cast("int"))


def scalar_tags_df(spark, sf_dir: str):
    """Entity attributes as flat columns, derived from ``customer``.

    This is the *synthesis* step, not the engine: the engine consumes the
    span-encoded table from :func:`docs_df` and re-derives tags itself.
    """
    from pyspark.sql import functions as F

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").cast("long").alias("k")
    )
    return _scalar_tags_from_keys(cust)


def scalar_tags_range_df(spark, n: int, partitions: int = 64):
    """Same derivation over ``spark.range`` keys — arbitrary-scale corpus
    for throughput/scaling runs (no testdata dependency, keys ≥ 1)."""
    from pyspark.sql import functions as F

    keys = spark.range(1, n + 1, 1, partitions).select(F.col("id").alias("k"))
    return _scalar_tags_from_keys(keys)


def _scalar_tags_from_keys(cust):
    from pyspark.sql import functions as F
    cyr, lat_, intn = _pick16(CYR_NAMES), _pick16(LAT_NAMES), _pick16(INT_NAMES)
    k = F.col("k")
    title = F.concat(cyr, F.lit(" "), k.cast("string"))

    hot = (k % 10) < 3
    hot2 = (k % 10) < 5
    lat = (
        F.when(hot, F.lit(HOT_LAT0) + ((k * PRIME_LAT) % 100) / F.lit(1000.0))
        .when(hot2, F.lit(HOT2_LAT0) + ((k * PRIME_LAT) % 100) / F.lit(1000.0))
        .otherwise(F.lit(BG_LAT0) + ((k * PRIME_LAT) % 4400) / F.lit(1000.0))
    )
    lon = (
        F.when(hot, F.lit(HOT_LON0) + ((k * PRIME_LON) % 100) / F.lit(1000.0))
        .when(hot2, F.lit(HOT2_LON0) + ((k * PRIME_LON) % 100) / F.lit(1000.0))
        .otherwise(F.lit(BG_LON0) + ((k * PRIME_LON) % 4700) / F.lit(1000.0))
    )

    prefix = (
        F.when(k % 11 < 7, F.lit("n")).when(k % 11 < 10, F.lit("w")).otherwise(F.lit("r"))
    )
    return cust.select(
        F.concat(prefix, k.cast("string")).alias("doc_id"),
        k,
        _arr(PLACES + [None]).alias("place"),
        F.when(k % 7 == 0, F.lit(None).cast("string"))
        .when(k % 7 == 1, F.lit(""))
        .when(k % 7 == 2, lat_)
        .otherwise(cyr)
        .alias("name"),
        F.when(k % 4 == 0, F.lit(None).cast("string"))
        .when(k % 4 == 1, lat_)
        .otherwise(cyr)
        .alias("name:sr"),
        F.when(k % 5 == 0, F.lit(None).cast("string"))
        .when(k % 5 == 1, F.lit(""))
        .when(k % 5 == 2, lat_)
        .when(k % 5 == 3, F.concat(lat_, F.lit("X")))
        .otherwise(cyr)
        .alias("name:sr-Latn"),
        F.when(k % 9 == 0, F.lit("Montenegro"))
        .when(k % 9 <= 2, F.lit("Serbia"))
        .otherwise(F.lit(None).cast("string"))
        .alias("is_in:country"),
        F.when(k % 8 == 0, F.concat(F.lit("sr:"), title))
        .when(k % 8 == 1, F.concat(F.lit("en:"), lat_, F.lit(" "), k.cast("string")))
        .when(k % 8 == 2, F.concat(F.lit("sr:"), cyr, F.lit(" Х"), k.cast("string")))
        .otherwise(F.lit(None).cast("string"))
        .alias("wikipedia"),
        F.when(k % 10 == 0, F.concat(F.lit("Q"), (k * 2 + 1).cast("string")))
        .when(k % 10 == 1, F.concat(F.lit("Q"), (k * 2).cast("string")))
        .otherwise(F.lit(None).cast("string"))
        .alias("wikidata"),
        F.when((k % 12 == 0) | (k % 3 == 1), F.lit("residential"))
        .otherwise(F.lit(None).cast("string"))
        .alias("highway"),
        F.when(k % 15 == 0, intn)
        .when(k % 15 == 1, F.concat(lat_, F.lit("Y")))
        .otherwise(F.lit(None).cast("string"))
        .alias("int_name"),
        lat.alias("lat"),
        lon.alias("lon"),
        F.concat(F.lit("img/n"), k.cast("string")).alias("media_ref"),
    )


def docs_df(spark, sf_dir: str):
    """The canonical interleaved document table ``(doc_id, spans)``.

    Span order: tag spans in :data:`TAG_KEYS` order (absent tags skipped),
    then one geom span (``"lat,lon"`` via round-trippable double casts),
    then one media span. Offsets re-indexed 0..n-1 after the skip, so the
    per-row invariant (kind, text, media_ref, order) is well-defined.
    """
    return _encode_spans(scalar_tags_df(spark, sf_dir))


def docs_range_df(spark, n: int, partitions: int = 64):
    """Arbitrary-scale doc corpus (see :func:`scalar_tags_range_df`)."""
    return _encode_spans(scalar_tags_range_df(spark, n, partitions))


def _encode_spans(st):
    from pyspark.sql import functions as F
    tag_spans = [
        F.when(
            F.col(f"`{key}`").isNotNull(),
            F.struct(
                F.lit("tag").alias("kind"),
                F.concat(F.lit(key + "="), F.col(f"`{key}`")).alias("text"),
                F.lit("").alias("media_ref"),
            ),
        )
        for key in TAG_KEYS
    ]
    geom_span = F.struct(
        F.lit("geom").alias("kind"),
        F.concat(F.col("lat").cast("string"), F.lit(","), F.col("lon").cast("string")).alias("text"),
        F.lit("").alias("media_ref"),
    )
    media_span = F.struct(
        F.lit("media").alias("kind"),
        F.lit("").alias("text"),
        F.col("media_ref").alias("media_ref"),
    )
    spans = F.filter(F.array(*tag_spans, geom_span, media_span), lambda s: s.isNotNull())
    spans = F.transform(
        spans,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return st.select("doc_id", spans.alias("spans"))


def texts_range_df(spark, n: int, partitions: int = 64, words_per_doc: int = 24):
    """Arbitrary-scale (doc_id, text) corpus for dedup/minhash scaling
    runs (the driver's ``documents`` table is fixed at ~500 rows).

    Deterministic word soup with a planted duplicate structure: every
    5th doc repeats its predecessor's text (exact dup), every 7th
    appends a mutation token (near dup) — linear pair counts at every
    scale, live LSH positives, no RNG. The per-doc word offset is a
    quadratic residue mod 1e9+7 so distinct docs land on distinct
    residues (a small linear modulus would collapse the corpus into
    identical-text classes and make the LSH pair space quadratic).
    """
    from pyspark.sql import functions as F

    big_mod = 1_000_000_007
    keys = spark.range(1, n + 1, 1, partitions).select(F.col("id").alias("k"))
    base = F.when(F.col("k") % 5 == 0, F.col("k") - 1).otherwise(F.col("k"))
    offset = (base * base % F.lit(big_mod)) * F.lit(PRIME_LAT) % F.lit(big_mod)
    words = F.transform(
        F.sequence(F.lit(1), F.lit(words_per_doc)),
        lambda i: F.concat(
            F.lit("w"), ((offset + i.cast("long") * PRIME_LON) % big_mod).cast("string")
        ),
    )
    text = F.concat_ws(" ", words)
    text = F.when(
        F.col("k") % 7 == 0, F.concat(text, F.lit(" zz"), (F.col("k") % 3).cast("string"))
    ).otherwise(text)
    return keys.select(F.col("k").alias("doc_id"), text.alias("text"))


def wiki_pages_df(spark, sf_dir: str):
    """Static Wikipedia snapshot dimension (title, has_box, lat, lon,
    wikidata_q).

    One row per ``sr:``-tagged document title (k%8==0). Shapes:
    k%21==0 → ~111 km away (>20 km gate fails, C8), k%21==1 → box present
    but no coords (гшир/гдуж missing, C8 error), k%21==2 → no place
    infobox at all (CalculateDistanceException 'no valid boxes', C8
    error), else ~1 km (pass).
    """
    from pyspark.sql import functions as F

    st = scalar_tags_df(spark, sf_dir).filter(F.col("k") % 8 == 0)
    k = F.col("k")
    return st.select(
        F.substring(F.col("wikipedia"), 4, 1000000).alias("title"),
        (k % 21 != 2).alias("has_box"),
        F.when(k % 21 == 0, F.col("lat") + 1.0)
        .when(k % 21 == 1, F.lit(None).cast("double"))
        .otherwise(F.col("lat") + 0.01)
        .alias("w_lat"),
        F.when(k % 21 == 0, F.col("lon"))
        .when(k % 21 == 1, F.lit(None).cast("double"))
        .otherwise(F.col("lon") + 0.01)
        .alias("w_lon"),
        F.concat(F.lit("Q"), (k * 2 + 1).cast("string")).alias("wikidata_q"),
    )


def wikidata_items_df(spark, sf_dir: str):
    """Static Wikidata snapshot dimension (q_id, label_sr).

    Only odd Q ids exist (even Q ⇒ dangling ⇒ C10 error, the analogue of
    ``pageid == 0`` at reference ``src/checks.py:627``). Labels: k%3==0 →
    matches the wikipedia title, k%5==0 → NULL (no 'sr' label ⇒ C11
    skips), else a mismatching literal (C11 error).
    """
    from pyspark.sql import functions as F

    st = scalar_tags_df(spark, sf_dir).filter(F.col("k") % 10 == 0)
    k = F.col("k")
    cyr = _pick16(CYR_NAMES)
    title = F.concat(cyr, F.lit(" "), k.cast("string"))
    return st.select(
        F.concat(F.lit("Q"), (k * 2 + 1).cast("string")).alias("q_id"),
        F.when(k % 3 == 0, title)
        .when(k % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.lit("друга етикета"))
        .alias("label_sr"),
    )


# ------------------------------------------------------------------ sql
def _sql_pick16(names) -> str:
    whens = " ".join(
        f"WHEN {i} THEN '" + names[i].replace("'", "''") + "'" for i in range(16)
    )
    return f"(CASE (k % 16) {whens} END)"


def sql_scalar_tags() -> str:
    """DuckDB CTE body producing the same entity attributes from
    ``customer`` — the oracle's independent twin of :func:`scalar_tags_df`."""
    cyr, lat_, intn = _sql_pick16(CYR_NAMES), _sql_pick16(LAT_NAMES), _sql_pick16(INT_NAMES)
    title = f"({cyr} || ' ' || CAST(k AS VARCHAR))"
    return f"""
    SELECT
      (CASE WHEN k % 11 < 7 THEN 'n' WHEN k % 11 < 10 THEN 'w' ELSE 'r' END)
        || CAST(k AS VARCHAR) AS doc_id,
      k,
      CASE (k % 6) WHEN 0 THEN 'city' WHEN 1 THEN 'town' WHEN 2 THEN 'village'
                   WHEN 3 THEN 'suburb' WHEN 4 THEN 'CiTy' ELSE NULL END AS place,
      CASE WHEN k % 7 = 0 THEN NULL WHEN k % 7 = 1 THEN ''
           WHEN k % 7 = 2 THEN {lat_} ELSE {cyr} END AS name,
      CASE WHEN k % 4 = 0 THEN NULL WHEN k % 4 = 1 THEN {lat_} ELSE {cyr} END AS name_sr,
      CASE WHEN k % 5 = 0 THEN NULL WHEN k % 5 = 1 THEN ''
           WHEN k % 5 = 2 THEN {lat_}
           WHEN k % 5 = 3 THEN {lat_} || 'X' ELSE {cyr} END AS name_sr_latn,
      CASE WHEN k % 9 = 0 THEN 'Montenegro' WHEN k % 9 <= 2 THEN 'Serbia'
           ELSE NULL END AS is_in_country,
      CASE WHEN k % 8 = 0 THEN 'sr:' || {title}
           WHEN k % 8 = 1 THEN 'en:' || {lat_} || ' ' || CAST(k AS VARCHAR)
           WHEN k % 8 = 2 THEN 'sr:' || {cyr} || ' Х' || CAST(k AS VARCHAR)
           ELSE NULL END AS wikipedia,
      CASE WHEN k % 10 = 0 THEN 'Q' || CAST(k * 2 + 1 AS VARCHAR)
           WHEN k % 10 = 1 THEN 'Q' || CAST(k * 2 AS VARCHAR)
           ELSE NULL END AS wikidata,
      CASE WHEN k % 12 = 0 OR k % 3 = 1 THEN 'residential' ELSE NULL END AS highway,
      CASE WHEN k % 15 = 0 THEN {intn}
           WHEN k % 15 = 1 THEN {lat_} || 'Y' ELSE NULL END AS int_name,
      CASE WHEN k % 10 < 3 THEN {HOT_LAT0} + ((k * {PRIME_LAT}) % 100) / 1000.0
           WHEN k % 10 < 5 THEN {HOT2_LAT0} + ((k * {PRIME_LAT}) % 100) / 1000.0
           ELSE {BG_LAT0} + ((k * {PRIME_LAT}) % 4400) / 1000.0 END AS lat,
      CASE WHEN k % 10 < 3 THEN {HOT_LON0} + ((k * {PRIME_LON}) % 100) / 1000.0
           WHEN k % 10 < 5 THEN {HOT2_LON0} + ((k * {PRIME_LON}) % 100) / 1000.0
           ELSE {BG_LON0} + ((k * {PRIME_LON}) % 4700) / 1000.0 END AS lon,
      'img/n' || CAST(k AS VARCHAR) AS media_ref
    FROM (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer)
    """


def sql_wiki_pages() -> str:
    cyr = _sql_pick16(CYR_NAMES)
    title = f"({cyr} || ' ' || CAST(k AS VARCHAR))"
    return f"""
    SELECT {title} AS title,
           (k % 21 <> 2) AS has_box,
           CASE WHEN k % 21 = 0 THEN lat + 1.0
                WHEN k % 21 = 1 THEN NULL ELSE lat + 0.01 END AS w_lat,
           CASE WHEN k % 21 = 0 THEN lon
                WHEN k % 21 = 1 THEN NULL ELSE lon + 0.01 END AS w_lon,
           'Q' || CAST(k * 2 + 1 AS VARCHAR) AS wikidata_q
    FROM ({sql_scalar_tags()}) WHERE k % 8 = 0
    """


def sql_wikidata_items() -> str:
    cyr = _sql_pick16(CYR_NAMES)
    title = f"({cyr} || ' ' || CAST(k AS VARCHAR))"
    return f"""
    SELECT 'Q' || CAST(k * 2 + 1 AS VARCHAR) AS q_id,
           CASE WHEN k % 3 = 0 THEN {title}
                WHEN k % 5 = 0 THEN NULL
                ELSE 'друга етикета' END AS label_sr
    FROM ({sql_scalar_tags()}) WHERE k % 10 = 0
    """
