# -*- coding: utf-8 -*-
"""F8 + P10: Sophox binding-row parsers and the malformed-entity skip.

Reference ``OsmLintEntity`` parses Sophox rows with two regexes
(``src/osm_lint_entity.py:5-6,37-49``): entity type + id from the OSM URL,
and coordinates from a ``Point(a b)`` literal — where the reference treats
the FIRST number as latitude (a latent axis swap vs true WKT; we replicate
the reference's observable convention here and note it). Rows that fail to
parse are dropped and counted, the Spark analogue of the
``AttributeError``-skip at ``src/sources/osm_source.py:31-36`` (P10):
permissive regex extract → NULL → filter, with the drop count observable
via ``observe()`` instead of a log line.
"""

from __future__ import annotations

URL_RE = r"^https?://www\.openstreetmap\.org/(node|way|relation)/([0-9]+)$"
POINT_RE = r"^Point\(([-0-9.]+) ([-0-9.]+)\)$"


# ------------------------------------------------------------------ spark
def parse_entity_url_cols(url_col):
    from pyspark.sql import functions as F

    etype = F.regexp_extract(url_col, URL_RE, 1)
    eid = F.regexp_extract(url_col, URL_RE, 2)
    return (
        F.when(etype != "", etype).alias("entity_type"),
        F.when(eid != "", eid.cast("long")).alias("osm_id"),
    )


def parse_point_cols(loc_col):
    """Reference convention: first coordinate is LAT (src/osm_lint_entity.py:44-49)."""
    from pyspark.sql import functions as F

    a = F.regexp_extract(loc_col, POINT_RE, 1)
    b = F.regexp_extract(loc_col, POINT_RE, 2)
    return (
        F.when(a != "", a.cast("double")).alias("lat"),
        F.when(b != "", b.cast("double")).alias("lon"),
    )


def parse_sophox_rows_df(spark, sf_dir: str):
    """Parse synthetic Sophox binding rows; malformed rows dropped (P10).

    Row synthesis (both engines): every 11th row has a garbage URL and
    every 13th a garbage Point — those must not survive.
    """
    from pyspark.sql import functions as F

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").cast("long").alias("k")
    )
    etype = (
        F.when(F.col("k") % 3 == 0, F.lit("node"))
        .when(F.col("k") % 3 == 1, F.lit("way"))
        .otherwise(F.lit("relation"))
    )
    url = F.when(F.col("k") % 11 == 0, F.lit("not-a-url")).otherwise(
        F.concat(
            F.lit("https://www.openstreetmap.org/"), etype, F.lit("/"), F.col("k").cast("string")
        )
    )
    lat = F.round(F.lit(42.0) + (F.col("k") % 400) / F.lit(100.0), 6)
    lon = F.round(F.lit(19.0) + (F.col("k") % 300) / F.lit(100.0), 6)
    loc = F.when(F.col("k") % 13 == 0, F.lit("Point(broken)")).otherwise(
        F.concat(
            F.lit("Point("),
            F.format_string("%.6f", lat),
            F.lit(" "),
            F.format_string("%.6f", lon),
            F.lit(")"),
        )
    )
    rows = cust.select(F.col("k"), url.alias("url"), loc.alias("loc"))
    et, oid = parse_entity_url_cols(F.col("url"))
    plat, plon = parse_point_cols(F.col("loc"))
    parsed = rows.select("k", et, oid, plat, plon)
    return parsed.filter(
        F.col("entity_type").isNotNull() & F.col("lat").isNotNull()
    ).select("entity_type", "osm_id", "lat", "lon")


# -------------------------------------------------------------------- sql
def sql_parse_sophox_rows() -> str:
    return f"""
    WITH base AS (
      SELECT CAST(c_custkey AS BIGINT) AS k,
        CASE WHEN k % 3 = 0 THEN 'node' WHEN k % 3 = 1 THEN 'way' ELSE 'relation' END AS etype,
        round(42.0 + (CAST(c_custkey AS BIGINT) % 400) / 100.0, 6) AS slat,
        round(19.0 + (CAST(c_custkey AS BIGINT) % 300) / 100.0, 6) AS slon
      FROM customer
    ),
    rows_ AS (
      SELECT k,
        CASE WHEN k % 11 = 0 THEN 'not-a-url'
             ELSE 'https://www.openstreetmap.org/' || etype || '/' || CAST(k AS VARCHAR) END AS url,
        CASE WHEN k % 13 = 0 THEN 'Point(broken)'
             ELSE 'Point(' || printf('%.6f', slat) || ' ' || printf('%.6f', slon) || ')' END AS loc
      FROM base
    ),
    parsed AS (
      SELECT
        nullif(regexp_extract(url, '{URL_RE}', 1), '') AS entity_type,
        CAST(nullif(regexp_extract(url, '{URL_RE}', 2), '') AS BIGINT) AS osm_id,
        CAST(nullif(regexp_extract(loc, '{POINT_RE}', 1), '') AS DOUBLE) AS lat,
        CAST(nullif(regexp_extract(loc, '{POINT_RE}', 2), '') AS DOUBLE) AS lon
      FROM rows_
    )
    SELECT entity_type, osm_id, lat, lon FROM parsed
    WHERE entity_type IS NOT NULL AND lat IS NOT NULL
    """
