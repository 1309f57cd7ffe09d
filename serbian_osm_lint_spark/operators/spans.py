# -*- coding: utf-8 -*-
"""Span codec: interleaved document ↔ entity attribute projections.

The engine's only structural invariant on its input is the span sequence
``(kind, text, media_ref, order)`` (BASELINE.json ``input_hint``). Every
downstream operator works on *projections* of the spans — a
``map<string,string>`` of tags, a (lat, lon) pair, an array of media refs
— never mutating the spans themselves, so span-sequence equality holds by
construction (asserted in tests/test_spans_invariant.py).

Equivalent of reference entity normalization ``src/osm_lint_entity.py:14-58``
(tags dict + lat/lon floats), done as pure Catalyst expressions.
"""

from __future__ import annotations


def entity_type_col(doc_id_col):
    """doc_id prefix ⇒ entity type ∈ {node, way, relation} — the engine's
    analogue of reference ``src/osm_lint_entity.py:60-87`` (type detection
    from the source record class / URL)."""
    from pyspark.sql import functions as F

    first = F.substring(doc_id_col, 1, 1)
    return (
        F.when(first == "n", F.lit("node"))
        .when(first == "w", F.lit("way"))
        .otherwise(F.lit("relation"))
    )


def with_entity_projection(docs):
    """Project tags/geom/media out of ``spans`` (no shuffle, codegen only).

    Adds columns:
      * ``tags``: map<string,string> from spans of kind 'tag' whose text is
        ``key=value`` (split at the FIRST '=', values may contain '=');
      * ``lat``, ``lon``: doubles from the first 'geom' span (``"lat,lon"``);
      * ``media_refs``: array<string> from 'media' spans (span order kept);
      * ``osm_id``: the numeric part of ``doc_id`` (reference entity id).
    """
    from pyspark.sql import functions as F

    spans = F.array_sort(
        F.col("spans"),
        lambda a, b: a["offset"] - b["offset"],
    )
    tag_entries = F.transform(
        F.filter(spans, lambda s: s["kind"] == "tag"),
        lambda s: F.struct(
            F.split_part(s["text"], F.lit("="), F.lit(1)).alias("key"),
            # everything after the first '=' (value may itself contain '=')
            F.substring(
                s["text"], F.length(F.split_part(s["text"], F.lit("="), F.lit(1))) + 2, 1000000
            ).alias("value"),
        ),
    )
    geom_text = F.try_element_at(F.filter(spans, lambda s: s["kind"] == "geom"), F.lit(1))["text"]
    return (
        docs.withColumn("tags", F.map_from_entries(tag_entries))
        .withColumn("lat", F.split_part(geom_text, F.lit(","), F.lit(1)).cast("double"))
        .withColumn("lon", F.split_part(geom_text, F.lit(","), F.lit(2)).cast("double"))
        .withColumn(
            "media_refs",
            F.transform(F.filter(spans, lambda s: s["kind"] == "media"), lambda s: s["media_ref"]),
        )
        .withColumn("osm_id", F.substring(F.col("doc_id"), 2, 1000000))
        .withColumn("entity_type", entity_type_col(F.col("doc_id")))
    )


#: flat-column aliases for the well-known tag keys (open-world tags stay
#: available through :func:`with_entity_projection`'s map).
FLAT_KEYS = {
    "place": ("a_place", "h_place"),
    "name": ("a_name", "h_name"),
    "name:sr": ("a_name_sr", "h_name_sr"),
    "name:sr-Latn": ("a_latn", "h_latn"),
    "is_in:country": ("a_isin", "h_isin"),
    "wikipedia": ("a_wp", "h_wp"),
    "wikidata": ("a_wd", "h_wd"),
    "highway": ("a_highway", "h_highway"),
    "int_name": ("a_int_name", "h_int_name"),
}


def with_flat_entity(docs):
    """Fast-path projection: the well-known tag keys extracted directly
    from the spans (prefix match on ``key=``), skipping map construction.

    Measured ~2× cheaper than map-decode+lookups (the HOF expressions are
    interpreted, so fewer passes win); unused aliases are pruned by
    Catalyst, so one helper serves every operator. Emits per key a value
    column (NULL = tag absent; '' = present-empty) and a presence column,
    plus ``lat``/``lon``, ``media_refs`` (span order kept) and ``osm_id``.

    Spans are offset-sorted ONCE up front (round-1 ADVICE), so first-hit
    semantics (duplicate keys, first geom span) agree with
    :func:`with_entity_projection` / :func:`canonical_spans` even when
    the stored array order differs from offset order.
    """
    from pyspark.sql import functions as F

    # own projection layer: the sorted array binds as an attribute, so the
    # sort evaluates once per row instead of once per consuming expression
    docs = docs.select(
        "*",
        F.array_sort(F.col("spans"), lambda a, b: a["offset"] - b["offset"]).alias(
            "_spans_sorted"
        ),
    )
    spans = F.col("_spans_sorted")

    def _hit(pref):
        # NB: lambdas passed to F.filter must take exactly one arg — a
        # second parameter (even a default) receives the element INDEX.
        return F.try_element_at(
            F.filter(spans, lambda s: (s["kind"] == "tag") & s["text"].startswith(pref)),
            F.lit(1),
        )

    cols = []
    for key, (a, h) in FLAT_KEYS.items():
        hit = _hit(key + "=")
        cols.append(F.substring(hit["text"], len(key) + 2, 1000000).alias(a))
        cols.append(hit.isNotNull().alias(h))
    geom_first = F.try_element_at(F.filter(spans, lambda s: s["kind"] == "geom"), F.lit(1))[
        "text"
    ]
    media = F.transform(
        F.filter(spans, lambda s: s["kind"] == "media"), lambda s: s["media_ref"]
    )
    return docs.select(
        "*",
        *cols,
        F.split_part(geom_first, F.lit(","), F.lit(1)).cast("double").alias("lat"),
        F.split_part(geom_first, F.lit(","), F.lit(2)).cast("double").alias("lon"),
        media.alias("media_refs"),
        F.substring(F.col("doc_id"), 2, 1000000).alias("osm_id"),
        entity_type_col(F.col("doc_id")).alias("entity_type"),
    ).drop("_spans_sorted")


def canonical_spans(docs):
    """Spans normalized to a comparable form: sorted by offset, projected to
    the invariant tuple (kind, text, media_ref, order-index). Used by the
    span-sequence-equality tests and by sinks that must prove they did not
    reorder or drop spans."""
    from pyspark.sql import functions as F

    spans = F.array_sort(F.col("spans"), lambda a, b: a["offset"] - b["offset"])
    return docs.select(
        "doc_id",
        F.transform(
            spans,
            lambda s, i: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                i.alias("order"),
            ),
        ).alias("span_seq"),
    )
