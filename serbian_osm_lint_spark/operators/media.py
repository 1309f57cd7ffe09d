# -*- coding: utf-8 -*-
"""Multimodal column plumbing: decode / feature-extract over media spans.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata. The decode step is STUBBED (no imaging/audio libs in the
container — gated behind import-try with a deterministic fake); the
Spark-side plumbing — schema, Arrow batch shape, ``mapInPandas``
signature, partition behavior — is real and tested.

At 10^12 docs this is the pattern for the heavy modality stages: a
narrow projection feeding ``mapInPandas`` (per-partition Arrow batches),
no shuffle, output co-partitioned with the input.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

#: schema of the extracted media-feature rows.
MEDIA_FEATURES_SCHEMA = (
    "doc_id string, media_ref string, byte_len int, width int, height int, "
    "feature array<float>"
)

FEATURE_DIM = 8


def _decode_image_stub(payload: bytes):
    """Deterministic fake decode: (width, height) derived from the payload
    hash. Raises NotImplementedError if asked for a real decode."""
    h = hashlib.md5(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def try_real_decode(payload: bytes):
    """Real decoder hook — requires PIL, absent in this image."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - expected in sandbox
        raise NotImplementedError("image decode requires PIL (not installed)") from exc
    raise NotImplementedError("real decode path not wired in the sandbox")


def media_payloads_df(spark, docs):
    """Media spans as opaque binary payloads (synthetic: payload bytes are
    the media_ref utf-8 — a deterministic stand-in for blob fetch)."""
    from pyspark.sql import functions as F

    from .spans import with_flat_entity

    ent = with_flat_entity(docs)
    return ent.select(
        "doc_id",
        F.explode("media_refs").alias("media_ref"),
    ).withColumn("payload", F.encode(F.col("media_ref"), "utf-8"))


def extract_media_features_df(spark, docs, batch_hint: int = 1024):
    """mapInPandas feature extraction: decode-stub + md5-derived feature
    vector per media span. Arrow-batched; no per-row Python at the Spark
    boundary (the loop is inside the vectorizable batch function)."""
    src = media_payloads_df(spark, docs)

    def extract(batches):
        for pdf in batches:
            n = len(pdf)
            widths = np.empty(n, dtype=np.int32)
            heights = np.empty(n, dtype=np.int32)
            feats = []
            for i, payload in enumerate(pdf["payload"]):
                w, h = _decode_image_stub(bytes(payload))
                widths[i] = w
                heights[i] = h
                digest = hashlib.md5(bytes(payload)).digest()
                feats.append(
                    np.frombuffer(digest[:FEATURE_DIM], dtype=np.uint8).astype(np.float32)
                    / 255.0
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "byte_len": pdf["payload"].map(len).astype("int32"),
                    "width": widths,
                    "height": heights,
                    "feature": feats,
                }
            )

    return src.mapInPandas(extract, MEDIA_FEATURES_SCHEMA)
