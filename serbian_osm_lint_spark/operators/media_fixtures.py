# -*- coding: utf-8 -*-
"""Deterministic REAL-format media payload fixtures (VERDICT r4 item 5).

The synthetic corpus's media payloads are utf-8 refs, so the 48-query
oracle gate only ever exercised the md5 stub path; the real PNG/JPEG/GIF/
WAV/MP4 header walks were pytest-only. These fixtures put one payload of
EACH real container format under the end-to-end hash gate: the Spark face
genuinely runs the header parses inside ``mapInPandas``, while the DuckDB
twins emit authoring-time literal rows — DuckDB cannot parse binary
containers (and its ``md5`` is VARCHAR-only), so the literals are the
honest oracle form; their values are independently pinned by the direct
header-parse unit tests in ``tests/test_dedup_text.py``.

Payload constructors are pure struct/zlib builders (no imaging/audio
libs), byte-identical to the unit-test fixtures by construction.
"""

from __future__ import annotations

import hashlib
import struct
import zlib


# ------------------------------------------------------------ constructors
def make_png(w: int, h: int) -> bytes:
    """Minimal complete PNG (8-bit RGB, black) — magic + IHDR + IDAT + IEND
    with correct crc32s."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(3 * w) for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_jpeg(w: int, h: int) -> bytes:
    """Minimal JPEG marker stream: SOI, APP0 (JFIF), a COM segment the
    walker must skip, SOF0 with the dims, SOS, EOI."""

    def seg(marker: int, data: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data

    sof0 = struct.pack(">BHHB", 8, h, w, 3) + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    return (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xFE, b"fixture comment segment")
        + seg(0xC0, sof0)
        + seg(0xDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
        + b"\xff\xd9"
    )


def make_gif(w: int, h: int) -> bytes:
    """GIF89a header + logical screen descriptor (little-endian dims)."""
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00\x3b"


def make_wav(rate: int, channels: int, bits: int, n_samples: int) -> bytes:
    """Minimal canonical WAV: RIFF header, a LIST chunk the walker must
    skip, fmt chunk, data chunk of silence."""
    block = channels * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    data = bytes(n_samples * block)
    chunks = (
        b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def make_mp4(w: int, h: int, duration_s: int, timescale: int = 600) -> bytes:
    """Minimal ISO-BMFF tree: ftyp, a free box the walker must skip,
    moov(mvhd v0 + trak(tkhd v0))."""

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + typ + body

    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, duration_s * timescale) + bytes(80),
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07" + bytes(72) + struct.pack(">II", w << 16, h << 16),
    )
    return (
        box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
        + box(b"free", b"\x00" * 12)
        + box(b"moov", mvhd + box(b"trak", tkhd))
    )


#: (doc_id, media_ref, payload) — one real payload per container family.
#: Dims/rates chosen so real-parse values differ visibly from any stub
#: output (stub dims are always < 256).
FIXTURES: list[tuple[str, str, bytes]] = [
    ("fixture_png", "fixture/640x360.png", make_png(640, 360)),
    ("fixture_jpeg", "fixture/800x600.jpg", make_jpeg(800, 600)),
    ("fixture_gif", "fixture/320x200.gif", make_gif(320, 200)),
    ("fixture_wav", "fixture/16k_stereo_3s.wav", make_wav(16000, 2, 16, 48000)),
    ("fixture_mp4", "fixture/1280x720_7s.mp4", make_mp4(1280, 720, 7)),
]


def fixture_payloads_df(spark):
    """The fixture payloads as a 5-row (doc_id, media_ref, payload) frame
    matching :func:`..operators.media.media_payloads_df`'s schema."""
    return spark.createDataFrame(
        [(d, r, bytearray(p)) for d, r, p in FIXTURES],
        "doc_id string, media_ref string, payload binary",
    )


# ------------------------------------------------- expected rows (Python)
# Each generator replays the EXACT per-payload branch of the corresponding
# mapInPandas extractor on the fixture bytes, driver-side at SQL-authoring
# time, so the twin literals track the Spark spec. Because that replay
# calls the same parsers under test (ADVICE r5: a parser bug would appear
# identically on both faces), every real-format parse is ALSO pinned at
# authoring time against the independent constants below — the values the
# containers were authored to carry. A parser regression now fails SQL
# authoring itself, keeping the oracle rows independent of the code under
# test.
_PINNED_DIMS = {
    "fixture_png": (640, 360),
    "fixture_jpeg": (800, 600),
    "fixture_gif": (320, 200),
}
_PINNED_WAV = (16000, 2, 16, 48000)  # rate, channels, bits, n_samples
_PINNED_MP4 = (1280, 720, 7)  # width, height, sampled frame count


def _pin(doc_id: str, got, want) -> None:
    if got != want:
        raise AssertionError(
            f"fixture parser drift for {doc_id}: parsed {got}, authored {want}"
        )


def _feature_rows():
    import numpy as np

    from .media import FEATURE_DIM, _decode_dims

    for doc_id, ref, payload in FIXTURES:
        digest = hashlib.md5(payload).digest()
        w, h = _decode_dims(payload, digest)
        if doc_id in _PINNED_DIMS:
            _pin(doc_id, (w, h), _PINNED_DIMS[doc_id])
        # np.round, not builtin round: replays the extractor's exact
        # float, bit-for-bit (the two can differ in the last ulp).
        feats = [float(np.round(digest[j] / 255.0, 6)) for j in range(FEATURE_DIM)]
        yield doc_id, ref, len(payload), w, h, feats


def _frame_rows():
    from .media import (
        FRAME_STRIDE,
        _decode_image_stub,
        try_real_video_probe,
    )

    for doc_id, ref, payload in FIXTURES:
        digest = hashlib.md5(payload).digest()
        if len(payload) >= 12 and payload[4:8] == b"ftyp":
            _, _, dur_ms, w, h = try_real_video_probe(payload)
            if w == 0 or h == 0:
                w, h = _decode_image_stub(digest)
            n_frames = max(1, min(64, int(dur_ms // 1000)))
            _pin(doc_id, (w, h, n_frames), _PINNED_MP4)
        else:
            w, h = _decode_image_stub(digest)
            n_frames = 8 + digest[2] % 8
        for idx in range(0, n_frames, FRAME_STRIDE):
            fmd5 = hashlib.md5(payload + b":" + str(idx).encode()).hexdigest()
            yield doc_id, ref, n_frames, idx, fmd5, min(w // 2, 64), min(h // 2, 64)


def _audio_rows():
    from .media import _audio_probe_stub, try_real_audio_probe

    for doc_id, ref, payload in FIXTURES:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            rate, ch, bits, n = try_real_audio_probe(payload)
            _pin(doc_id, (rate, ch, bits, n), _PINNED_WAV)
        else:
            rate, ch, bits, n = _audio_probe_stub(hashlib.md5(payload).digest())
        yield doc_id, ref, len(payload), rate, ch, bits, n, n * 1_000_000 // rate


# ------------------------------------------------------ SQL literal rows
def _lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def sql_feature_fixture_rows() -> str:
    rows = []
    for doc_id, ref, blen, w, h, feats in _feature_rows():
        cols = [
            f"{_lit(doc_id)} AS doc_id",
            f"{_lit(ref)} AS media_ref",
            f"CAST({blen} AS INT) AS byte_len",
            f"CAST({w} AS INT) AS width",
            f"CAST({h} AS INT) AS height",
        ] + [f"CAST({_lit(f)} AS DOUBLE) AS feature_{j}" for j, f in enumerate(feats)]
        rows.append("SELECT " + ", ".join(cols))
    return " UNION ALL ".join(rows)


def sql_frame_fixture_rows() -> str:
    rows = []
    for doc_id, ref, nf, idx, fmd5, rw, rh in _frame_rows():
        rows.append(
            f"SELECT {_lit(doc_id)} AS doc_id, {_lit(ref)} AS media_ref, "
            f"CAST({nf} AS INT) AS n_frames, CAST({idx} AS INT) AS frame_idx, "
            f"{_lit(fmd5)} AS frame_md5, CAST({rw} AS INT) AS resized_w, "
            f"CAST({rh} AS INT) AS resized_h"
        )
    return " UNION ALL ".join(rows)


def sql_audio_fixture_rows() -> str:
    rows = []
    for doc_id, ref, blen, rate, ch, bits, n, dur in _audio_rows():
        rows.append(
            f"SELECT {_lit(doc_id)} AS doc_id, {_lit(ref)} AS media_ref, "
            f"CAST({blen} AS INT) AS byte_len, CAST({rate} AS INT) AS sample_rate, "
            f"CAST({ch} AS INT) AS channels, CAST({bits} AS INT) AS bits_per_sample, "
            f"CAST({n} AS BIGINT) AS n_samples, CAST({dur} AS BIGINT) AS duration_us"
        )
    return " UNION ALL ".join(rows)
