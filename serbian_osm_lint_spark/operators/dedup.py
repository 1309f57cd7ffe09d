# -*- coding: utf-8 -*-
"""Deduplication suite over the ``documents`` table (training-data ops).

Scale shapes:
  * exact dedup — one shuffle on the 16-byte fingerprint (hash groupBy);
    at 10^12 docs this is the classic map-side-combine count;
  * MinHash+LSH — signatures are per-row native expressions (no shuffle),
    banding explodes ``n_bands`` rows per doc, candidate generation is a
    self-equi-join on the band key (shuffle on band buckets, which are
    ~uniform by construction), verification re-checks exact Jaccard on
    the candidate set only;
  * SimHash — 64-bit signature via vectorized numpy pandas UDF; near-dup
    = hamming distance ≤ r on banded prefix buckets (Spark-only — no SQL
    oracle; bit-level parity across engines isn't worth the contortion);
  * n-gram Jaccard — exact word-3-gram Jaccard on LSH candidates.

The driver corpus has no natural duplicates, so the dedup queries run
over :func:`with_near_dups` — the corpus unioned with deterministic
mutated/exact copies (same derivation in both engines), which gives the
operators live positives at every scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

N_HASHES = 8
N_BANDS = 4  # rows per band = N_HASHES // N_BANDS = 2
JACCARD_THRESHOLD = 0.5


# ----------------------------------------------------------- corpus prep
def with_near_dups_df(spark, sf_dir: str):
    """documents ∪ exact copies (doc_id%7==0) ∪ mutated copies
    (doc_id%10==0, one token appended). Copy ids are offset by 10^6/2·10^6."""
    from pyspark.sql import functions as F

    # single-file parquet scans read as ONE partition; the md5/shingle
    # work is CPU-bound, so spread rows across the cluster first (a real
    # 100 TB table arrives pre-split into many files/row-groups).
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .repartition(int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    )
    exact = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    mutated = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz_mutation")).alias("text"),
        )
    )
    return docs.unionByName(exact).unionByName(mutated)


def sql_with_near_dups() -> str:
    return (
        "SELECT doc_id, text FROM documents "
        "UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0 "
        "UNION ALL SELECT doc_id + 2000000 AS doc_id, text || ' zz_mutation' AS text "
        "FROM documents WHERE doc_id % 10 = 0"
    )


# ------------------------------------------------------------ exact dedup
def dedup_exact_df(spark, sf_dir: str):
    """(doc_id, canonical_id, is_dup): canonical = min doc_id per
    fingerprint group. One shuffle on the fingerprint."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.text import fingerprint_col

    docs = with_near_dups_df(spark, sf_dir)
    fp = docs.select("doc_id", fingerprint_col(F.col("text")).alias("fp"))
    w = Window.partitionBy("fp")
    return fp.select(
        "doc_id",
        F.min("doc_id").over(w).alias("canonical_id"),
        (F.col("doc_id") != F.min("doc_id").over(w)).alias("is_dup"),
    )


def sql_dedup_exact() -> str:
    from ..functions.text import sql_fingerprint

    return (
        f"WITH d AS ({sql_with_near_dups()}), "
        f"fp AS (SELECT doc_id, {sql_fingerprint('text')} AS fp FROM d) "
        f"SELECT doc_id, min(doc_id) OVER (PARTITION BY fp) AS canonical_id, "
        f"doc_id <> min(doc_id) OVER (PARTITION BY fp) AS is_dup FROM fp"
    )


# ------------------------------------------------------------ minhash LSH
def _shingles_col(text_col):
    """Distinct word-3-gram shingles (native expressions)."""
    from pyspark.sql import functions as F

    words = F.split(F.trim(text_col), r"\s+")
    n = F.size(words)
    return F.array_distinct(
        F.when(
            n >= 3,
            F.transform(
                F.sequence(F.lit(1), n - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(words, i), F.element_at(words, i + 1), F.element_at(words, i + 2)
                ),
            ),
        ).otherwise(F.array(F.concat_ws(" ", words)))
    )


def _sql_shingles(text: str) -> str:
    words = f"regexp_split_to_array(trim({text}), '\\s+')"
    return (
        f"list_distinct(CASE WHEN len({words}) >= 3 THEN "
        f"[{words}[i] || ' ' || {words}[i+1] || ' ' || {words}[i+2] "
        f"FOR i IN range(1, len({words}) - 1)] "
        f"ELSE [array_to_string({words}, ' ')] END)"
    )


def minhash_signatures_df(spark, sf_dir: str):
    """(doc_id, sig_0..sig_7): min-hash signatures from md5 hex chunks.

    Cost discipline: md5 is the expensive op, so each shingle gets TWO
    md5s (``md5(s)``, ``md5(s || '#')``) and the 8 "permutations" are the
    8 non-overlapping 32-bit (8-hex-char) slices -- fixed-width lowercase
    hex compares lexicographically == numerically, so string ``min`` is a
    valid min-hash. 4x cheaper than 8 independent md5 passes.

    NB (transform lambdas): one arg only -- a second parameter would
    receive the element *index*.
    """
    from pyspark.sql import functions as F

    docs = with_near_dups_df(spark, sf_dir)
    sh = docs.select("doc_id", _shingles_col(F.col("text")).alias("shingles"))
    sh = sh.select(
        "doc_id",
        F.transform(F.col("shingles"), lambda s: F.md5(s)).alias("h1"),
        F.transform(F.col("shingles"), lambda s: F.md5(F.concat(s, F.lit("#")))).alias("h2"),
    )

    def _sig(i):
        src = F.col("h1") if i < 4 else F.col("h2")
        off = (i % 4) * 8 + 1
        return F.array_min(F.transform(src, lambda h: F.substring(h, off, 8))).alias(f"sig_{i}")

    return sh.select("doc_id", *[_sig(i) for i in range(N_HASHES)])


def sql_minhash_signatures() -> str:
    sh = _sql_shingles("text")
    sigs = []
    for i in range(N_HASHES):
        src = "h1" if i < 4 else "h2"
        off = (i % 4) * 8 + 1
        sigs.append(f"list_min([substring(h, {off}, 8) FOR h IN {src}]) AS sig_{i}")
    return (
        f"WITH d AS ({sql_with_near_dups()}), "
        f"sh0 AS (SELECT doc_id, {sh} AS shingles FROM d), "
        f"sh AS (SELECT doc_id, [md5(s) FOR s IN shingles] AS h1, "
        f"[md5(s || '#') FOR s IN shingles] AS h2 FROM sh0) "
        f"SELECT doc_id, {', '.join(sigs)} FROM sh"
    )


def minhash_lsh_pairs_df(spark, sf_dir: str):
    """LSH candidates (band-bucket equi-join) verified by exact Jaccard.

    Output: (doc_id_a, doc_id_b, jaccard) with jaccard ≥ threshold.
    """
    from pyspark.sql import functions as F

    docs = with_near_dups_df(spark, sf_dir)
    sh = docs.select("doc_id", _shingles_col(F.col("text")).alias("shingles"))
    sig = minhash_signatures_df(spark, sf_dir)
    rows_per_band = N_HASHES // N_BANDS
    band_keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(str(b)),
                    *[F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)],
                )
            )
            for b in range(N_BANDS)
        ]
    )
    banded = sig.select("doc_id", F.explode(band_keys).alias("band_key"))
    cand = (
        banded.alias("a")
        .join(banded.alias("b"), "band_key")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b"))
        .distinct()
    )
    a_sh = sh.select(F.col("doc_id").alias("doc_id_a"), F.col("shingles").alias("sh_a"))
    b_sh = sh.select(F.col("doc_id").alias("doc_id_b"), F.col("shingles").alias("sh_b"))
    verified = (
        cand.join(a_sh, "doc_id_a")
        .join(b_sh, "doc_id_b")
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
    return verified


def sql_minhash_lsh_pairs() -> str:
    rows_per_band = N_HASHES // N_BANDS
    band_cols = ", ".join(
        "md5('{b}' || '|' || ".format(b=b)
        + " || '|' || ".join(f"sig_{b * rows_per_band + r}" for r in range(rows_per_band))
        + f") AS band_{b}"
        for b in range(N_BANDS)
    )
    band_list = ", ".join(f"band_{b}" for b in range(N_BANDS))
    sh = _sql_shingles("text")
    return f"""
    WITH sig AS ({sql_minhash_signatures()}),
    banded AS (
      SELECT doc_id, unnest([{band_list}]) AS band_key
      FROM (SELECT doc_id, {band_cols} FROM sig)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
      FROM banded a JOIN banded b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    d AS ({sql_with_near_dups()}),
    sh AS (SELECT doc_id, {sh} AS shingles FROM d)
    SELECT c.doc_id_a, c.doc_id_b,
           round(CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
                 / len(list_distinct(list_concat(x.shingles, y.shingles))), 6) AS jaccard
    FROM cand c
    JOIN sh x ON x.doc_id = c.doc_id_a
    JOIN sh y ON y.doc_id = c.doc_id_b
    WHERE round(CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)
                / len(list_distinct(list_concat(x.shingles, y.shingles))), 6) >= {JACCARD_THRESHOLD}
    """


# --------------------------------------------------------------- simhash
def simhash_df(spark, sf_dir: str):
    """64-bit SimHash per doc via a vectorized pandas UDF (Arrow batches).

    Spark-only (rows-only driver check): md5-derived per-word 64-bit
    hashes, bit-majority vote. Near-dup lookup joins on the 16-bit
    prefix bucket then filters hamming ≤ 3 (not materialized here).
    """
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def simhash(text: pd.Series) -> pd.Series:
        import hashlib

        out = np.zeros(len(text), dtype=np.int64)
        for i, t in enumerate(text):
            words = t.split()
            if not words:
                continue
            acc = np.zeros(64, dtype=np.int64)
            for w in set(words):
                h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big", signed=False)
                bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits == 1, 1, -1)
            sig = np.uint64(0)
            for b in range(64):
                if acc[b] > 0:
                    sig |= np.uint64(1) << np.uint64(b)
            out[i] = sig.astype(np.int64)
        return pd.Series(out)

    docs = with_near_dups_df(spark, sf_dir)
    return docs.select(
        "doc_id",
        simhash(F.col("text")).alias("simhash"),
    )


# ----------------------------------------------------- n-gram Jaccard dedup
NGRAM_JACCARD_THRESHOLD = 0.3


def ngram_jaccard_pairs_df(spark, sf_dir: str):
    """Blocked exact word-3-gram Jaccard: candidate pairs share a length
    bucket (n_chars//64, plus the neighbor bucket) — the classic
    blocking-key trick that keeps the pair space linear-ish; near-dups
    rarely differ much in length. Output (doc_id_a, doc_id_b, jaccard).
    """
    from pyspark.sql import functions as F

    docs = with_near_dups_df(spark, sf_dir)
    sh = docs.select(
        "doc_id",
        _shingles_col(F.col("text")).alias("shingles"),
        (F.length("text") / F.lit(64)).cast("long").alias("bucket"),
    )
    left = sh.select(
        F.col("doc_id").alias("doc_id_a"),
        F.col("shingles").alias("sh_a"),
        F.explode(F.array(F.col("bucket"), F.col("bucket") + 1)).alias("bucket"),
    )
    right = sh.select(
        F.col("doc_id").alias("doc_id_b"), F.col("shingles").alias("sh_b"), "bucket"
    )
    jac = F.round(
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        6,
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select("doc_id_a", "doc_id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= NGRAM_JACCARD_THRESHOLD)
        .distinct()
    )


def sql_ngram_jaccard_pairs() -> str:
    sh = _sql_shingles("text")
    jac = (
        "round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) "
        "/ len(list_distinct(list_concat(a.sh, b.sh))), 6)"
    )
    return f"""
    WITH d AS ({sql_with_near_dups()}),
    sh AS (SELECT doc_id, {sh} AS sh,
                  CAST(floor(length(text) / 64) AS BIGINT) AS bucket FROM d),
    lhs AS (
      SELECT doc_id AS doc_id_a, sh, unnest([bucket, bucket + 1]) AS bucket FROM sh
    )
    SELECT DISTINCT a.doc_id_a, b.doc_id AS doc_id_b, {jac} AS jaccard
    FROM lhs a JOIN sh b ON a.bucket = b.bucket AND a.doc_id_a < b.doc_id
    WHERE {jac} >= {NGRAM_JACCARD_THRESHOLD}
    """


# ------------------------------------------------ embedding-cosine near-dup
COSINE_DUP_THRESHOLD = 0.9


def embedding_near_dups_df(spark, sf_dir: str):
    """Embedding near-duplicates: same-label (IVF-style) blocking, exact
    cosine >= threshold inside the block. Output (vec_id_a, vec_id_b, cosine).
    """
    from pyspark.sql import functions as F

    from .similarity import _cosine, _to_double

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "label", _to_double(F.col("embedding")).alias("v"))
        .repartition(int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    )
    a = emb.select(F.col("vec_id").alias("vec_id_a"), F.col("v").alias("va"), "label")
    b = emb.select(F.col("vec_id").alias("vec_id_b"), F.col("v").alias("vb"), "label")
    cos = _cosine(F.col("va"), F.col("vb"))
    return (
        a.join(b, "label")
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .select("vec_id_a", "vec_id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= COSINE_DUP_THRESHOLD)
    )


def sql_embedding_near_dups() -> str:
    from .similarity import _sql_cosine

    cos = _sql_cosine("a.v", "b.v")
    return f"""
    WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, {cos} AS cosine
    FROM emb a JOIN emb b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {cos} >= {COSINE_DUP_THRESHOLD}
    """
