# -*- coding: utf-8 -*-
"""Corpus-preparation operators: PII redaction and deterministic splits.

Two more stages every large-scale training-data pipeline runs over the
document table:

* :func:`pii_redact_df` — scrub emails/phone-like tokens from ``text``
  with native ``regexp_replace`` (JVM-side, codegen; zero Python). The
  driver corpus has no natural PII, so deterministic contact lines are
  injected first (same derivation in both engines) — live positives at
  every scale, like the dedup corpora.
* :func:`corpus_split_df` — content-hash train/val/test assignment
  (80/10/10): ``md5(doc_id)`` → 32-bit int → percentile bucket. Pure
  projection (no shuffle, no RNG) — resume-safe and stable under
  repartitioning, unlike ``rand()`` splits which change on every run
  and every partitioning.

Both are single-pass projections: at 10^12 docs they pipeline inside the
same scan stage as any other per-row work.
"""

from __future__ import annotations

#: conservative cross-engine regexes (same semantics in Java regex and
#: DuckDB's RE2): no lookarounds, explicit classes.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{5,14}"

TRAIN_PCT, VAL_PCT = 80, 90  # train < 80 <= val < 90 <= test


def _inject_pii(docs):
    """Append deterministic contact lines: doc_id%4==0 gets an email,
    doc_id%6==0 a phone number (both for doc_id%12==0)."""
    from pyspark.sql import functions as F

    k = F.col("doc_id")
    email = F.concat(F.lit(" contact: user"), k.cast("string"), F.lit("@example.com"))
    phone = F.concat(F.lit(" tel: +3811"), (k % 1000000).cast("string"))
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(k % 4 == 0, email).otherwise(F.lit("")),
            F.when(k % 6 == 0, phone).otherwise(F.lit("")),
        ).alias("text"),
    )


def with_injected_pii_df(spark, sf_dir: str):
    """documents with the deterministic contact lines appended."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    return _inject_pii(docs)


def _sql_inject_pii(src: str) -> str:
    return (
        f"SELECT doc_id, text "
        f"|| (CASE WHEN doc_id % 4 = 0 THEN ' contact: user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END) "
        f"|| (CASE WHEN doc_id % 6 = 0 THEN ' tel: +3811' || CAST(doc_id % 1000000 AS VARCHAR) ELSE '' END) "
        f"AS text FROM ({src})"
    )


def sql_with_injected_pii() -> str:
    return _sql_inject_pii("SELECT doc_id, text FROM documents")


def _sql_shard_corpus() -> str:
    # PII is injected BEFORE the union so an exact copy duplicates the
    # injected text byte-for-byte (id-offset-based injection would give
    # copies a different PII suffix whenever offset % lcm(4,6) != 0 —
    # un-flagging them as dups) and the short stubs stay stub-short.
    injected = _sql_inject_pii("SELECT doc_id, text FROM documents")
    return (
        f"WITH inj AS ({injected}) SELECT doc_id, text FROM inj "
        "UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM inj WHERE doc_id % 7 = 0 "
        "UNION ALL SELECT doc_id + 3000000 AS doc_id, 'kratak tekst' AS text "
        "FROM inj WHERE doc_id % 13 = 0"
    )


def pii_redact_df(spark, sf_dir: str):
    """(doc_id, clean_text, n_emails, n_phones): emails → [EMAIL],
    phone-like tokens → [PHONE]; counts from the pre-redaction text."""
    from pyspark.sql import functions as F

    docs = with_injected_pii_df(spark, sf_dir)
    t = F.col("text")
    clean = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
    )
    # patterns as literal Columns — embedding them in expr() SQL strings
    # would re-interpret the backslashes at the SQL-literal layer
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("int").alias("n_phones"),
    )


def sql_pii_redact() -> str:
    return f"""
    WITH d AS ({sql_with_injected_pii()})
    SELECT doc_id,
           regexp_replace(regexp_replace(text, '{EMAIL_RE}', '[EMAIL]', 'g'),
                          '{PHONE_RE}', '[PHONE]', 'g') AS clean_text,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS INT) AS n_phones
    FROM d
    """


MIN_TOKENS = 5


def training_shard_df(spark, sf_dir: str):
    """End-to-end shard preparation — the composition a real training
    pipeline runs as ONE pass over the corpus:

      redact PII → token/language profile (on the clean text) → exact-dup
      flag (content fingerprint, first-id-wins) → deterministic split →
      keep decision (not a dup, ≥ MIN_TOKENS tokens).

    Everything is column math plus a single window over the fingerprint —
    one scan, one shuffle, no Python. Output: (doc_id, split,
    n_tokens_ws, lang_guess, n_emails, n_phones, is_dup, keep).

    The driver corpus has no dups and no degenerate docs, so the union
    plants both reject classes (exact copies at +10^6, two-token stubs
    at +3·10^6) — the keep gate has live negatives at every scale. PII
    is injected BEFORE the union so a planted copy duplicates the
    injected text byte-for-byte (injecting by the offset id would give
    copies a different PII suffix — offset % lcm(4,6) != 0 — and
    silently un-flag them as dups) and the stubs stay stub-short.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.text import fingerprint_col, lang_id_col, token_count_cols

    raw = _inject_pii(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    )
    exact = raw.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    short = raw.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"), F.lit("kratak tekst").alias("text")
    )
    docs = raw.unionByName(exact).unionByName(short)
    t = F.col("text")
    clean = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
    )
    ws, _bpe = token_count_cols(F.col("clean_text"))
    staged = docs.select(
        "doc_id",
        clean.alias("clean_text"),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("int").alias("n_phones"),
    ).select(
        "doc_id",
        "clean_text",
        "n_emails",
        "n_phones",
        ws,
        lang_id_col(F.col("clean_text")).alias("lang_guess"),
        fingerprint_col(F.col("clean_text")).alias("fp"),
    )
    w = Window.partitionBy("fp")
    is_dup = F.col("doc_id") != F.min("doc_id").over(w)
    p = split_col(F.col("doc_id"))
    split = (
        F.when(p < TRAIN_PCT, F.lit("train"))
        .when(p < VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return staged.select(
        "doc_id",
        split.alias("split"),
        "n_tokens_ws",
        "lang_guess",
        "n_emails",
        "n_phones",
        is_dup.alias("is_dup"),
        (~is_dup & (F.col("n_tokens_ws") >= MIN_TOKENS)).alias("keep"),
    )


def sql_training_shard() -> str:
    from ..functions.text import sql_fingerprint, sql_lang_id, sql_token_counts

    h = "CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    ws, _bpe = sql_token_counts("clean_text")
    return f"""
    WITH d AS ({_sql_shard_corpus()}),
    staged0 AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(text, '{EMAIL_RE}', '[EMAIL]', 'g'),
                            '{PHONE_RE}', '[PHONE]', 'g') AS clean_text,
             CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS INT) AS n_emails,
             CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS INT) AS n_phones
      FROM d
    ),
    staged AS (
      SELECT doc_id, n_emails, n_phones,
             {ws} AS n_tokens_ws,
             {sql_lang_id('clean_text')} AS lang_guess,
             {sql_fingerprint('clean_text')} AS fp
      FROM staged0
    ),
    flagged AS (
      SELECT *, doc_id <> min(doc_id) OVER (PARTITION BY fp) AS is_dup FROM staged
    )
    SELECT doc_id,
           CASE WHEN {h} % 100 < {TRAIN_PCT} THEN 'train'
                WHEN {h} % 100 < {VAL_PCT} THEN 'val'
                ELSE 'test' END AS split,
           n_tokens_ws, lang_guess, n_emails, n_phones, is_dup,
           (NOT is_dup AND n_tokens_ws >= {MIN_TOKENS}) AS keep
    FROM flagged
    """


def split_col(doc_id_col):
    """Content-hash split bucket 0..99 from md5(doc_id) — shared by the
    batch face and any incremental/streaming ingest (same doc always
    lands in the same split)."""
    from pyspark.sql import functions as F

    h = F.conv(F.substring(F.md5(doc_id_col.cast("string")), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(100))


def corpus_split_df(spark, sf_dir: str):
    """(doc_id, split): deterministic 80/10/10 train/val/test."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    p = split_col(F.col("doc_id"))
    split = (
        F.when(p < TRAIN_PCT, F.lit("train"))
        .when(p < VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select("doc_id", split.alias("split"))


def sql_corpus_split() -> str:
    h = "CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    return f"""
    SELECT doc_id,
           CASE WHEN {h} % 100 < {TRAIN_PCT} THEN 'train'
                WHEN {h} % 100 < {VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """
