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


def with_injected_pii_df(spark, sf_dir: str):
    """documents with deterministic contact lines appended: doc_id%4==0
    gets an email, doc_id%6==0 a phone number (both for doc_id%12==0)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
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


def sql_with_injected_pii() -> str:
    return (
        "SELECT doc_id, text "
        "|| (CASE WHEN doc_id % 4 = 0 THEN ' contact: user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END) "
        "|| (CASE WHEN doc_id % 6 = 0 THEN ' tel: +3811' || CAST(doc_id % 1000000 AS VARCHAR) ELSE '' END) "
        "AS text FROM documents"
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
