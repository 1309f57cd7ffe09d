# -*- coding: utf-8 -*-
"""Serbian Cyrillic/Latin transliteration algebra.

Semantics re-derived from the reference:
  * ``cyr2lat`` / ``at_least_some_in_cyrillic``: per-char table map with
    digraph outputs Њ→"Nj", Љ→"Lj", Џ→"Dž" (capital-first only), case
    preserved (reference ``src/transliteration.py:3-27``).
  * ``lat2cyr``: the *ordered* REPLACE chain of the SPARQL queries —
    digraphs DŽ/Dž/NJ/Nj/LJ/dž/nj/lj first, then lowercase singles, then
    uppercase singles (reference ``sparql/adding_namesr_north.sparql:16-37``).
    NOTE the chain deliberately reproduces the reference's observable
    quirk: "Lj" is NOT in the digraph list, so "Ljig" → "Лјig"-style
    output via single-char replaces ("L"→"Л", "j"→"ј").
  * ``romanize_international``: sr-Latn → ASCII int_name, Đ→Dj etc.
    (reference ``sparql/adding_int_name.sparql:10-15``).

Every function has three faces sharing one constant table:
  - ``*_py``   : plain-Python reference implementation (tests/oracles),
  - ``*_col``  : Spark Column builder (built-in expressions only —
                 whole-stage codegen, no UDF),
  - ``sql_*``  : DuckDB ANSI-SQL emitter (differential oracle).
"""

from __future__ import annotations

# 30 lowercase + 30 uppercase Serbian Cyrillic letters and their Latin
# transliterations (Serbian Vuk alphabet; digraph outputs capital-first).
_PAIRS_UPPER = [
    ("А", "A"), ("Б", "B"), ("В", "V"), ("Г", "G"), ("Д", "D"),
    ("Ђ", "Đ"), ("Е", "E"), ("Ж", "Ž"), ("З", "Z"), ("И", "I"),
    ("Ј", "J"), ("К", "K"), ("Л", "L"), ("Љ", "Lj"), ("М", "M"),
    ("Н", "N"), ("Њ", "Nj"), ("О", "O"), ("П", "P"), ("Р", "R"),
    ("С", "S"), ("Т", "T"), ("Ћ", "Ć"), ("У", "U"), ("Ф", "F"),
    ("Х", "H"), ("Ц", "C"), ("Ч", "Č"), ("Џ", "Dž"), ("Ш", "Š"),
]
_PAIRS_LOWER = [(c.lower(), l.lower()) for c, l in _PAIRS_UPPER]

#: char -> latin mapping (60 entries), the single source of truth.
CYR_TO_LAT: dict[str, str] = dict(_PAIRS_UPPER) | dict(_PAIRS_LOWER)

#: exact-membership character class for "is there any Serbian Cyrillic".
CYRILLIC_CLASS = "[" + "".join(CYR_TO_LAT.keys()) + "]"

# lat2cyr: exact ordered REPLACE chain of the SPARQL queries.
LAT2CYR_DIGRAPHS = [
    ("DŽ", "Џ"), ("Dž", "Џ"), ("NJ", "Њ"), ("Nj", "Њ"), ("LJ", "Љ"),
    ("dž", "џ"), ("nj", "њ"), ("lj", "љ"),
]
_L2C_SINGLES_LOWER = [
    ("a", "а"), ("b", "б"), ("v", "в"), ("g", "г"), ("d", "д"),
    ("đ", "ђ"), ("e", "е"), ("ž", "ж"), ("z", "з"), ("i", "и"),
    ("j", "ј"), ("k", "к"), ("l", "л"), ("m", "м"), ("n", "н"),
    ("o", "о"), ("p", "п"), ("r", "р"), ("s", "с"), ("t", "т"),
    ("ć", "ћ"), ("u", "у"), ("f", "ф"), ("h", "х"), ("c", "ц"),
    ("č", "ч"), ("š", "ш"),
]
_L2C_SINGLES_UPPER = [(a.upper(), b.upper()) for a, b in _L2C_SINGLES_LOWER]
LAT2CYR_CHAIN = LAT2CYR_DIGRAPHS + _L2C_SINGLES_LOWER + _L2C_SINGLES_UPPER

# romanize: sr-Latn -> ASCII (int_name), ordered.
ROMANIZE_CHAIN = [
    ("Đ", "Dj"), ("Ž", "Z"), ("Ć", "C"), ("Č", "C"), ("Š", "S"),
    ("đ", "dj"), ("ž", "z"), ("ć", "c"), ("č", "c"), ("š", "s"),
]

# The SPARQL "latin letters" class (sans i/v — Roman-numeral guard) and the
# "obviously English" class, expanded to explicit two-case alternations so
# Spark (Java regex) and DuckDB (RE2) agree without unicode case-folding
# flags (reference sparql/adding_namesr_central.sparql:12-13).
_LATIN_LETTERS = "abcčćdđefghjklmnoprsštuzž"
LATIN_NAME_CLASS = "[" + _LATIN_LETTERS + _LATIN_LETTERS.upper() + "]"
ENGLISH_NAME_CLASS = "[xywqXYWQ]"


# ----------------------------------------------------------------- python
def cyr2lat_py(text: str) -> str:
    """Reference-parity Cyrillic→Latin transliteration."""
    return "".join(CYR_TO_LAT.get(ch, ch) for ch in text)


def has_cyrillic_py(text: str) -> bool:
    """True iff at least one char is Serbian Cyrillic."""
    return any(ch in CYR_TO_LAT for ch in text)


def _apply_chain_py(text: str, chain: list[tuple[str, str]]) -> str:
    for src, dst in chain:
        text = text.replace(src, dst)
    return text


def lat2cyr_py(text: str) -> str:
    """SPARQL-parity Latin→Cyrillic (ordered chain, incl. the Lj quirk)."""
    return _apply_chain_py(text, LAT2CYR_CHAIN)


def romanize_py(text: str) -> str:
    """sr-Latn → ASCII int_name romanization."""
    return _apply_chain_py(text, ROMANIZE_CHAIN)


# ------------------------------------------------------------------ spark
def _chain_col(col, chain):
    from pyspark.sql import functions as F

    out = col
    for src, dst in chain:
        out = F.replace(out, F.lit(src), F.lit(dst))
    return out


def _split_chain(chain):
    """Partition a replace chain into (multi-char entries, 1:1 entries).

    The 1:1 tail can run as ONE ``translate`` pass instead of a replace
    per entry WHEN the chain is order-independent over those entries:
    all sources distinct single chars and no entry's output re-enters any
    later source (true for all three chains here — each maps between
    disjoint scripts). Callers assert the precondition structurally by
    construction of the constant tables; parity with the ``*_py`` faces
    is pinned by tests."""
    multi = [(s, d) for s, d in chain if len(s) > 1 or len(d) > 1]
    singles = [(s, d) for s, d in chain if len(s) == 1 and len(d) == 1]
    return multi, singles


def _chain_col_fast(col, chain):
    """Replace chain with the 1:1 entries fused into one ``translate``
    (guide §1.2 per-task work: the old form scanned the string once per
    table entry — 60 passes for cyr2lat; this is ≤ 7)."""
    from pyspark.sql import functions as F

    multi, singles = _split_chain(chain)
    out = _chain_col(col, multi)
    if singles:
        out = F.translate(
            out, "".join(s for s, _ in singles), "".join(d for _, d in singles)
        )
    return out


def cyr2lat_col(col):
    """Column: cyr2lat — digraph-output replaces (Љ/Њ/Џ cases) + one
    ``translate`` pass for the 54 single-char entries (codegen-friendly).

    Order-independent vs the per-char table map: inputs are distinct
    Cyrillic chars, outputs contain no Cyrillic, so replaces + a
    single-pass char map ≡ the chained 60-replace form (parity pinned by
    tests against :func:`cyr2lat_py`).
    """
    return _chain_col_fast(col, list(CYR_TO_LAT.items()))


def has_cyrillic_col(col):
    from pyspark.sql import functions as F

    return col.rlike(CYRILLIC_CLASS) if not isinstance(col, str) else F.col(col).rlike(CYRILLIC_CLASS)


def lat2cyr_col(col):
    """Digraph replaces first (preserving the SPARQL chain order), then
    one ``translate`` for the 54 Latin→Cyrillic singles — the singles are
    order-independent (sources Latin, outputs Cyrillic, disjoint), so
    fusing them preserves the quirk-exact chain semantics."""
    return _chain_col_fast(col, LAT2CYR_CHAIN)


def romanize_col(col):
    return _chain_col_fast(col, ROMANIZE_CHAIN)


def latin_name_col(col):
    """Column: name matches the SPARQL Latin-letter class."""
    return col.rlike(LATIN_NAME_CLASS)


def english_name_col(col):
    return col.rlike(ENGLISH_NAME_CLASS)


# -------------------------------------------------------------------- sql
def _sql_chain(expr: str, chain) -> str:
    for src, dst in chain:
        src = src.replace("'", "''")
        dst = dst.replace("'", "''")
        expr = f"replace({expr}, '{src}', '{dst}')"
    return expr


def sql_cyr2lat(expr: str) -> str:
    return _sql_chain(expr, CYR_TO_LAT.items())


def sql_lat2cyr(expr: str) -> str:
    return _sql_chain(expr, LAT2CYR_CHAIN)


def sql_romanize(expr: str) -> str:
    return _sql_chain(expr, ROMANIZE_CHAIN)


def sql_has_cyrillic(expr: str) -> str:
    return f"regexp_matches({expr}, '{CYRILLIC_CLASS}')"


def sql_latin_name(expr: str) -> str:
    return f"regexp_matches({expr}, '{LATIN_NAME_CLASS}')"


def sql_english_name(expr: str) -> str:
    return f"regexp_matches({expr}, '{ENGLISH_NAME_CLASS}')"
