"""Text-analysis column expressions (SURVEY.md §7.1 M6).

All JVM-side Catalyst higher-order functions — no Python in the hot
path. Each has an exactly-equivalent DuckDB formulation used by the
oracle SQL in operators/textops.py; keep the two in sync.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WS_PATTERN = r"\s+"

# Stopword markers per language for the lang-id heuristic. Deliberately
# tiny and deterministic — SQL-expressible on both engines.
LANG_MARKERS = {
    "en": ("the", "a", "of", "and", "is"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "los", "las", "una", "y"),
}

EN_STOPWORDS = ("the", "a", "of", "and", "is", "to", "in", "it", "that", "for")

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), WS_PATTERN)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def distinct_token_ratio(toks: Column) -> Column:
    return F.size(F.array_distinct(toks)) / F.size(toks)


def marker_hits(toks: Column, words: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")


def avg_token_len(toks: Column) -> Column:
    return F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)) / F.size(toks)


def rolling_fingerprint(toks: Column) -> Column:
    """Polynomial rolling hash over token lengths+first chars — a
    document fingerprint computable identically in DuckDB (list_reduce)
    and Spark (aggregate). Stays < 2^63 via mod, so no overflow
    divergence between engines."""
    step = lambda acc, t: (acc * FINGERPRINT_BASE + F.length(t) * 131 + (F.ascii(F.substring(t, 1, 1)))) % FINGERPRINT_MOD
    return F.aggregate(toks, F.lit(0).cast("long"), step)


# GPT-2-style pre-tokenizer shape (contraction tail | space?+letters |
# space?+digits | space?+punct-run) restricted to the Java∩RE2 common
# regex subset so Spark and DuckDB extract identical token streams.
BPE_PATTERN = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9']+"


def bpe_token_count(col: Column | str) -> Column:
    """Subword-ish token count via the BPE pre-tokenizer regex — the
    budget estimator a training-data pipeline uses when real BPE merges
    are too expensive for a scan-side pass."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0)).cast("long")


def normalized_text(col: Column | str) -> Column:
    """lower + collapse runs of whitespace to single spaces + trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), WS_PATTERN, " "))
