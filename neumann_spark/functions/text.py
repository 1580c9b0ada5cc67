"""Text-analysis expression builders — LLM-data-pipeline extension
(BASELINE.json north star; no reference parity — the reference has no text
functions, SURVEY.md §2.8).

All builders are JVM-side column expressions (no Python UDFs): tokenization
via split/regexp, hashing via md5 (stable across Spark and DuckDB, unlike
murmur `F.hash` which differs per engine). `md5_int64` is the shared
primitive for minhash/simhash/fingerprints: the top 15 hex chars of md5 as
a non-negative int64 — identical in both engines, so every hash-based
operator below is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# stopword list used by quality scoring / language heuristic (fixed order!)
STOPWORDS = ("a", "the", "and", "of", "to")


def md5_int64(col: Column) -> Column:
    """First 60 bits of md5 as bigint — deterministic cross-engine hash.
    DuckDB mirror: ('0x' || substring(md5(x), 1, 15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


SQL_MD5_INT64 = "CAST('0x' || substring(md5({x}), 1, 15) AS BIGINT)"


def words(col: Column) -> Column:
    """Whitespace tokenization (split on single space — the fixture docs are
    single-space word soup; mirror: str_split(x, ' '))."""
    return F.split(col, " ")


def word_count(col: Column) -> Column:
    return F.size(words(col))


def punct_count(col: Column) -> Column:
    """Count of non-alphanumeric, non-space chars via length difference
    (regexp-free so Spark/DuckDB regex dialects can't disagree)."""
    return F.length(col) - F.length(F.regexp_replace(col, r"[^a-z0-9 ]", ""))


def stopword_count(col: Column) -> Column:
    w = words(col)
    return F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
