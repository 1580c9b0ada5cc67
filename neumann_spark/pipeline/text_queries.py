"""Text analysis over `documents` — LLM-pipeline extension operators
(BASELINE.json north star: "text analysis" as first-class components).

Token counting, quality scoring, language-ID heuristic, and document
fingerprinting, all as JVM-side expressions over one scan of the documents
table — at 100 TB these are embarrassingly parallel map-only stages (no
shuffle except the final small aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neumann_spark.catalog import load
from neumann_spark.functions.text import (
    SQL_MD5_INT64,
    STOPWORDS,
    md5_int64,
    punct_count,
    stopword_count,
    word_count,
    words,
)
from neumann_spark.registry import register

_SW_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)


@register(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           len(str_split(text, ' ')) AS n_tokens,
           n_chars,
           len(list_filter(str_split(text, ' '), w -> w IN ({_SW_LIST}))) AS n_stopwords
    FROM documents
    WHERE doc_id % 3 = 0
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokens + stopword hits) — the unit step of
    any token-budget accounting pipeline."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    return d.select(
        "doc_id",
        word_count(F.col("text")).alias("n_tokens"),
        "n_chars",
        stopword_count(F.col("text")).alias("n_stopwords"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           ROUND(
             0.4 * LEAST(CAST(n_chars AS DOUBLE) / 300.0, 1.0)
           + 0.4 * (1.0 - CAST(len(list_filter(str_split(text, ' '), w -> w IN ({_SW_LIST}))) AS DOUBLE)
                         / len(str_split(text, ' ')))
           + 0.2 * (1.0 - LEAST(CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
                                / length(text), 1.0))
           , 6) AS quality
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring from length / stopword ratio / punctuation ratio —
    the standard cheap pre-filter of LLM training-data pipelines. Weights
    are fixed; score in [0,1]."""
    d = load(spark, sf_dir, "documents")
    length_part = F.least(F.col("n_chars").cast("double") / 300.0, F.lit(1.0))
    sw_ratio = stopword_count(F.col("text")).cast("double") / word_count(F.col("text"))
    punct_ratio = F.least(
        punct_count(F.col("text")).cast("double") / F.length("text"), F.lit(1.0)
    )
    quality = 0.4 * length_part + 0.4 * (1.0 - sw_ratio) + 0.2 * (1.0 - punct_ratio)
    return d.select("doc_id", F.round(quality, 6).alias("quality"))


@register(
    "text_language_id",
    oracle="""
    WITH feat AS (
      SELECT doc_id, lang,
             len(list_filter(str_split(text, ' '), w -> w IN ('the', 'a', 'of'))) AS en_hits,
             len(list_filter(str_split(text, ' '), w -> w IN ('data', 'table', 'row'))) AS tech_hits,
             len(str_split(text, ' ')) AS n
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN en_hits * 3 >= tech_hits THEN 'en' ELSE 'tech' END AS lang_pred,
           ROUND(CAST(en_hits AS DOUBLE) / n, 6) AS en_ratio
    FROM feat
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: marker-token ratios → argmax class with a
    deterministic tie-break (the n-gram-frequency approach of classic
    langid, reduced to the fixture's vocabulary). Returns prediction and the
    labeled `lang` for downstream accuracy joins."""
    d = load(spark, sf_dir, "documents")
    w = words(F.col("text"))
    en_hits = F.size(F.filter(w, lambda x: x.isin("the", "a", "of")))
    tech_hits = F.size(F.filter(w, lambda x: x.isin("data", "table", "row")))
    return d.select(
        "doc_id",
        "lang",
        F.when(en_hits * 3 >= tech_hits, "en").otherwise("tech").alias("lang_pred"),
        F.round(en_hits.cast("double") / F.size(w), 6).alias("en_ratio"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(text) AS fingerprint,
           list_min(list_transform(str_split(text, ' '),
                                   w -> {SQL_MD5_INT64.format(x="w")})) AS min_word_hash
    FROM documents
    WHERE doc_id % 4 = 0
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whole-text md5 + min word hash (a 1-element
    minhash — the rolling-hash analog that's stable across engines)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    w = words(F.col("text"))
    min_hash = F.array_min(F.transform(w, lambda x: md5_int64(x)))
    return d.select(
        "doc_id",
        F.md5("text").alias("fingerprint"),
        min_hash.alias("min_word_hash"),
    )


@register(
    "text_repetition_signals",
    oracle="""
    WITH w AS (
      SELECT doc_id, str_split(text, ' ') AS ws FROM documents
    ),
    base AS (
      SELECT doc_id, len(ws) AS n_words, len(list_distinct(ws)) AS n_distinct
      FROM w
    ),
    bg AS (
      SELECT doc_id, u.g, COUNT(*) AS c
      FROM w, UNNEST(list_transform(generate_series(1, len(ws) - 1),
                                    i -> ws[i] || ' ' || ws[i + 1])) AS u(g)
      WHERE len(ws) >= 2
      GROUP BY doc_id, u.g
    ),
    bgs AS (
      SELECT doc_id, MAX(c) AS top_c, SUM(c) AS total_bg
      FROM bg GROUP BY doc_id
    )
    SELECT b.doc_id,
           b.n_words,
           ROUND(1.0 - CAST(b.n_distinct AS DOUBLE) / b.n_words, 6)
             AS dup_word_frac,
           ROUND(CAST(g.top_c AS DOUBLE) / g.total_bg, 6) AS top_bigram_frac,
           CAST(1.0 - CAST(b.n_distinct AS DOUBLE) / b.n_words > 0.5
                OR CAST(g.top_c AS DOUBLE) / g.total_bg > 0.1 AS INT)
             AS flagged
    FROM base b JOIN bgs g ON g.doc_id = b.doc_id
    """,
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher/MassiveText filter
    family): duplicate-word fraction (1 - distinct/total, a map-only array
    expression) and top-bigram fraction (most frequent 2-gram's share of
    all 2-grams — explode + two-level agg keyed on doc_id, so the shuffle
    key is the doc id, never a global token table). `flagged` applies the
    published-style thresholds; downstream removal is a broadcast
    anti-join of flagged ids."""
    d = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    base = d.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
        F.when(
            F.size(w) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(w, i), F.element_at(w, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>")).alias("bigrams"),
    )
    bgs = (
        base.select("doc_id", F.explode("bigrams").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("total_bg"))
    )
    dup = F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_words")
    top = F.col("top_c").cast("double") / F.col("total_bg")
    return (
        base.drop("bigrams")
        .join(bgs, "doc_id")
        .select(
            "doc_id",
            "n_words",
            F.round(dup, 6).alias("dup_word_frac"),
            F.round(top, 6).alias("top_bigram_frac"),
            ((dup > 0.5) | (top > 0.1)).cast("int").alias("flagged"),
        )
    )


@register(
    "text_gopher_quality_rules",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             len(str_split(text, ' ')) AS n_words,
             CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
               / len(str_split(text, ' ')) AS mwl,
             len(list_filter(str_split(text, ' '), w -> w IN ({_SW_LIST}))) AS sw,
             CAST(len(list_filter(str_split(text, ' '),
                                  w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
               / len(str_split(text, ' ')) AS alpha_frac
      FROM documents
    )
    SELECT doc_id,
           n_words,
           ROUND(mwl, 6) AS mean_word_len,
           CAST(n_words BETWEEN 20 AND 80 AS INT) AS r_word_count,
           CAST(mwl >= 3.0 AND mwl <= 4.5 AS INT) AS r_mean_word_len,
           CAST(sw >= 2 AS INT) AS r_stopwords,
           CAST(alpha_frac >= 0.8 AS INT) AS r_alpha_words,
           CAST(n_words BETWEEN 20 AND 80
                AND mwl >= 3.0 AND mwl <= 4.5
                AND sw >= 2
                AND alpha_frac >= 0.8 AS INT) AS passes
    FROM f
    """,
)
def text_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, published
    rule set, thresholds adapted to the fixture vocabulary): word-count
    bounds, mean-word-length band, minimum stop-word hits, and
    alphabetic-word fraction — each emitted as a flag plus the composite
    pass bit, the standard rule-based pre-filter stage of an LLM
    training-data pipeline. All four rules are JVM expressions over ONE
    scan of `documents`; at 100 TB this is a map-only stage with zero
    shuffles (the filter composes with downstream dedup/sampling)."""
    d = load(spark, sf_dir, "documents")
    w = words(F.col("text"))
    n_words = F.size(w)
    mwl = (
        F.length(F.regexp_replace(F.col("text"), " ", "")).cast("double") / n_words
    )
    sw = stopword_count(F.col("text"))
    alpha_frac = (
        F.size(F.filter(w, lambda x: x.rlike("[a-z]"))).cast("double") / n_words
    )
    r_wc = n_words.between(20, 80)
    r_mwl = (mwl >= 3.0) & (mwl <= 4.5)
    r_sw = sw >= 2
    r_alpha = alpha_frac >= 0.8
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mwl, 6).alias("mean_word_len"),
        r_wc.cast("int").alias("r_word_count"),
        r_mwl.cast("int").alias("r_mean_word_len"),
        r_sw.cast("int").alias("r_stopwords"),
        r_alpha.cast("int").alias("r_alpha_words"),
        (r_wc & r_mwl & r_sw & r_alpha).cast("int").alias("passes"),
    )


@register(
    "text_unigram_logprob",
    oracle="""
    WITH tok AS MATERIALIZED (
      SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents
    ),
    freq AS MATERIALIZED (
      SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w
    ),
    tot AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tok
    ),
    nll AS MATERIALIZED (
      SELECT doc_id, ROUND(-ln(cnt / (SELECT n FROM tot)), 6) AS nll
      FROM tok JOIN freq USING (w)
    )
    SELECT doc_id,
           ROUND(CAST(SUM(CAST(nll AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(nll), 6) AS mean_nll,
           COUNT(*) AS n_tokens
    FROM nll GROUP BY doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model scoring (the CCNet-style LM quality signal,
    reduced to order-0): corpus word frequencies -> per-token
    -ln p(w) -> per-document mean negative log-likelihood. High mean_nll
    = rare-token-heavy document (candidate junk), low = common-token soup.

    Scale shape: ONE wordcount shuffle builds the vocabulary, which is
    tiny (vocab-sized, not corpus-sized) and broadcast back onto the
    exploded token stream — scoring is map-side; the only other shuffle
    is the per-doc aggregate. Per-token nll is rounded to the 1e-6 grid
    and decimal-summed (sqlutil strategy) so Spark's partition-parallel
    sum is bit-identical to the oracle's."""
    from neumann_spark.sqlutil import davg

    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(words(F.col("text"))).alias("w"))
    freq = tok.groupBy("w").agg(F.count("*").alias("cnt"))
    total = tok.count()
    scored = tok.join(F.broadcast(freq), "w").select(
        "doc_id",
        F.round(-F.log(F.col("cnt") / F.lit(float(total))), 6).alias("nll"),
    )
    return scored.groupBy("doc_id").agg(
        F.round(davg("nll", 6), 6).alias("mean_nll"),
        F.count("*").alias("n_tokens"),
    )
