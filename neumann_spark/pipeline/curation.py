"""Training-data curation operators — LLM-pipeline extension alongside
dedup/ANN/text-analysis (the brief's first-class components): benchmark
decontamination, source/language data mixing, PII scrubbing, and
length-bucketing for batch packing.

Scale design: every operator is map-only or a single equality-join/groupBy
on a compact key. Decontamination joins on n-gram hashes (the eval side is
tiny — broadcast); mixing is a deterministic hash predicate (no sampling
state, reproducible across runs and engines); PII scrubbing is one
regexp_replace pass inside whole-stage codegen; bucketing is one groupBy on
a log2 bucket id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from neumann_spark.catalog import load
from neumann_spark.functions.text import SQL_MD5_INT64, md5_int64
from neumann_spark.registry import register

# --- benchmark decontamination -------------------------------------------
# Eval set = doc_id % 97 == 0 (the held-out "benchmark"); a training doc is
# contaminated if it shares >= CONTAM_MIN_NGRAMS distinct 4-gram shingles
# with any eval doc. The real-world shape (The Pile / FineWeb decontam):
# n-gram hash join between corpus and benchmark, benchmark side broadcast.

CONTAM_NGRAM = 4
CONTAM_MIN_NGRAMS = 1


def _ngrams(df: DataFrame, n: int) -> DataFrame:
    w = F.split("text", " ")
    grams = F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(w, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select("doc_id", F.explode(grams).alias("g")).distinct()


_NGRAMS_SQL = f"""
    words AS MATERIALIZED (
      SELECT doc_id, str_split(text, ' ') AS w FROM documents
    ),
    grams AS MATERIALIZED (
      SELECT DISTINCT doc_id, u.g
      FROM words, UNNEST(list_transform(
        generate_series(1, len(w) - {CONTAM_NGRAM - 1}),
        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
      )) AS u(g)
      WHERE len(w) >= {CONTAM_NGRAM}
    )
"""


@register(
    "pipeline_decontaminate",
    oracle="WITH "
    + _NGRAMS_SQL
    + f"""
    , ev AS MATERIALIZED (
        SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0
      ),
      hits AS (
        SELECT g.doc_id, COUNT(*) AS n_shared
        FROM grams g JOIN ev ON ev.g = g.g
        WHERE g.doc_id % 97 <> 0
        GROUP BY g.doc_id
      )
    SELECT doc_id, n_shared FROM hits WHERE n_shared >= {CONTAM_MIN_NGRAMS}
    """,
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing >= 3 distinct
    4-grams with the eval split (doc_id % 97). The eval n-gram set is tiny
    relative to the corpus — broadcast it so the scan-side join is map-only
    at 100 TB; output is the flag list to anti-join out of the train set."""
    d = load(spark, sf_dir, "documents")
    grams = _ngrams(d, CONTAM_NGRAM)
    ev = grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    return (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(ev), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= CONTAM_MIN_NGRAMS)
    )


# --- data mixing ----------------------------------------------------------

MIX_RATES = {"en": 90, "es": 40}  # percent kept; default below
MIX_DEFAULT = 20


def _mix_rate_sql() -> str:
    cases = " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in MIX_RATES.items()
    )
    return f"CASE {cases} ELSE {MIX_DEFAULT} END"


@register(
    "pipeline_data_mixture",
    oracle=f"""
    WITH tagged AS (
      SELECT lang, source,
             ({SQL_MD5_INT64.format(x="'mix:' || CAST(doc_id AS VARCHAR)")}) % 100 AS u,
             {_mix_rate_sql()} AS rate
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN u < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM tagged GROUP BY lang
    """,
)
def pipeline_data_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic language-weighted data mixing (upsample en, downsample
    the tail — the standard pretraining mixture op): keep-decision is a pure
    hash of the doc id, so the sample is reproducible, stateless, and
    engine-independent — no RNG, no sampling state to coordinate across
    1000 executors. Map-only + one groupBy."""
    d = load(spark, sf_dir, "documents")
    u = md5_int64(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))) % 100
    rate = F.lit(MIX_DEFAULT)
    for k, v in reversed(MIX_RATES.items()):
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    return (
        d.select("lang", u.alias("u"), rate.alias("rate"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(F.col("u") < F.col("rate"), 1).otherwise(0)).alias(
                "n_kept"
            ),
        )
    )


# --- PII scrubbing --------------------------------------------------------

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"[0-9]{3}-[0-9]{4}"


@register(
    "pipeline_pii_scrub",
    oracle=rf"""
    WITH contact AS (
      SELECT doc_id,
             'u' || CAST(doc_id AS VARCHAR) || '@ex' || CAST(doc_id % 7 AS VARCHAR)
               || '.com call 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
               || ' ' || substr(text, 1, 40) AS blob
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(blob, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed,
           LENGTH(blob)
             - LENGTH(regexp_replace(blob, '{_EMAIL_RE}', '', 'g'))
             AS email_chars
    FROM contact
    """,
)
def pipeline_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails + phone-shaped tokens) over a synthesized
    contact field — one regexp_replace pass, whole-stage codegen, map-only
    (the regexes use the RE2-compatible subset so Java and RE2 agree). The
    emitted email_chars column audits how much was removed — the usual
    scrub-report metric."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    blob = F.concat(
        F.lit("u"), F.col("doc_id").cast("string"),
        F.lit("@ex"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".com call 555-"),
        (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
        F.lit(" "), F.substring("text", 1, 40),
    )
    scrub = F.regexp_replace(
        F.regexp_replace(blob, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        scrub.alias("scrubbed"),
        (F.length(blob) - F.length(F.regexp_replace(blob, _EMAIL_RE, ""))).alias(
            "email_chars"
        ),
    )


# --- length bucketing -----------------------------------------------------


@register(
    "pipeline_length_buckets",
    oracle="""
    SELECT CAST(FLOOR(LOG2(GREATEST(len(str_split(text, ' ')), 1))) AS BIGINT)
             AS bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY 1
    """,
)
def pipeline_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-of-2 token-length buckets (batch-packing histogram for
    sequence training): map-only token count + one groupBy on the log2
    bucket id. Integer tokens sum exactly — no float drift."""
    d = load(spark, sf_dir, "documents")
    toks = F.size(F.split("text", " "))
    bucket = F.floor(F.log2(F.greatest(toks, F.lit(1)))).cast("bigint")
    return d.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n_docs"),
        F.sum(toks.cast("bigint")).alias("total_tokens"),
    )


# --- stratified sampling --------------------------------------------------

STRAT_K = 10  # exact docs kept per stratum


@register(
    "pipeline_stratified_sample",
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {SQL_MD5_INT64.format(x="'strat:' || CAST(doc_id AS VARCHAR)")},
                        doc_id
             ) AS rk
      FROM documents
    )
    SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {STRAT_K}
    """,
)
def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: exactly K docs per stratum
    (source), chosen by rank over a doc-id hash — a reproducible uniform
    sample with no RNG state, so re-runs and engines agree bit-for-bit.
    One window shuffle keyed on the stratum; at 100 TB the same result
    comes cheaper via per-partition top-K pre-aggregation before the final
    per-stratum top-K (rank is over the hash, so partial top-Ks compose)."""
    d = load(spark, sf_dir, "documents")
    h = md5_int64(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= STRAT_K)
        .select("source", "doc_id", F.col("rk").cast("bigint").alias("rk"))
    )


# --- sequence packing -----------------------------------------------------

PACK_CTX = 256  # context-window length in tokens


@register(
    "pipeline_sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id, len(str_split(text, ' ')) AS n_tok
      FROM documents
    ),
    cum AS (
      SELECT source, doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS prev_cum
      FROM toks
    )
    SELECT source,
           CAST(prev_cum // {PACK_CTX} AS BIGINT) AS chunk,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM cum
    GROUP BY source, prev_cum // {PACK_CTX}
    """,
)
def pipeline_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches — the concat-then-chunk shape:
    docs within a source stream are concatenated in doc_id order and cut
    into {PACK_CTX}-token context windows; each doc lands in the chunk
    where it starts (integer running total → exact on both engines).
    One window shuffle keyed on the stream id; chunk stats are the
    packing-efficiency report. At 100 TB the stream id is the shard key,
    so windows never cross executors."""
    d = load(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = d.select(
        "source",
        "doc_id",
        n_tok.alias("n_tok"),
        F.coalesce(F.sum(n_tok).over(w), F.lit(0)).alias("prev_cum"),
    )
    return (
        cum.groupBy(
            "source",
            F.floor(F.col("prev_cum") / PACK_CTX).cast("bigint").alias("chunk"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
    )


# --- document chunking (context-window splitting with overlap) ------------

CHUNK_WINDOW = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


@register(
    "pipeline_chunk_documents",
    oracle=f"""
    WITH words AS MATERIALIZED (
      SELECT doc_id, str_split(text, ' ') AS w FROM documents
    ),
    chunks AS (
      SELECT doc_id, u.i AS chunk_id,
             list_slice(w, u.i * {CHUNK_STRIDE} + 1,
                        u.i * {CHUNK_STRIDE} + {CHUNK_WINDOW}) AS cw
      FROM words, UNNEST(generate_series(0, CAST(GREATEST(
          CEIL((len(w) - {CHUNK_WINDOW}) / CAST({CHUNK_STRIDE} AS DOUBLE)),
          0) AS BIGINT))) AS u(i)
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(len(cw) AS BIGINT) AS n_tokens,
           cw[1] AS first_token
    FROM chunks WHERE len(cw) > 0
    """,
)
def pipeline_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into overlapping context-window chunks (window 64
    tokens, stride 48 — the standard prep for embedding models and packed
    pretraining): chunk count per doc is ceil((n-W)/S)+1, each chunk a
    slice of the word array. Map-only — one `transform` + `posexplode`,
    no shuffle at all; at 100 TB this pipelines with the parquet scan."""
    d = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n_chunks = F.greatest(
        F.ceil((F.size(w) - F.lit(CHUNK_WINDOW)) / F.lit(float(CHUNK_STRIDE))),
        F.lit(0),
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks),
        lambda i: F.slice(w, i * CHUNK_STRIDE + 1, CHUNK_WINDOW),
    )
    return (
        d.select("doc_id", F.posexplode(chunks).alias("chunk_id", "cw"))
        .filter(F.size("cw") > 0)
        .select(
            "doc_id",
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.size("cw").cast("bigint").alias("n_tokens"),
            F.element_at("cw", 1).alias("first_token"),
        )
    )


# --- end-to-end curation pipeline -----------------------------------------
# The composition the whole family exists for: one flagship query chaining
# quality gate -> exact dedup -> eval-split removal -> decontamination ->
# packing histogram, each stage the registered operator above/alongside.
# A user of the reference migrating a curation job runs exactly this
# chain; the oracle recomposes every stage in SQL, so a semantics drift in
# ANY stage (rule thresholds, dedup keying, n-gram contamination) breaks
# the hash.


def _end_to_end_oracle_sql() -> str:
    from neumann_spark.pipeline.text_queries import _SW_LIST

    return f"""
    WITH {_NGRAMS_SQL},
    quality AS MATERIALIZED (
      SELECT doc_id FROM (
        SELECT doc_id,
               len(str_split(text, ' ')) AS n_words,
               CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
                 / len(str_split(text, ' ')) AS mwl,
               len(list_filter(str_split(text, ' '),
                               w -> w IN ({_SW_LIST}))) AS sw,
               CAST(len(list_filter(str_split(text, ' '),
                                    w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
                 / len(str_split(text, ' ')) AS alpha_frac
        FROM documents
      ) WHERE n_words BETWEEN 20 AND 80 AND mwl >= 3.0 AND mwl <= 4.5
          AND sw >= 2 AND alpha_frac >= 0.8
    ),
    dedup_kept AS MATERIALIZED (
      SELECT doc_id FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (
                 PARTITION BY md5(concat(source, ':',
                                         CAST(n_chars // 50 AS VARCHAR)))
                 ORDER BY doc_id) AS rn
        FROM documents
      ) WHERE rn = 1
    ),
    ev AS MATERIALIZED (
      SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0
    ),
    contaminated AS MATERIALIZED (
      SELECT g.doc_id FROM grams g JOIN ev ON ev.g = g.g
      WHERE g.doc_id % 97 <> 0
      GROUP BY g.doc_id
      HAVING COUNT(*) >= {CONTAM_MIN_NGRAMS}
    ),
    survivors AS (
      SELECT d.* FROM documents d
      JOIN quality q ON q.doc_id = d.doc_id
      JOIN dedup_kept k ON k.doc_id = d.doc_id
      WHERE d.doc_id % 97 <> 0
        AND NOT EXISTS (SELECT 1 FROM contaminated c
                        WHERE c.doc_id = d.doc_id)
    )
    SELECT source,
           CAST(FLOOR(LOG2(GREATEST(len(str_split(text, ' ')), 1)))
                AS BIGINT) AS bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM survivors
    GROUP BY source, bucket
    """


@register("pipeline_end_to_end", oracle=_end_to_end_oracle_sql())
def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline, built by CALLING the registered
    stage operators (not re-implementations): Gopher quality gate
    (`text_gopher_quality_rules` passes=1) -> exact-dedup survivors
    (keep-min-id per content key) -> eval-split removal + decontamination
    anti-join (`pipeline_decontaminate`) -> per-source packing histogram
    (`pipeline_length_buckets` bucketing). Every stage is map-only or one
    compact-key shuffle, so the composition inherits the 100 TB shape of
    its parts — Catalyst fuses the three semi/anti joins against the same
    documents scan."""
    from neumann_spark.pipeline.text_queries import text_gopher_quality_rules

    d = load(spark, sf_dir, "documents")
    quality = (
        text_gopher_quality_rules(spark, sf_dir)
        .filter(F.col("passes") == 1)
        .select("doc_id")
    )
    key = F.md5(F.concat(
        F.col("source"), F.lit(":"),
        (F.col("n_chars") / F.lit(50)).cast("bigint").cast("string")))
    kept = (
        d.select("doc_id", key.alias("k"))
        .select(
            "doc_id",
            F.row_number().over(
                Window.partitionBy("k").orderBy("doc_id")).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id")
    )
    contaminated = pipeline_decontaminate(spark, sf_dir).select("doc_id")
    survivors = (
        d.join(quality, "doc_id", "left_semi")
        .join(kept, "doc_id", "left_semi")
        .filter(F.col("doc_id") % 97 != 0)
        .join(contaminated, "doc_id", "left_anti")
    )
    toks = F.size(F.split("text", " "))
    bucket = F.floor(F.log2(F.greatest(toks, F.lit(1)))).cast("bigint")
    return survivors.groupBy("source", bucket.alias("bucket")).agg(
        F.count("*").alias("n_docs"),
        F.sum(toks.cast("bigint")).alias("total_tokens"),
    )
