"""Deduplication operators — LLM-pipeline extension (BASELINE.json north
star: exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine).

Scale design: every variant is a *blocked* pair generation — candidate pairs
come from an equality join on a compact signature (hash / band / simhash
prefix / label block), never from an all-pairs cartesian. At 100 TB the
signature computation is a map-only stage, and each join shuffles on the
signature key (skew-safe: band values are near-uniform by construction).

All hashes derive from `md5_int64` (engine-stable), so even MinHash and
SimHash are fully oracle-checkable — stronger than the usual "trust the
implementation" approach.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from neumann_spark.catalog import load
from neumann_spark.functions.text import SQL_MD5_INT64, md5_int64
from neumann_spark.functions.vector import cosine_expr
from neumann_spark.registry import register

MINHASH_SEEDS = 8
MINHASH_BAND_ROWS = 2  # 4 bands of 2 rows

# Hot-shingle guard for the Jaccard pair join: a shingle occurring in d docs
# fans out d^2 candidate pairs, so one viral bigram at 100 TB is a straggler.
# Shingles above this document frequency (within a source block) are dropped
# from the shingle SETS (both sizes and intersections — consistent Jaccard
# semantics on the capped sets), mirrored exactly in the oracle. Ubiquitous
# shingles carry no near-dup signal anyway (idf ~ 0).
NGRAM_DF_CAP = 50


# --- exact dedup ----------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source, md5(concat(source, ':', CAST(n_chars // 50 AS VARCHAR))) AS k
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, k,
             ROW_NUMBER() OVER (PARTITION BY k ORDER BY doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY k) AS group_size
      FROM keyed
    )
    SELECT doc_id, source, group_size FROM ranked WHERE rn = 1 AND group_size > 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content-key hash, keep-min-id
    (`dropDuplicates` + group stats). The fixture texts are all distinct, so
    the content key here is (source, length-bucket) to exercise the group
    machinery; on real data the key is md5(text). One shuffle on the hash."""
    d = load(spark, sf_dir, "documents")
    k = F.md5(F.concat(F.col("source"), F.lit(":"), (F.col("n_chars") / F.lit(50)).cast("bigint").cast("string")))
    keyed = d.select("doc_id", "source", k.alias("k"))
    w = Window.partitionBy("k")
    ranked = keyed.select(
        "doc_id",
        "source",
        F.row_number().over(w.orderBy("doc_id")).alias("rn"),
        F.count("*").over(w).alias("group_size"),
    )
    return ranked.filter((F.col("rn") == 1) & (F.col("group_size") > 1)).select(
        "doc_id", "source", "group_size"
    )


# --- n-gram (bigram) Jaccard ---------------------------------------------


def _shingles(spark: SparkSession, sf_dir: str, distinct: bool = True) -> DataFrame:
    """Bigram shingles per doc (doc_id % 5 block): index-transform over the
    word array — a map-only expression, no window shuffle. `distinct=True`
    (the set semantics Jaccard needs) costs one shuffle; consumers whose
    aggregate is duplicate-insensitive (MinHash's MIN) pass False and skip
    it (optimization guide §2.4 "a distinct on data that is already
    unique" — here: a distinct whose consumer doesn't need it)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    w = F.split("text", " ")
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = d.select("doc_id", "source", F.explode(bigrams).alias("sh"))
    return sh.distinct() if distinct else sh

_SHINGLES_SQL = """
    words AS MATERIALIZED (
      SELECT doc_id, source, str_split(text, ' ') AS w
      FROM documents WHERE doc_id % 5 = 0
    ),
    sh AS MATERIALIZED (
      SELECT DISTINCT doc_id, source, u.sh
      FROM words, UNNEST(list_transform(generate_series(1, len(w) - 1),
                                        i -> w[i] || ' ' || w[i + 1])) AS u(sh)
      WHERE len(w) >= 2
    )
"""


@register(
    "dedup_ngram_jaccard",
    oracle="WITH "
    + _SHINGLES_SQL
    + """
    , shc AS MATERIALIZED (
      SELECT * FROM sh
      QUALIFY COUNT(*) OVER (PARTITION BY source, sh) <= {cap}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id AND a.source = b.source
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT c.id_a, c.id_b,
           ROUND(CAST(c.c AS DOUBLE) / (sa.n + sb.n - c.c), 6) AS jaccard
    FROM common c
    JOIN sizes sa ON sa.doc_id = c.id_a
    JOIN sizes sb ON sb.doc_id = c.id_b
    WHERE CAST(c.c AS DOUBLE) / (sa.n + sb.n - c.c) >= 0.05
    """.format(cap=NGRAM_DF_CAP),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram (bigram shingle) Jaccard near-dup pairs, blocked by `source`
    so candidate generation is a shingle equi-join, not a cartesian — the
    scalable shape: pairs only materialize where shingles collide."""
    sh = _shingles(spark, sf_dir)
    # document-frequency cap: drop hot shingles BEFORE the pair join so the
    # worst-case fan-out per shingle is bounded by NGRAM_DF_CAP^2, not d^2
    sh = sh.withColumn(
        "df", F.count("*").over(Window.partitionBy("source", "sh"))
    ).filter(F.col("df") <= NGRAM_DF_CAP).drop("df")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("source").alias("src_a"), "sh")
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("source").alias("src_b"), F.col("sh").alias("sh_b"))
    common = (
        a.join(b, (F.col("sh") == F.col("sh_b")) & (F.col("id_a") < F.col("id_b")) & (F.col("src_a") == F.col("src_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("c"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("c").cast("double") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= 0.05)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


# --- MinHash + LSH banding ------------------------------------------------


def _seed_constants() -> list[int]:
    """Fixed 60-bit xor constants derived from md5 of the seed index —
    identical in Spark and SQL by construction."""
    import hashlib

    return [
        int(hashlib.md5(str(j).encode()).hexdigest()[:15], 16)
        for j in range(MINHASH_SEEDS)
    ]


def _minhash_pairs_ctes() -> str:
    """CTE chain ending in `pairs(id_a, id_b, n_bands)`: 8 min-hashes per doc
    (one md5 per shingle, xor-shifted per seed — the standard cheap
    hash-family trick) → 4 bands of 2 → candidate pairs where any band
    collides. Shared by the pair query and the cluster-canonical query."""
    base = SQL_MD5_INT64.format(x="s.sh")
    consts = _seed_constants()
    return f"""{_SHINGLES_SQL},
    seeds(j, c) AS (VALUES {", ".join(f"({j}, {c})" for j, c in enumerate(consts))}),
    sigs AS (
      SELECT s.doc_id, t.j, MIN(xor({base}, t.c)) AS sig
      FROM sh s CROSS JOIN seeds AS t
      GROUP BY s.doc_id, t.j
    ),
    bands AS (
      SELECT doc_id, j // {MINHASH_BAND_ROWS} AS band,
             string_agg(CAST(sig AS VARCHAR), ',' ORDER BY j) AS band_sig
      FROM sigs GROUP BY doc_id, j // {MINHASH_BAND_ROWS}
    ),
    pairs AS MATERIALIZED (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_bands
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
                 AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )"""


def _minhash_sql() -> str:
    return (
        "WITH "
        + _minhash_pairs_ctes()
        + "\n    SELECT id_a, id_b, n_bands FROM pairs"
    )


@register("dedup_minhash_lsh", oracle=_minhash_sql())
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates: shingle → 8 seeded min-hashes →
    band (2 rows × 4 bands) → bucket-join. The canonical sub-quadratic dedup:
    signature computation is map-only; the only shuffle keys are (band,
    band_sig), uniform by construction. Hash functions are md5-derived so
    the oracle reproduces them exactly (no approximation slack needed)."""
    # One groupBy(doc_id) computes all 8 seeded minima as parallel agg
    # expressions (guide §2.3 "aggregate before you shuffle"): the shuffle
    # carries |docs| rows of partial minima instead of 8x-exploded
    # (doc, seed) rows, and the former second (doc_id, band) aggregation
    # becomes a map-only expression. MIN is duplicate-insensitive, so the
    # shingle distinct's shuffle is skipped too: 5 exchanges -> 3
    # (plan diff in plans/r13/dedup_minhash_lsh_{before,after}.txt; the
    # same md5-xor hash family, bit-identical sigs — oracle unchanged).
    sh = _shingles(spark, sf_dir, distinct=False).select(
        "doc_id", md5_int64(F.col("sh")).alias("h")  # one md5 per shingle
    )
    consts = _seed_constants()
    sigs = sh.groupBy("doc_id").agg(
        *[
            F.min(F.col("h").bitwiseXOR(F.lit(c))).alias(f"s{j}")
            for j, c in enumerate(consts)
        ]
    )
    band_structs = [
        F.struct(
            F.lit(b).cast("bigint").alias("band"),
            F.concat_ws(
                ",",
                *[
                    F.col(f"s{b * MINHASH_BAND_ROWS + r}").cast("string")
                    for r in range(MINHASH_BAND_ROWS)
                ],
            ).alias("band_sig"),
        )
        for b in range(MINHASH_SEEDS // MINHASH_BAND_ROWS)
    ]
    bands = sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bs")
    ).select("doc_id", "bs.band", "bs.band_sig")
    a = bands.select(F.col("doc_id").alias("id_a"), "band", "band_sig")
    b = bands.select(
        F.col("doc_id").alias("id_b"),
        F.col("band").alias("band_b"),
        F.col("band_sig").alias("band_sig_b"),
    )
    return (
        a.join(
            b,
            (F.col("band") == F.col("band_b"))
            & (F.col("band_sig") == F.col("band_sig_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_bands"))
    )


# --- duplicate-cluster canonicalization -----------------------------------

# LSH pairs alone aren't dedup: A~B and B~C must collapse to ONE survivor,
# so pairs feed a connected-components pass and each cluster keeps its
# min-id doc. Fixed rounds on both engines → exact regardless of
# convergence; LSH clusters are near-cliques, so diameter << rounds.
DEDUP_CC_ROUNDS = 5


def _cluster_sql(rounds: int = DEDUP_CC_ROUNDS) -> str:
    parts = [
        "WITH ",
        _minhash_pairs_ctes(),
        """,
    dedges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    k0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS comp FROM dedges)""",
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f""",
    k{t} AS MATERIALIZED (
      SELECT c.id,
             LEAST(MIN(c.comp), COALESCE(MIN(cm.comp), MIN(c.comp))) AS comp
      FROM k{t-1} c
      LEFT JOIN dedges e ON e.src = c.id
      LEFT JOIN k{t-1} cm ON cm.id = e.dst
      GROUP BY c.id
    )"""
        )
    parts.append(
        f"""
    SELECT comp AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_removed
    FROM k{rounds} GROUP BY comp"""
    )
    return "".join(parts)


@register("dedup_cluster_canonical", oracle=_cluster_sql())
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-dedup clustering — the production shape downstream of LSH:
    candidate pairs → connected components (min-id propagation) → keep the
    min-id doc per cluster, drop the rest. Returns per-cluster stats
    (cluster_id = the surviving canonical doc). Scale: the pair graph is
    tiny relative to the corpus (only near-dups appear), so the CC loop
    shuffles a vanishing fraction of the data; the final keep-set applies
    back to the corpus as a broadcast anti-join."""
    pairs = dedup_minhash_lsh(spark, sf_dir).select("id_a", "id_b")
    e = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionAll(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .localCheckpoint(eager=False)
    )
    comp = e.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("comp")
    )
    for rnd in range(DEDUP_CC_ROUNDS):
        nb = (
            e.join(comp, e.dst == comp.id)
            .groupBy("src")
            .agg(F.min("comp").alias("nb_comp"))
        )
        comp = comp.join(nb, comp.id == nb.src, "left").select(
            "id",
            F.least(F.col("comp"), F.coalesce("nb_comp", F.col("comp"))).alias(
                "comp"
            ),
        )
        # comp feeds TWO consumers per round (the message join and the
        # update join), so the lazy plan doubles per round — 2^5 = 32 leaf
        # copies, 62 sort-merge joins, a 21 s cold run at sf0.1 dominated
        # by Catalyst planning (measured r13). A checkpoint every 2 rounds
        # caps the fan-out at 4 leaves, same as graph CC's every-3-rounds
        # truncation (optimization guide §3.3 "very large plans: planning
        # time itself can become the bottleneck — truncate the plan").
        if rnd % 2 == 1:
            comp = comp.localCheckpoint(eager=False)
    return comp.groupBy(F.col("comp").alias("cluster_id")).agg(
        F.count("*").alias("n_docs"),
        (F.count("*") - F.lit(1)).cast("bigint").alias("n_removed"),
    )


# --- SimHash --------------------------------------------------------------

SIMHASH_BITS = 16


def _simhash_sql() -> str:
    h = SQL_MD5_INT64.format(x="u.w")
    bit_sums = ",\n             ".join(
        f"SUM(CASE WHEN (({h}) >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(SIMHASH_BITS)
    )
    recompose = " + ".join(
        f"CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(SIMHASH_BITS)
    )
    return f"""
    WITH wordbits AS (
      SELECT doc_id,
             {bit_sums}
      FROM documents, UNNEST(str_split(text, ' ')) AS u(w)
      WHERE doc_id % 7 = 0
      GROUP BY doc_id
    )
    SELECT doc_id, CAST({recompose} AS BIGINT) AS simhash
    FROM wordbits
    """


@register("dedup_simhash", oracle=_simhash_sql())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash document signatures: per-word md5 bits vote ±1 per position;
    sign recomposes a 16-bit signature. Near-dups then pair by
    `bit_count(a XOR b) ≤ r` on the compact signature — map-only signature,
    tiny shuffle. Oracle reproduces signatures exactly."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    h = md5_int64(F.col("word"))
    bit_sums = [
        F.sum(
            F.when(h.bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    sums = w.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return sums.select("doc_id", sim.cast("bigint").alias("simhash"))


# --- embedding-cosine near-dup -------------------------------------------


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label,
             SUM(CAST(a.embedding[t.i] AS DOUBLE) * CAST(b.embedding[t.i] AS DOUBLE)) AS dot,
             SQRT(SUM(CAST(a.embedding[t.i] AS DOUBLE) * CAST(a.embedding[t.i] AS DOUBLE))) AS na,
             SQRT(SUM(CAST(b.embedding[t.i] AS DOUBLE) * CAST(b.embedding[t.i] AS DOUBLE))) AS nb
      FROM embeddings a
      JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
      CROSS JOIN generate_series(1, 64) AS t(i)
      GROUP BY a.vec_id, b.vec_id, a.label
    )
    SELECT id_a, id_b, label, ROUND(dot / (na * nb), 6) AS cos_sim
    FROM pairs WHERE dot / (na * nb) > 0.28
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by `label` (the cluster/
    collection column) so the pair join is per-block instead of global
    all-pairs — at 100 TB the block key would be an ANN bucket (see
    pipeline.ann) and this same pair-scoring join runs per bucket."""
    from neumann_spark.functions.vector import cos_pair_batch

    emb = load(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("label"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("label").alias("label_b"), F.col("embedding").alias("vb"))
    # Arrow pair UDF, not cosine_expr: the expression form is pushed into
    # the block-join condition and runs interpreted per pair (see
    # cos_pair_batch's docstring / dedup_semantic_semdedup)
    return (
        a.join(b, (F.col("label") == F.col("label_b")) & (F.col("id_a") < F.col("id_b")))
        .withColumn("cos_sim_raw", cos_pair_batch(
            F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")))
        .filter(F.col("cos_sim_raw") > 0.28)
        .select("id_a", "id_b", "label", F.round("cos_sim_raw", 6).alias("cos_sim"))
    )


# --- corpus-level boilerplate (hot n-gram) detection ----------------------

HOT_NGRAM_MIN_DOCS = 3


@register(
    "dedup_hot_ngrams",
    oracle="""
    WITH words AS MATERIALIZED (
      SELECT doc_id, str_split(text, ' ') AS w FROM documents
    ),
    grams AS MATERIALIZED (
      SELECT DISTINCT doc_id, u.g
      FROM words, UNNEST(list_transform(generate_series(1, len(w) - 2),
                         i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS u(g)
      WHERE len(w) >= 3
    ),
    hot AS MATERIALIZED (
      SELECT g, COUNT(*) AS df FROM grams GROUP BY g
      HAVING COUNT(*) >= 3
    )
    SELECT gr.doc_id,
           COUNT(*) AS n_hot_grams,
           MAX(h.df) AS max_df
    FROM grams gr JOIN hot h ON h.g = gr.g
    GROUP BY gr.doc_id
    """,
)
def dedup_hot_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate detection (the exact-substring-dedup
    family, Lee et al. 2021 "Deduplicating Training Data Makes Language
    Models Better"): distinct word 3-grams per doc → corpus document
    frequency → flag docs containing 3-grams shared by >= 3 documents
    (headers, footers, licence blocks, templated spans).

    Scale shape: one explode (map-side), one groupBy on the gram hash (the
    only wide shuffle, combiner-reduced), one semi-join back — no pairwise
    comparison anywhere, so cost is linear in corpus token count. At 100 TB
    the gram table would be frequency-pruned per partition first (local df
    >= 2) to cut the shuffle; the semantics are unchanged."""
    d = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    trigrams = F.when(
        F.size(w) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(w, i),
                F.element_at(w, i + 1),
                F.element_at(w, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = d.select("doc_id", F.explode(trigrams).alias("g")).distinct()
    hot = (
        grams.groupBy("g")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= HOT_NGRAM_MIN_DOCS)
    )
    return (
        grams.join(hot, "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hot_grams"), F.max("df").alias("max_df"))
    )


# --- SemDeDup: k-means-cluster-blocked semantic dedup ---------------------

SEMDEDUP_TAU = 0.3  # within-cluster cosine above this = semantic duplicate


def _semdedup_sql(tau: float = SEMDEDUP_TAU) -> str:
    """Oracle: the unrolled Lloyd assignment CTEs (shared with the IVF
    queries), within-cluster pairwise cosine above tau, greedy min-id
    survivors, per-cluster stats."""
    from neumann_spark.pipeline.ann import DIM, IVF_ITERS, _ivf_sql

    ivf = _ivf_sql()
    prefix = ivf[: ivf.rindex("\n    SELECT cluster, COUNT")]
    return (
        prefix
        + f""", pairs AS MATERIALIZED (
      SELECT aa.cluster, a.vec_id AS id_a, b.vec_id AS id_b,
             SUM(CAST(a.embedding[t.i] AS DOUBLE) * CAST(b.embedding[t.i] AS DOUBLE)) AS dot,
             SQRT(SUM(CAST(a.embedding[t.i] AS DOUBLE) * CAST(a.embedding[t.i] AS DOUBLE))) AS na,
             SQRT(SUM(CAST(b.embedding[t.i] AS DOUBLE) * CAST(b.embedding[t.i] AS DOUBLE))) AS nb
      FROM embeddings a
      JOIN a{IVF_ITERS} aa ON aa.vec_id = a.vec_id
      JOIN a{IVF_ITERS} ab ON ab.cluster = aa.cluster
      JOIN embeddings b ON b.vec_id = ab.vec_id AND a.vec_id < b.vec_id
      CROSS JOIN generate_series(1, {DIM}) AS t(i)
      GROUP BY aa.cluster, a.vec_id, b.vec_id
      HAVING ROUND(dot / (na * nb), 6) > {tau}
    ),
    removed AS MATERIALIZED (
      SELECT DISTINCT id_b FROM pairs
    )
    SELECT a.cluster,
           COUNT(*) AS n_vectors,
           CAST(COUNT(r.id_b) AS BIGINT) AS n_removed,
           CAST(COUNT(*) - COUNT(r.id_b) AS BIGINT) AS n_kept
    FROM a{IVF_ITERS} a LEFT JOIN removed r ON r.id_b = a.vec_id
    GROUP BY a.cluster"""
    )


@register("dedup_semantic_semdedup", oracle=_semdedup_sql())
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication" — public method): embed,
    k-means-cluster, and deduplicate WITHIN clusters only — pairwise cosine
    runs per cluster, never across the corpus. A vector is removed iff a
    smaller-id vector in its cluster exceeds the cosine threshold (the
    paper's greedy one-per-epsilon-ball keep rule made deterministic by id
    order). Returns per-cluster (n_vectors, n_removed, n_kept).

    This makes `dedup_embedding_cosine`'s docstring promise concrete: the
    block key IS the learned ANN cluster (same deterministic Lloyd build
    the IVF queries share, so the index amortizes). Scale shape: cluster
    id is the shuffle/partition key; per-cluster pair volume is bounded by
    balanced cluster sizes (k scales with corpus), and the removal rule is
    one pair join + one distinct + one left join — no iteration."""
    from neumann_spark.pipeline.ann import ivf_index

    state, _ = ivf_index(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")
    assign = state.select("vec_id", "cluster")
    a = (
        emb.join(assign, "vec_id")
        .select(F.col("vec_id").alias("id_a"), "cluster",
                F.col("embedding").alias("va"))
    )
    b = (
        emb.join(assign, "vec_id")
        .select(F.col("vec_id").alias("id_b"),
                F.col("cluster").alias("cluster_b"),
                F.col("embedding").alias("vb"))
    )
    from neumann_spark.functions.vector import cos_pair_batch

    # cosine via the Arrow pair UDF, NOT cosine_expr: an expression-based
    # score is pushed into the cluster-join's condition where it runs
    # interpreted per pair (measured ~13 s at sf0.1 vs ~1 s for this plan)
    pairs = (
        a.join(b, (F.col("cluster") == F.col("cluster_b"))
               & (F.col("id_a") < F.col("id_b")))
        .withColumn("cos", cos_pair_batch(
            F.col("va").cast("array<double>"),
            F.col("vb").cast("array<double>")))
        .filter(F.round(F.col("cos"), 6) > SEMDEDUP_TAU)
        .select("cluster", "id_a", "id_b")
    )
    removed = pairs.select("id_b").distinct()
    return (
        assign.join(removed, assign.vec_id == removed.id_b, "left")
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_vectors"),
            F.count("id_b").alias("n_removed"),
            (F.count("*") - F.count("id_b")).alias("n_kept"),
        )
    )
