"""Full-text search — SURVEY.md §2.9 (graph fulltext over properties,
`graph_engine/src/fulltext.rs`, 723 LoC: tokenize → inverted index → ranked
match).

Spark-first: the "inverted index" is a (term, doc) DataFrame built by
explode — at scale it would be written once, partitioned by term, and
queries become partition-pruned lookups. Ranking is plain term-frequency
(the reference scores by match count too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neumann_spark.catalog import load
from neumann_spark.registry import register
from neumann_spark.session import local_df

SEARCH_TERMS = ("hash", "merge", "stream")


@register(
    "fulltext_search",
    oracle=f"""
    WITH terms AS (SELECT UNNEST(['hash', 'merge', 'stream']) AS term),
    tok AS (
      SELECT doc_id, u.w AS term
      FROM documents, UNNEST(str_split(text, ' ')) AS u(w)
    ),
    hits AS (
      SELECT t.doc_id, t.term, COUNT(*) AS tf
      FROM tok t JOIN terms q ON t.term = q.term
      GROUP BY t.doc_id, t.term
    )
    SELECT doc_id,
           COUNT(*) AS n_terms_matched,
           CAST(SUM(tf) AS BIGINT) AS total_tf
    FROM hits
    GROUP BY doc_id
    HAVING COUNT(*) = 3
    """,
)
def fulltext_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND) full-text search for {hash, merge, stream} over
    documents, ranked by term frequency (`graph_engine/src/fulltext.rs`
    tokenize + match + rank). explode → term join → per-doc agg; the term
    list broadcasts."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    terms = local_df(spark, [(t,) for t in SEARCH_TERMS], "term string")
    hits = (
        tok.join(F.broadcast(terms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    return (
        hits.groupBy("doc_id")
        .agg(F.count("*").alias("n_terms_matched"), F.sum("tf").alias("total_tf"))
        .filter(F.col("n_terms_matched") == len(SEARCH_TERMS))
    )


@register(
    "fulltext_prefix_search",
    oracle="""
    WITH tok AS (
      SELECT doc_id, u.w AS term
      FROM documents, UNNEST(str_split(text, ' ')) AS u(w)
    )
    SELECT doc_id,
           CAST(COUNT(DISTINCT term) AS BIGINT) AS n_prefix_terms,
           CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM tok
    WHERE term LIKE 's%'
    GROUP BY doc_id
    """,
)
def fulltext_prefix_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix search (`search_prefix`, `graph_engine/src/fulltext.rs:181`):
    docs containing any token starting with 's' (scan/sort/stream/spark/...),
    with distinct-term
    and hit counts. The LIKE 'prefix%' predicate is sargable — over a
    term-partitioned inverted index at scale it prunes to the prefix range."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    return (
        tok.filter(F.col("term").startswith("s"))
        .groupBy("doc_id")
        .agg(
            F.countDistinct("term").alias("n_prefix_terms"),
            F.count("*").alias("n_hits"),
        )
    )


FUZZY_QUERY = "straem"  # deliberate transposition of 'stream'
FUZZY_MAX_DIST = 2


@register(
    "fulltext_fuzzy_search",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, u.w AS term
      FROM documents, UNNEST(str_split(text, ' ')) AS u(w)
    ),
    cand AS (
      SELECT DISTINCT term FROM tok
      WHERE ABS(LENGTH(term) - LENGTH('{FUZZY_QUERY}')) <= {FUZZY_MAX_DIST}
    ),
    matched AS (
      SELECT term, levenshtein(term, '{FUZZY_QUERY}') AS dist FROM cand
      WHERE levenshtein(term, '{FUZZY_QUERY}') <= {FUZZY_MAX_DIST}
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(MIN(m.dist) AS BIGINT) AS best_dist
    FROM tok t JOIN matched m ON t.term = m.term
    GROUP BY t.doc_id
    """,
)
def fulltext_fuzzy_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy search (`search_fuzzy`, `graph_engine/src/fulltext.rs:201`):
    Levenshtein distance <= 2 from 'straem'. Both engines have a native
    levenshtein, so the check is exact. Scale shape: the expensive distance
    runs only over DISTINCT terms length-filtered first (|distinct terms|
    << |token stream|), then an equi-join back — never per token
    occurrence."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    cand = (
        tok.select("term")
        .distinct()
        .filter(
            F.abs(F.length("term") - F.lit(len(FUZZY_QUERY))) <= FUZZY_MAX_DIST
        )
    )
    matched = cand.select(
        "term", F.levenshtein("term", F.lit(FUZZY_QUERY)).alias("dist")
    ).filter(F.col("dist") <= FUZZY_MAX_DIST)
    return (
        tok.join(F.broadcast(matched), "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_hits"),
            F.min("dist").cast("bigint").alias("best_dist"),
        )
    )


# --- BM25 ranking ---------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75

# shared oracle building blocks: the inverted-index CTE chain and the
# BM25 scoring aggregate — reused verbatim by the hybrid-retrieval
# oracles (neumann_spark/unified/hybrid.py) so the keyword leg cannot
# drift from the registered BM25 surface
BM25_CORE_CTES = """terms AS (SELECT UNNEST(['hash', 'merge', 'stream']) AS term),
    tok AS (
      SELECT doc_id, u.w AS term
      FROM documents, UNNEST(str_split(text, ' ')) AS u(w)
    ),
    dl AS (
      SELECT doc_id, len(str_split(text, ' ')) AS dl FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             AVG(CAST(dl AS DOUBLE)) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT t.doc_id, t.term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM tok t JOIN terms q ON t.term = q.term
      GROUP BY t.doc_id, t.term
    ),
    df AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
    )"""

BM25_SCORE_SQL = f"""ROUND(SUM(
             LN(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * ({BM25_K1} + 1.0)
             / (tf.tf + {BM25_K1}
                * (1.0 - {BM25_B} + {BM25_B} * d.dl / s.avgdl))
           ), 4)"""

BM25_SCORE_FROM = """FROM tf
    JOIN df ON df.term = tf.term
    JOIN dl d ON d.doc_id = tf.doc_id
    CROSS JOIN stats s
    GROUP BY tf.doc_id"""


@register(
    "fulltext_bm25",
    oracle=f"""
    WITH {BM25_CORE_CTES}
    SELECT tf.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
           {BM25_SCORE_SQL} AS bm25
    {BM25_SCORE_FROM}
    """,
)
def fulltext_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive BM25-ranked search for {hash, merge, stream} — the
    standard inverted-index ranking the reference's tf scoring upgrades to
    (`fulltext.rs` rank path; BM25 parameters k1=1.2, b=0.75).
    Scale shape: tf is the (term, doc) inverted-index join (term list
    broadcast); df and the corpus stats are two tiny aggregates broadcast
    back — the scoring itself is a map-side expression, one shuffle on
    doc_id total."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    terms = local_df(spark, [(t,) for t in SEARCH_TERMS], "term string")
    dl = d.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    tf = (
        tok.join(F.broadcast(terms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    score = idf * F.col("tf") * (BM25_K1 + 1.0) / (
        F.col("tf")
        + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_matched"),
            F.round(F.sum(score), 4).alias("bm25"),
        )
    )


# --- incremental BM25 corpus stats (new r9) ---------------------------------
# Under the CDC story the index's global statistics (per-term df, n_docs,
# avgdl) drift as documents churn. The reference rebuilds its inverted
# index on write (`graph_engine/src/fulltext.rs` index path); the Spark
# CDC analog maintains them ADDITIVELY in the foreachBatch merge — df is
# a per-term count and (n_docs, sum_dl) are scalars, all exactly
# decomposable over inserts and deletes, so the merged state is
# bit-identical to a from-scratch rebuild (pinned by
# tests/test_pipeline.py::test_bm25_stats_incremental_merge).


def _term_df(docs: DataFrame) -> DataFrame:
    """(term, df): per-term document frequency — distinct terms per doc,
    counted per term. One explode + one term-keyed aggregate."""
    tok = docs.select(
        F.explode(F.array_distinct(F.split("text", " "))).alias("term"))
    return tok.groupBy("term").agg(F.count("*").cast("double").alias("df"))


def _doc_totals(docs: DataFrame) -> DataFrame:
    """1-row (n_docs, sum_dl) — avgdl derives as sum_dl / n_docs."""
    return docs.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.coalesce(
            F.sum(F.size(F.split("text", " ")).cast("double")), F.lit(0.0)
        ).alias("sum_dl"),
    )


def bm25_stats_init(docs: DataFrame) -> tuple[DataFrame, DataFrame,
                                               DataFrame]:
    """Build the maintained BM25 corpus state from a document corpus:
    (df_table, totals, docs_state) — (term, df) counts, the 1-row
    (n_docs, sum_dl), and the VERSIONED membership frame
    (doc_id, ver, alive, th) that makes merges idempotent under
    redelivery even when the same keys churn repeatedly (ver = the
    sequence number of the batch that last changed the doc; -1 for the
    initial load so the FIRST micro-batch — foreachBatch's batch_id
    starts at 0 — can delete or update initially-loaded docs: a ver=0
    seed would make the seq=0 guard `ver < seq` silently drop them;
    th = xxhash64 of the doc's indexed text, the fingerprint the merge
    uses to tell an identical-text redelivery, a legal no-op, from an
    UPDATE arriving without its delete, which must be rejected loudly —
    ADVICE r10, mirroring knn_graph_insert's different-embeddings
    rejection)."""
    state = docs.select(
        "doc_id", F.xxhash64("text").alias("th")).distinct().select(
        "doc_id",
        F.lit(-1).cast("bigint").alias("ver"),
        F.lit(True).alias("alive"),
        "th",
    )
    return (_term_df(docs), _doc_totals(docs), state)


def bm25_stats_compact(docs_state: DataFrame,
                       seq_horizon: int) -> DataFrame:
    """Bounded tombstone-compaction maintenance pass (VERDICT r10
    item 5 — the one unbounded-state residue in the CDC story): drop
    tombstone rows whose `ver` is strictly below `seq_horizon`, the
    CALLER-SUPPLIED redelivery horizon — the lowest batch sequence
    number the source may still redeliver (Kafka: the earliest retained
    offset's batch; a checkpointed stream: the last committed batch id).
    Safety: a dropped tombstone has ver < seq_horizon ≤ seq for every
    batch that can still arrive, and for such seq the versioned guard's
    decision never reads the tombstone — a redelivered INSERT with
    seq > ver would apply on the tombstone anyway (tombstone & ver <
    seq) exactly as it applies on the unseen key, and a redelivered
    DELETE joins live docs only. Tombstones AT the horizon stay (a
    seq == ver insert redelivery still needs the row to be refused).
    Live rows are never touched; idempotent (re-running at the same
    horizon is a no-op) — pinned by
    tests/test_pipeline.py::test_bm25_stats_tombstone_compaction.
    One partition-prunable filter over the doc-keyed state, no shuffle."""
    return docs_state.filter(
        F.col("alive") | (F.col("ver") >= int(seq_horizon)))


def bm25_stats_merge(df_tbl: DataFrame, totals: DataFrame,
                     docs_state: DataFrame, added: DataFrame,
                     removed: DataFrame, seq: int) -> tuple[
                         DataFrame, DataFrame, DataFrame]:
    """One CDC micro-batch of the BM25 state: df' = df + df(added)
    - df(removed) per term (zero-count terms drop out), totals' adds the
    batch deltas, and the versioned membership frame advances. `seq` is
    the batch's monotone sequence number, `seq >= 0` (foreachBatch's
    batch_id is exactly this; the initial load seeds ver=-1 so batch 0
    can change initially-loaded docs).

    REDELIVERY SAFE UNDER CHURN (r10, closing the ADVICE r9 hole in the
    r9 membership-only guard): with bare membership, a doc deleted and
    later RE-INSERTED passes a redelivered ORIGINAL delete's membership
    check and gets un-indexed again with the STALE tombstone text —
    silent per-term df corruption in exactly the steady-churn regime.
    Versions close it: an insert applies only to an unseen doc_id or a
    tombstone with ver < seq; a delete applies only to a LIVE doc with
    ver < seq. A redelivered change always carries its original seq,
    which is never greater than the version of any later change to the
    same doc — so stale redeliveries of either kind drop, while a fresh
    batch (seq above every prior ver it touches) applies exactly once.
    An insert for an ALIVE doc at a fresh seq is additionally checked
    against the stored text fingerprint: identical text is a silent
    no-op, different text raises (an update without its delete — r11,
    ADVICE r10). Deleted docs stay as tombstone rows (ver, alive=false,
    th); compact tombstones older than the source's redelivery horizon
    with `bm25_stats_compact`.

    Every step is a doc- or term-keyed join/aggregate — at scale the
    state tables are term-/doc-partitioned and the merge touches only
    the batch's keys. `removed` must carry the removed docs' text (the
    CDC tombstone payload), exactly like the reference re-reads the doc
    to un-index it (`graph_engine/src/fulltext.rs` index path)."""
    # within-batch duplicate rows (at-least-once sources can emit the
    # same change twice in one batch) collapse to one per doc_id BEFORE
    # any count moves, or inserts would double-count df/n_docs/sum_dl.
    # Full-row dedup first, then a per-leg conflict check: a doc_id
    # appearing with two DIFFERENT texts in one leg (a compacted update
    # hiding inside the insert leg) must be rejected loudly — picking
    # an arbitrary winner would make per-term df nondeterministic, the
    # same contract the graph-index insert path enforces.
    def _collapse(leg: DataFrame, name: str) -> DataFrame:
        leg = leg.dropDuplicates()
        crow = leg.agg(
            F.count("*").alias("n"),
            F.count_distinct("doc_id").alias("d")).collect()[0]
        if crow["n"] != crow["d"]:
            raise ValueError(
                f"{int(crow['n']) - int(crow['d'])} doc_ids appear with "
                f"CONFLICTING texts in the '{name}' leg: split "
                "same-batch updates into a delete batch then an insert "
                "batch")
        return leg

    added = _collapse(added, "added")
    removed = _collapse(removed, "removed")
    st = docs_state.select("doc_id", "ver", "alive", "th")
    added_j = added.join(st, "doc_id", "left")
    removed_j = removed.join(st, "doc_id", "inner")
    # three loud-rejection contracts, ONE validation action (r12,
    # VERDICT r11 item 8 — previously three .count() jobs per batch):
    #  'both': a same-batch UPDATE (one doc_id in both legs) cannot be
    #    applied redelivery-safely from aggregate state (on redelivery
    #    the tombstone text no longer matches the stored doc) — callers
    #    split it into a delete batch then an insert batch, the CDC
    #    stream's I/D micro-batch shape;
    #  'upd': cross-batch update-without-delete (ADVICE r10) — an
    #    insert for a currently-ALIVE doc at a FRESH seq with DIFFERENT
    #    text (identical text is a legal redelivery no-op, dropped
    #    below; stale ver >= seq redeliveries stay silent drops
    #    whatever their text). Without the fingerprint this is
    #    undetectable and the state silently serves stale per-term df —
    #    the same contract as knn_graph_insert's rejection;
    #  'bad': the symmetric payload check on the delete leg —
    #    un-indexing text that differs from what the state indexed
    #    would subtract the wrong per-term counts (a corrupt tombstone
    #    payload, never a legal CDC shape).
    mismatch = (F.col("alive") & (F.col("ver") < seq)
                & (F.col("th") != F.xxhash64("text")))
    viol = (
        added.join(removed, "doc_id", "semi")
        .select(F.lit("both").alias("kind"))
        .unionByName(added_j.filter(mismatch)
                     .select(F.lit("upd").alias("kind")))
        .unionByName(removed_j.filter(mismatch)
                     .select(F.lit("bad").alias("kind")))
    )
    counts = {r["kind"]: int(r["n"]) for r in
              viol.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    if counts.get("both"):
        raise ValueError(
            f"{counts['both']} doc_ids appear in both added and removed: "
            "split same-batch updates into a delete batch then an insert "
            "batch")
    if counts.get("upd"):
        raise ValueError(
            f"{counts['upd']} inserts target currently-ALIVE doc_ids with "
            "DIFFERENT text at a fresh seq (an update without its "
            "delete): split updates into a delete batch then an insert "
            "batch")
    if counts.get("bad"):
        raise ValueError(
            f"{counts['bad']} deletes carry text that differs from the "
            "indexed text of their live doc_ids (corrupt tombstone "
            "payload)")
    added = (
        added_j
        .filter(F.col("alive").isNull()
                | ((~F.col("alive")) & (F.col("ver") < seq)))
        .drop("ver", "alive", "th")
    )
    removed = (
        removed_j
        .filter(F.col("alive") & (F.col("ver") < seq))
        .drop("ver", "alive", "th")
    )
    delta = (
        _term_df(added).withColumnRenamed("df", "d_add")
        .join(_term_df(removed).withColumnRenamed("df", "d_rem"),
              "term", "full_outer")
    )
    merged = (
        df_tbl.join(delta, "term", "full_outer")
        .select(
            "term",
            (F.coalesce("df", F.lit(0.0))
             + F.coalesce("d_add", F.lit(0.0))
             - F.coalesce("d_rem", F.lit(0.0))).alias("df"),
        )
        .filter(F.col("df") > 0)
    )
    sign = lambda d, s: _doc_totals(d).select(  # noqa: E731
        (F.col("n_docs") * s).alias("n_docs"),
        (F.col("sum_dl") * s).alias("sum_dl"))
    new_totals = (
        totals.unionByName(sign(added, 1.0)).unionByName(sign(removed, -1.0))
        .agg(F.sum("n_docs").alias("n_docs"), F.sum("sum_dl").alias("sum_dl"))
    )
    changed = (
        added.select(
            "doc_id", F.lit(seq).cast("bigint").alias("ver"),
            F.lit(True).alias("alive"), F.xxhash64("text").alias("th"))
        .unionByName(removed.select(
            "doc_id", F.lit(seq).cast("bigint").alias("ver"),
            F.lit(False).alias("alive"), F.xxhash64("text").alias("th")))
    )
    new_state = (
        st.join(changed, "doc_id", "left_anti").unionByName(changed)
    )
    return merged, new_totals, new_state


@register(
    "fulltext_bm25_cdc_stats",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, u.w AS term
      FROM documents, UNNEST(str_split(text, ' ')) AS u(w)
    ),
    dfs AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df
      FROM tok GROUP BY term
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(SUM(LEN(str_split(text, ' '))) AS DOUBLE) AS sum_dl
      FROM documents
    )
    SELECT d.term, d.df, t.n_docs, t.sum_dl
    FROM dfs d CROSS JOIN tot t
    ORDER BY d.df DESC, d.term
    LIMIT 20
    """,
)
def fulltext_bm25_cdc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 corpus statistics maintained through a CDC churn-and-
    redelivery sequence (new r10; registered surface for the versioned
    state, `bm25_stats_init`/`bm25_stats_merge`): initialize on the
    corpus minus every doc_id % 5 == 0, then
      batch 0 — delete the doc_id % 7 == 0 members (foreachBatch's
                FIRST batch_id, exercising the ver=-1 seed),
      batch 1 — insert the % 5 == 0 docs AND re-insert the batch-0
                deletions (key churn),
      batch 0 redelivered — the original tombstones arrive again, the
                at-least-once failure mode; the versioned guard must
                drop them (a membership-only guard would re-apply them
                and corrupt per-term df).
    The final state must equal a from-scratch rebuild over ALL documents
    — the oracle computes exactly that in SQL (distinct-terms-per-doc df
    counts plus the (n_docs, sum_dl) totals), so a leaked redelivery, a
    double-counted duplicate, or a version comparison off by one
    hash-mismatches. Every merge step is a doc-/term-keyed
    join/aggregate; at scale the state tables are term-/doc-partitioned
    and each batch touches only its keys (reference analog: the write-
    path index maintenance in `graph_engine/src/fulltext.rs`)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    del0 = base.filter(F.col("doc_id") % 7 == 0)
    ins1 = docs.filter(
        (F.col("doc_id") % 5 == 0)
        | ((F.col("doc_id") % 5 != 0) & (F.col("doc_id") % 7 == 0)))
    empty = docs.limit(0)

    # lazy-checkpoint the state frames between micro-batches: each merge's
    # one-action validation executes the chain-so-far, so without the
    # truncation the 4-step replay re-tokenized the corpus quadratically
    # (38 parquet scans in the final plan, measured r13; guide §3.3
    # "materialise an intermediate to truncate the plan"). eager=False
    # adds no extra job — the next validation materializes and caches.
    # A real foreachBatch pipeline gets this for free: committed state is
    # re-read from storage each batch.
    def _ck(st):
        return tuple(f.localCheckpoint(eager=False) for f in st)

    state = _ck(bm25_stats_init(base))
    state = _ck(bm25_stats_merge(*state, empty, del0, seq=0))
    state = _ck(bm25_stats_merge(*state, ins1, empty, seq=1))
    state = _ck(bm25_stats_merge(*state, empty, del0, seq=0))  # redelivery

    df_tbl, totals, _ = state
    return (
        df_tbl.crossJoin(F.broadcast(totals))
        .orderBy(F.col("df").desc(), "term")
        .limit(20)
        .select("term", "df", "n_docs", "sum_dl")
    )
