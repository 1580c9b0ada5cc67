"""Post-mutation aggregate queries — one per store (graph / vector /
unified), driving the engine facade's mutation surface end-to-end and
verifying the resulting state against a DuckDB oracle that replays the same
mutations declaratively.

The reference mutates in place (`graph_engine/src/lib.rs:3551-6459`,
`vector_engine/src/lib.rs:1915,2340,3320`, `tensor_unified/src/lib.rs:
708,804,839`); the facade's recompute-and-replace overlays are checked here
by aggregating the *post*-mutation state, so a wrong delete/update changes
the hash.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neumann_spark.graph.model import GRAPH_SQL_CTE
from neumann_spark.registry import register
from neumann_spark.session import local_df


@register(
    "dml_graph_mutation",
    oracle=GRAPH_SQL_CTE
    + """
    , nodes2 AS MATERIALIZED (
        SELECT id, CASE WHEN id = 1 THEN 'vip' ELSE label END AS label
        FROM nodes
        WHERE NOT (label = 'supplier' AND id % 100 = 7)
        UNION ALL SELECT 9000001, 'annex'
        UNION ALL SELECT 9000002, 'annex'
      ),
      edges2 AS MATERIALIZED (
        SELECT src, dst, weight FROM edges
        WHERE NOT (src >= 1000000 AND src < 2000000 AND src % 100 = 7)
          AND NOT (dst >= 1000000 AND dst < 2000000 AND dst % 100 = 7)
        UNION ALL SELECT 9000001, 9000002, 2.5
      )
    SELECT (SELECT COUNT(*) FROM nodes2) AS n_nodes,
           (SELECT COUNT(*) FROM nodes2 WHERE label = 'vip') AS n_vip,
           (SELECT COUNT(*) FROM edges2) AS n_edges,
           (SELECT CAST(SUM(CAST(weight AS DECIMAL(18,2))) AS DOUBLE)
              FROM edges2) AS total_weight
    """,
)
def dml_graph_mutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-store mutation round-trip: Cypher CREATE x2 + edge CREATE,
    DETACH DELETE of every supplier with suppkey % 100 = 7, update_node
    relabel of customer#1 — then a one-row state aggregate. Exercises
    `_exec_cypher_create`, `_exec_cypher_delete`, `update_node`."""
    from neumann_spark.engine import NeumannSparkEngine

    eng = NeumannSparkEngine(spark, sf_dir)
    eng.execute("CREATE (n:annex {id: 9000001})")
    eng.execute("CREATE (m:annex {id: 9000002})")
    eng.execute("CREATE (a {id: 9000001})-[:linked {weight: 2.5}]->(b {id: 9000002})")
    eng.execute("MATCH (n:supplier) WHERE id % 100 = 7 DETACH DELETE n")
    eng.update_node(1, "vip")
    nodes = eng._nodes.agg(
        F.count("*").alias("n_nodes"),
        F.sum(F.when(F.col("label") == "vip", 1).otherwise(0)).alias("n_vip"),
    )
    edges = eng._edges.agg(
        F.count("*").alias("n_edges"),
        F.sum(F.col("weight").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_weight"),
    )
    return nodes.crossJoin(edges)


@register(
    "dml_vector_mutation",
    oracle="""
    WITH kept AS MATERIALIZED (
      SELECT embedding FROM embeddings WHERE NOT (vec_id % 10 = 3)
    )
    SELECT (SELECT COUNT(*) FROM kept) + 1 AS n_vectors,
           CAST((SELECT SUM(CAST(ROUND(CAST(embedding[1] AS DOUBLE), 5)
                     AS DECIMAL(18,5))) FROM kept)
                + CAST(0.5 AS DECIMAL(18,5)) AS DOUBLE) AS sum_first
    """,
)
def dml_vector_mutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-store mutation round-trip: batch delete (vec_id % 10 = 3),
    one EMBED upsert with a known vector — then count + exact-decimal sum
    of the first component. Exercises `delete_embeddings_where` and the
    EMBED anti-join upsert.

    Determinism: each float32 element is rounded to 5 dp AS A DOUBLE before
    the exact decimal sum — a direct float->DECIMAL cast rounds differently
    in Spark vs DuckDB at representation boundaries (seen at sf0.1), while
    double ROUND agrees."""
    from neumann_spark.engine import NeumannSparkEngine

    eng = NeumannSparkEngine(spark, sf_dir)
    eng.delete_embeddings_where("try_cast(key AS BIGINT) % 10 = 3")
    eng.execute("EMBED 'm:1' [" + ",".join(["0.5"] * 64) + "]")
    return eng._embeddings.agg(
        F.count("*").alias("n_vectors"),
        F.sum(
            F.round(F.element_at("embedding", 1).cast("double"), 5).cast(
                "decimal(18,5)"
            )
        )
        .cast("double")
        .alias("sum_first"),
    )


@register(
    "dml_entity_mutation",
    oracle=GRAPH_SQL_CTE
    + """
    , edges2 AS MATERIALIZED (
        SELECT * FROM edges
        WHERE NOT (src = 17 OR dst = 17)
          AND NOT (edge_type = 'located_in' AND src = 1)
      )
    SELECT (SELECT COUNT(*) FROM nodes WHERE id <> 17) AS n_nodes,
           (SELECT COUNT(*) FROM edges2) AS n_edges,
           (SELECT COUNT(*) FROM embeddings WHERE vec_id <> 17) AS n_embeddings
    """,
)
def dml_entity_mutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unified-store mutation round-trip: disconnect customer#1 from its
    nation (drops the located_in edge), delete_entity(17) (node + incident
    edges + embedding '17') — then a one-row state aggregate. Exercises
    `disconnect_entities` and `delete_entity`."""
    from neumann_spark.catalog import load
    from neumann_spark.engine import NeumannSparkEngine

    eng = NeumannSparkEngine(spark, sf_dir)
    nat = 2000000 + int(
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == 1)
        .select("c_nationkey")
        .head()[0]
    )
    eng.disconnect_entities(1, nat)
    eng.delete_entity(17)
    n = eng._nodes.agg(F.count("*").alias("n_nodes"))
    e = eng._edges.agg(F.count("*").alias("n_edges"))
    v = eng._embeddings.agg(F.count("*").alias("n_embeddings"))
    return n.crossJoin(e).crossJoin(v)


@register(
    "dml_fk_actions",
    oracle="""
    WITH parent AS MATERIALIZED (
      SELECT CAST(i AS BIGINT) AS id FROM generate_series(0, 4) AS t(i)
      WHERE i NOT IN (1, 3)
    ),
    cascade_child AS MATERIALIZED (
      SELECT CAST(i AS BIGINT) AS cid, CAST(i % 5 AS BIGINT) AS pid
      FROM generate_series(0, 24) AS t(i)
      WHERE i % 5 NOT IN (1, 3)
    ),
    setnull_child AS MATERIALIZED (
      SELECT CAST(i AS BIGINT) AS cid,
             CASE WHEN i % 5 IN (1, 3) THEN NULL
                  ELSE CAST(i % 5 AS BIGINT) END AS pid
      FROM generate_series(100, 124) AS t(i)
    )
    SELECT (SELECT COUNT(*) FROM parent) AS n_parents,
           (SELECT COUNT(*) FROM cascade_child) AS n_cascade_left,
           (SELECT COUNT(*) FROM setnull_child WHERE pid IS NULL) AS n_nulled,
           (SELECT COUNT(*) FROM setnull_child) AS n_setnull_total
    """,
)
def dml_fk_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key referential actions end-to-end
    (`relational_engine/src/lib.rs:165-258` ReferentialAction;
    `:5209-5242` insert-side validate_fk_reference): parent(0..4),
    a CASCADE child (25 rows, pid = cid % 5) and a SET NULL child; delete
    parents 1 and 3; the one-row aggregate pins the post-action state.
    Enforcement is broadcast anti/semi joins — no shuffle at scale."""
    from neumann_spark.engine import NeumannSparkEngine

    eng = NeumannSparkEngine(spark, sf_dir)
    eng.execute("CREATE TABLE fkq_parent (id INT)")
    eng.execute(
        "CREATE TABLE fkq_cascade (cid INT, pid INT, "
        "FOREIGN KEY (pid) REFERENCES fkq_parent(id) ON DELETE CASCADE)")
    eng.execute(
        "CREATE TABLE fkq_setnull (cid INT, pid INT, "
        "FOREIGN KEY (pid) REFERENCES fkq_parent(id) ON DELETE SET NULL)")
    eng.execute("INSERT INTO fkq_parent VALUES (0), (1), (2), (3), (4)")
    eng.execute(
        "INSERT INTO fkq_cascade VALUES "
        + ", ".join(f"({i}, {i % 5})" for i in range(25)))
    eng.execute(
        "INSERT INTO fkq_setnull VALUES "
        + ", ".join(f"({i}, {i % 5})" for i in range(100, 125)))
    eng.execute("DELETE FROM fkq_parent WHERE id IN (1, 3)")
    p = eng._tables["fkq_parent"].agg(F.count("*").alias("n_parents"))
    c = eng._tables["fkq_cascade"].agg(F.count("*").alias("n_cascade_left"))
    s = eng._tables["fkq_setnull"].agg(
        F.sum(F.when(F.col("pid").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_nulled"),
        F.count("*").alias("n_setnull_total"),
    )
    return p.crossJoin(c).crossJoin(s)


@register(
    "cursor_pagination",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    ORDER BY n_nationkey LIMIT 7 OFFSET 7
    """,
)
def cursor_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paginated cursor tokens (`query_router/src/cursor.rs:1-435`): open a
    cursor over an ordered SELECT (result snapshot localCheckpointed once),
    advance one page via the returned token, and return the second page —
    the driver hash pins both the token round-trip and the offset/limit
    slicing."""
    from neumann_spark.engine import NeumannSparkEngine

    eng = NeumannSparkEngine(spark, sf_dir)
    token = eng.open_cursor(
        "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey",
        page_size=7)
    _, token = eng.fetch_page(token)
    page, _ = eng.fetch_page(token)
    return page


@register(
    "cursor_stream_batches",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS rn
      FROM orders
    )
    SELECT rn // 1000 AS batch_id, COUNT(*) AS n_rows,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
    FROM t GROUP BY 1 ORDER BY 1
    """,
)
def cursor_stream_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming cursor (`relational_engine/src/cursor.rs` StreamingCursor):
    `execute_streaming` yields fixed-size row batches over toLocalIterator
    without materializing the result on the driver. The query consumes the
    whole iterator and hashes each batch's (index, size, key-sum), pinning
    batch boundaries, ordering, and completeness against the oracle's
    ROW_NUMBER partitioning of the same ordered scan."""
    from neumann_spark.engine import NeumannSparkEngine

    eng = NeumannSparkEngine(spark, sf_dir)
    it = eng.execute_streaming(
        "SELECT o_orderkey FROM orders ORDER BY o_orderkey",
        batch_size=1000)
    rows = [(i, len(b), sum(r["o_orderkey"] for r in b))
            for i, b in enumerate(it)]
    return local_df(spark,
        rows, "batch_id bigint, n_rows bigint, key_sum bigint")


@register(
    "result_cache_semantics",
    oracle="""
    SELECT TRUE AS hit_is_cached,
           CAST(1 AS BIGINT) AS cached_before_write,
           CAST(0 AS BIGINT) AS cached_after_write,
           (SELECT COUNT(*) FROM region) AS n_regions,
           TRUE AS recompute_matches
    """,
)
def result_cache_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-result cache (`query_router/src/lib.rs:1931-1961`): a repeated
    cacheable SELECT returns the memoized result object (hit), the entry
    survives until the next write, any write invalidates the whole cache,
    and the post-invalidation recompute equals the cached result. Each
    observable is a hashed column, so a broken hit/invalidation path flips
    the row."""
    from neumann_spark.engine import NeumannSparkEngine

    eng = NeumannSparkEngine(spark, sf_dir)
    q = "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"
    first = eng.execute(q)
    hit_is_cached = eng.execute(q) is first  # LRU hit: same object
    cached_before = len(eng._cache)
    before_rows = sorted(map(tuple, first.collect()))
    eng.execute("CREATE TABLE cache_poke (id INT)")  # any write invalidates
    cached_after = len(eng._cache)
    recompute_matches = (
        sorted(map(tuple, eng.execute(q).collect())) == before_rows)
    eng.execute("DROP TABLE cache_poke")
    return local_df(spark,
        [(hit_is_cached, cached_before, cached_after,
          len(before_rows), recompute_matches)],
        "hit_is_cached boolean, cached_before_write bigint, "
        "cached_after_write bigint, n_regions bigint, "
        "recompute_matches boolean")


@register(
    "tx_atomic_visibility",
    oracle="""
    WITH final AS (
      SELECT * FROM (VALUES (1, 'base'), (2, 'two'), (4, 'committed'))
        t(id, v)
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM final) AS n_rows,
           (SELECT CAST(SUM(id) AS BIGINT) FROM final) AS id_sum,
           (SELECT STRING_AGG(v, '|' ORDER BY v) FROM final) AS vs,
           CAST(0 AS BIGINT) AS n_tx_nodes,
           TRUE AS nested_begin_rejected,
           TRUE AS stray_commit_rejected
    """,
)
def tx_atomic_visibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BEGIN/COMMIT/ROLLBACK facade transactions
    (`relational_engine/src/transaction.rs:1-945`; router BEGIN dispatch
    `query_router/src/lib.rs:1969+`): a rolled-back transaction leaves
    zero trace (insert, update, and graph node all undone), a committed
    one is fully visible, and nested BEGIN / stray COMMIT are typed
    errors. The hashed row pins the post-sequence state; the oracle is
    the declarative replay with the aborted block elided."""
    from neumann_spark.engine import NeumannSparkEngine

    eng = NeumannSparkEngine(spark, sf_dir)
    eng.execute("CREATE TABLE tx_vis (id INT, v TEXT)")
    eng.execute("INSERT INTO tx_vis VALUES (1, 'base'), (2, 'keep')")
    eng.execute("BEGIN")
    eng.execute("INSERT INTO tx_vis VALUES (3, 'gone')")
    eng.execute("UPDATE tx_vis SET v = 'lost' WHERE id = 2")
    eng.execute("NODE 9500002 txlab2")
    nested = False
    try:
        eng.execute("BEGIN")
    except ValueError:
        nested = True
    eng.execute("ROLLBACK")
    eng.execute("BEGIN TRANSACTION")
    eng.execute("INSERT INTO tx_vis VALUES (4, 'committed')")
    eng.execute("UPDATE tx_vis SET v = 'two' WHERE id = 2")
    eng.execute("COMMIT")
    stray = False
    try:
        eng.execute("COMMIT")
    except ValueError:
        stray = True
    base = eng.execute("SELECT id, v FROM tx_vis").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("id").cast("bigint").alias("id_sum"),
        F.array_join(F.sort_array(F.collect_list("v")), "|").alias("vs"))
    nodes = eng._nodes.filter(F.col("label") == "txlab2").agg(
        F.count("*").alias("n_tx_nodes"))
    return (base.crossJoin(nodes)
            .withColumn("nested_begin_rejected", F.lit(nested))
            .withColumn("stray_commit_rejected", F.lit(stray)))


@register(
    "graph_aggregate_verbs",
    oracle=GRAPH_SQL_CTE
    + """
    SELECT
      (SELECT COUNT(id) FROM nodes WHERE label = 'customer')
        AS n_customers,
      (SELECT MAX(id) FROM nodes WHERE label = 'supplier')
        AS max_supplier_id,
      (SELECT CAST(SUM(weight) AS DOUBLE) FROM edges
        WHERE edge_type = 'located_in') AS located_in_total,
      (SELECT CAST(AVG(weight) AS DOUBLE) FROM edges
        WHERE edge_type = 'part_of') AS part_of_avg,
      (SELECT MAX(weight) FROM edges WHERE edge_type = 'supplies')
        AS supplies_max,
      (SELECT COUNT(weight) FROM edges
        WHERE edge_type = 'supplies' AND dst % 2 = 0) AS supplies_even_cnt
    """,
)
def graph_aggregate_verbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph AGGREGATE verbs (`graph_engine` property aggregation; router
    AGGREGATE dispatch): COUNT/MAX over node properties BY LABEL,
    SUM/AVG/MAX/COUNT over edge weight BY TYPE / ON, plus a WHERE
    predicate — every facade branch of `_exec_aggregate` in one hashed
    row. Aggregates are chosen fp-exact (counts, maxima, sums of 1.0
    weights) so the hash is stable across partition orderings."""
    from neumann_spark.engine import NeumannSparkEngine

    eng = NeumannSparkEngine(spark, sf_dir)

    def one(cmd: str, out: str) -> DataFrame:
        df = eng.execute(cmd)
        return df.select(F.col(df.columns[0]).alias(out))

    return (
        one("AGGREGATE NODE PROPERTY id COUNT BY LABEL customer",
            "n_customers")
        .crossJoin(one("AGGREGATE NODE PROPERTY id MAX BY LABEL supplier",
                       "max_supplier_id"))
        .crossJoin(one("AGGREGATE EDGE PROPERTY weight SUM ON located_in",
                       "located_in_total"))
        .crossJoin(one("AGGREGATE EDGE PROPERTY weight AVG BY TYPE part_of",
                       "part_of_avg"))
        .crossJoin(one("AGGREGATE EDGE PROPERTY weight MAX BY TYPE supplies",
                       "supplies_max"))
        .crossJoin(one(
            "AGGREGATE EDGE PROPERTY weight COUNT ON supplies "
            "WHERE dst % 2 = 0", "supplies_even_cnt"))
    )


@register(
    "ddl_roundtrip",
    oracle="""
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'a', CAST(1.5 AS DOUBLE), CAST(NULL AS BOOLEAN)),
      (CAST(2 AS BIGINT), 'b', CAST(9.9 AS DOUBLE), CAST(NULL AS BOOLEAN))
    ) t(id, name, score, flag)
    """,
)
def ddl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-table DDL/DML round-trip through the engine facade:
    CREATE TABLE → INSERT → ALTER ADD COLUMN (NULL-filled, the columnar
    append of `relational_engine/src/lib.rs:4807`) → UPDATE → DELETE →
    SELECT. The driver hash pins the post-mutation state end-to-end."""
    from neumann_spark.engine import NeumannSparkEngine

    eng = NeumannSparkEngine(spark, sf_dir)
    eng.execute("CREATE TABLE ddl_t (id INT, name TEXT, score FLOAT)")
    eng.execute(
        "INSERT INTO ddl_t VALUES (1, 'a', 1.5), (2, 'b', 2.5), (3, 'c', 3.5)")
    eng.execute("ALTER TABLE ddl_t ADD COLUMN flag BOOLEAN")
    eng.execute("UPDATE ddl_t SET score = 9.9 WHERE id = 2")
    eng.execute("DELETE FROM ddl_t WHERE id = 3")
    return eng.execute("SELECT id, name, score, flag FROM ddl_t")


@register(
    "dml_constraint_enforcement",
    oracle="""
    WITH parent AS MATERIALIZED (
      SELECT CASE WHEN i IN (1, 3) THEN i + 100 ELSE i END AS id
      FROM generate_series(0, 4) AS t(i)
    ),
    child AS MATERIALIZED (
      SELECT i AS cid,
             CASE WHEN i % 5 IN (1, 3) THEN (i % 5) + 100 ELSE i % 5 END AS pid
      FROM generate_series(0, 9) AS t(i)
    )
    SELECT (SELECT COUNT(*) FROM parent) AS n_parents,
           (SELECT CAST(SUM(id) AS BIGINT) FROM parent) AS sum_parent_ids,
           (SELECT COUNT(*) FROM child) AS n_children,
           (SELECT CAST(SUM(pid) AS BIGINT) FROM child) AS sum_child_pids,
           CAST(7 AS BIGINT) AS default_grp
    """,
)
def dml_constraint_enforcement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRIMARY KEY / DEFAULT / FK ON UPDATE CASCADE end-to-end
    (`relational_engine/src/lib.rs:235-258` Constraint, `:1397` violations,
    `:195` on_update): a PK'd parent (0..4) with a CASCADE-on-update child
    (10 rows, pid = cid % 5); a duplicate-PK insert is rejected (leaving
    state untouched — pinned by the aggregates), parent keys 1 and 3 are
    renumbered (+100) and the child follows via ON UPDATE CASCADE; a keyed
    insert takes a DEFAULT column value. Enforcement is broadcast
    semi/anti joins over the (small) write batch — the stored tables never
    shuffle."""
    from neumann_spark.engine import NeumannSparkEngine

    eng = NeumannSparkEngine(spark, sf_dir)
    eng.execute("CREATE TABLE cstr_parent (id INT PRIMARY KEY)")
    eng.execute(
        "CREATE TABLE cstr_child (cid INT, pid INT, FOREIGN KEY (pid) "
        "REFERENCES cstr_parent(id) ON DELETE CASCADE ON UPDATE CASCADE)")
    eng.execute("CREATE TABLE cstr_def (id INT PRIMARY KEY, grp INT DEFAULT 7)")
    eng.execute("INSERT INTO cstr_parent VALUES (0), (1), (2), (3), (4)")
    eng.execute(
        "INSERT INTO cstr_child VALUES "
        + ", ".join(f"({i}, {i % 5})" for i in range(10)))
    try:  # duplicate PK — must reject and leave both tables untouched
        eng.execute("INSERT INTO cstr_parent VALUES (2)")
    except ValueError:
        pass
    eng.execute("UPDATE cstr_parent SET id = id + 100 WHERE id IN (1, 3)")
    eng.execute("INSERT cstr_def id=9")  # keyed insert: grp takes DEFAULT
    p = eng._tables["cstr_parent"].agg(
        F.count("*").alias("n_parents"),
        F.sum("id").alias("sum_parent_ids"),
    )
    c = eng._tables["cstr_child"].agg(
        F.count("*").alias("n_children"),
        F.sum("pid").alias("sum_child_pids"),
    )
    d = eng._tables["cstr_def"].agg(F.max("grp").alias("default_grp"))
    return p.crossJoin(c).crossJoin(d)


@register(
    "snapshot_roundtrip",
    oracle="""
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'x'), (CAST(2 AS BIGINT), 'y')
    ) t(id, tag)
    """,
)
def snapshot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAVE / LOAD snapshot round-trip (`neumann_shell/src/lib.rs:391,461`
    handle_save/handle_load over `tensor_store` save_snapshot): one engine
    writes a table and SAVEs the session as a parquet-directory snapshot;
    a FRESH engine LOADs it and serves the table. Post-save mutations are
    discarded by the load, pinning the whole-state-swap semantics. The
    result is eagerly materialized so the scratch directory can be
    deleted before return. The snapshot scratch is a Spark-visible
    warehouse dir (`scratch_dir`): SAVE/LOAD write and read it through
    Spark + the Hadoop FS API, so the round-trip holds on any master."""
    from neumann_spark.engine import NeumannSparkEngine
    from neumann_spark.session import scratch_dir

    eng = NeumannSparkEngine(spark, sf_dir)
    eng.execute("CREATE TABLE snapq_t (id INT, tag TEXT)")
    eng.execute("INSERT INTO snapq_t VALUES (1, 'x'), (2, 'y')")
    d, cleanup = scratch_dir(spark, "snapshot_")
    other = None
    try:
        eng.execute(f"SAVE '{d}'")
        eng.execute("INSERT INTO snapq_t VALUES (3, 'z')")  # must not survive
        other = NeumannSparkEngine(spark, sf_dir)
        other.execute(f"LOAD '{d}'")
        out = other.execute("SELECT id, tag FROM snapq_t ORDER BY id")
        return out.localCheckpoint(eager=True)
    finally:
        # temp views are session-global: leaving snapq_t registered over
        # the deleted dir would break any later reader of that name;
        # each cleanup step is individually suppressed: if the step under
        # test raised (e.g. LOAD ... RECOVER failed), a secondary failure
        # here must not mask the primary exception or skip the rmtree
        if other is not None:
            with contextlib.suppress(Exception):
                other.execute("DROP TABLE snapq_t")
        with contextlib.suppress(Exception):
            eng.execute("DROP TABLE snapq_t")
        with contextlib.suppress(Exception):
            cleanup()


@register(
    "snapshot_wal_recover",
    oracle="""
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'base'),
      (CAST(2 AS BIGINT), 'walled'),
      (CAST(3 AS BIGINT), 'walled')
    ) t(id, tag)
    """,
)
def snapshot_wal_recover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAL-replay recovery (`tensor_store/src/wal.rs`; durable
    open/recover `relational_engine/src/lib.rs:2148-2240`): SAVE arms a
    journal, post-save mutating commands append to it, and
    `LOAD … RECOVER` in a FRESH engine restores snapshot + replay — the
    driver hash pins that BOTH journaled inserts survive recovery while
    a plain LOAD (snapshot_roundtrip) discards them. Snapshot + journal
    scratch is Spark-visible (`scratch_dir`), as on a real master."""
    from neumann_spark.engine import NeumannSparkEngine
    from neumann_spark.session import scratch_dir

    eng = NeumannSparkEngine(spark, sf_dir)
    eng.execute("CREATE TABLE walq_t (id INT, tag TEXT)")
    eng.execute("INSERT INTO walq_t VALUES (1, 'base')")
    d, cleanup = scratch_dir(spark, "wal_")
    other = None
    try:
        eng.execute(f"SAVE '{d}'")
        eng.execute("INSERT INTO walq_t VALUES (2, 'walled')")
        eng.execute("INSERT INTO walq_t VALUES (3, 'walled')")
        other = NeumannSparkEngine(spark, sf_dir)
        res = other.execute(f"LOAD '{d}' RECOVER").collect()[0]
        assert res["replayed"] == 2, res
        out = other.execute("SELECT id, tag FROM walq_t ORDER BY id")
        return out.localCheckpoint(eager=True)
    finally:
        # each cleanup step is individually suppressed: if the step under
        # test raised (e.g. LOAD ... RECOVER failed), a secondary failure
        # here must not mask the primary exception or skip the rmtree
        if other is not None:
            with contextlib.suppress(Exception):
                other.execute("DROP TABLE walq_t")
        with contextlib.suppress(Exception):
            eng.execute("DROP TABLE walq_t")
        with contextlib.suppress(Exception):
            cleanup()


@register(
    "tx_wal_recover_abort",
    oracle="""
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'base'),
      (CAST(2 AS BIGINT), 'walled'),
      (CAST(4 AS BIGINT), 'tx')
    ) t(id, tag)
    """,
)
def tx_wal_recover_abort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAL x transaction interplay (new r8, VERDICT r7 item 6):
    `_wal_append` BUFFERS mutations inside an open transaction and only
    publishes them to the durable journal on COMMIT — so a transaction
    aborted between SAVE and the crash must leave ZERO trace in
    `LOAD … RECOVER` replay, while a committed transaction's buffered
    commands replay in full (`relational_engine/src/transaction.rs`
    durability contract; engine.py _wal_append/_exec_commit). The aborted
    block both inserts a row AND clobbers an existing one, so either a
    replayed uncommitted insert (id 3) or a replayed uncommitted update
    ('clobbered' tag on id 1) flips the driver hash; `replayed == 2`
    pins that exactly the non-tx insert and the committed-tx insert are
    journaled. Snapshot + journal scratch is Spark-visible
    (`scratch_dir`), as on a real master."""
    from neumann_spark.engine import NeumannSparkEngine
    from neumann_spark.session import scratch_dir

    eng = NeumannSparkEngine(spark, sf_dir)
    eng.execute("CREATE TABLE txwq_t (id INT, tag TEXT)")
    eng.execute("INSERT INTO txwq_t VALUES (1, 'base')")
    d, cleanup = scratch_dir(spark, "txwal_")
    other = None
    try:
        eng.execute(f"SAVE '{d}'")
        eng.execute("INSERT INTO txwq_t VALUES (2, 'walled')")
        # aborted transaction between SAVE and crash: nothing may replay
        eng.execute("BEGIN")
        eng.execute("INSERT INTO txwq_t VALUES (3, 'aborted')")
        eng.execute("UPDATE txwq_t SET tag = 'clobbered' WHERE id = 1")
        eng.execute("ROLLBACK")
        # committed transaction: its buffered commands replay in full
        eng.execute("BEGIN")
        eng.execute("INSERT INTO txwq_t VALUES (4, 'tx')")
        eng.execute("COMMIT")
        other = NeumannSparkEngine(spark, sf_dir)
        res = other.execute(f"LOAD '{d}' RECOVER").collect()[0]
        assert res["replayed"] == 2, res
        out = other.execute("SELECT id, tag FROM txwq_t ORDER BY id")
        return out.localCheckpoint(eager=True)
    finally:
        # each cleanup step is individually suppressed: if the step under
        # test raised (e.g. LOAD ... RECOVER failed), a secondary failure
        # here must not mask the primary exception or skip the rmtree
        if other is not None:
            with contextlib.suppress(Exception):
                other.execute("DROP TABLE txwq_t")
        with contextlib.suppress(Exception):
            eng.execute("DROP TABLE txwq_t")
        with contextlib.suppress(Exception):
            cleanup()


@register(
    "checkpoint_rollback",
    oracle="""
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), CAST(10 AS BIGINT)), (CAST(2 AS BIGINT), CAST(20 AS BIGINT))
    ) t(id, v)
    """,
)
def checkpoint_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECKPOINT / ROLLBACK TO (`query_router/src/lib.rs:2781-2850`
    exec_checkpoint/exec_rollback over `tensor_checkpoint`): checkpoint a
    2-row table, corrupt it (UPDATE + INSERT), roll back, and return the
    restored rows — the driver hash pins that rollback restores the exact
    pre-checkpoint state, not merely a row count."""
    from neumann_spark.engine import NeumannSparkEngine

    eng = NeumannSparkEngine(spark, sf_dir)
    eng.execute("CREATE TABLE cpq_t (id INT, v INT)")
    eng.execute("INSERT INTO cpq_t VALUES (1, 10), (2, 20)")
    eng.execute("CHECKPOINT 'clean'")
    eng.execute("UPDATE cpq_t SET v = 999")
    eng.execute("INSERT INTO cpq_t VALUES (3, 30)")
    eng.execute("ROLLBACK TO 'clean'")
    out = eng.execute("SELECT id, v FROM cpq_t ORDER BY id")
    # materialize before the session-scoped checkpoint dir can vanish,
    # then drop the session-global temp view so no later reader sees it
    out = out.localCheckpoint(eager=True)
    eng.execute("DROP TABLE cpq_t")
    return out
