"""DML emulation — SURVEY.md §2.12.

The reference supports UPDATE/DELETE with a condition
(`relational_engine/src/lib.rs:3842,3954`) against its mutable slab. A batch
analytics engine over immutable parquet expresses the same semantics as
*recompute-and-replace*: UPDATE = projection with a CASE, DELETE = negated
filter; a real lakehouse deployment would land these as Delta/Iceberg MERGE
(jars not in this image — see `neumann_spark.sources`). The queries return
post-DML aggregates so the oracle can verify the transformed state.

Transactions (`relational_engine/src/transaction.rs`) are an explicit
non-goal for the batch engine (SURVEY.md §2.12).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neumann_spark.catalog import load
from neumann_spark.registry import register
from neumann_spark.sqlutil import dsum, sql_dsum
from neumann_spark.session import local_df


def update_where(df: DataFrame, cond, assignments: dict) -> DataFrame:
    """UPDATE tbl SET col=expr WHERE cond (`relational_engine/src/lib.rs:3842`)
    as an immutable projection: rows matching `cond` get the new values.

    ONE select, not chained withColumn: SQL UPDATE is simultaneous
    assignment — every SET expression AND the WHERE predicate evaluate
    against the ORIGINAL row. Chaining withColumn made later assignments
    (and cond itself) re-resolve against already-rewritten columns, so
    `SET id = id + 100, v = 0 WHERE id IN (1, 3)` silently skipped the
    second assignment and `SET a = a + 1, b = a` committed b = old_a + 1
    while the engine validated b = old_a."""
    unknown = set(assignments) - set(df.columns)
    if unknown:
        raise ValueError(f"UPDATE of unknown column(s): {sorted(unknown)}")
    return df.select(*[
        (F.when(cond, assignments[c]).otherwise(F.col(c)).alias(c)
         if c in assignments else F.col(c))
        for c in df.columns
    ])


def delete_where(df: DataFrame, cond) -> DataFrame:
    """DELETE FROM tbl WHERE cond (`relational_engine/src/lib.rs:3954`) as a
    negated filter (the reference itself uses a deletion bitmap, i.e. also
    logical deletion — `tensor_store/src/relational_slab.rs:2-13`).

    SQL three-valued logic: a row whose predicate evaluates to NULL is NOT
    deleted — a bare `filter(~cond)` would silently drop it (NULL negates
    to NULL, and filters drop non-TRUE), so survivors are rows where cond
    is anything but exactly TRUE."""
    return df.filter(~cond.eqNullSafe(F.lit(True)))


@register(
    "dml_update",
    oracle=f"""
    WITH updated AS (
      SELECT o_orderstatus,
             CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 1.1
                  ELSE o_totalprice END AS o_totalprice
      FROM orders
    )
    SELECT o_orderstatus, {sql_dsum('o_totalprice', 4)} AS sum_price, COUNT(*) AS n
    FROM updated GROUP BY o_orderstatus
    """,
)
def dml_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE … WHERE as recompute-and-replace; verified via post-state agg."""
    o = load(spark, sf_dir, "orders")
    updated = update_where(
        o,
        F.col("o_orderstatus") == "F",
        {"o_totalprice": F.col("o_totalprice") * 1.1},
    )
    return updated.groupBy("o_orderstatus").agg(
        dsum("o_totalprice", 4).alias("sum_price"), F.count("*").alias("n")
    )


@register(
    "dml_delete",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE NOT (o_orderstatus = 'P' OR o_totalprice < 2000.0)
    GROUP BY o_orderpriority
    """,
)
def dml_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE … WHERE as negated filter; verified via post-state counts."""
    o = load(spark, sf_dir, "orders")
    kept = delete_where(
        o, (F.col("o_orderstatus") == "P") | (F.col("o_totalprice") < 2000.0)
    )
    return kept.groupBy("o_orderpriority").agg(F.count("*").alias("n"))


# --- MERGE INTO over partitioned parquet ----------------------------------
# The concrete form of the "a real deployment lands this as MERGE" note
# above: an upsert against a partitioned parquet table that REWRITES ONLY
# THE TOUCHED PARTITIONS (staged write + per-partition directory swap, the
# `_save_snapshot` versioned-dir discipline applied per partition).
# Delta/Iceberg jars are absent from this image; this is the same commit
# shape those formats implement with a manifest instead of renames.


def _pruned_target_read(spark: SparkSession, target_dir: str,
                        partition_col: str, touched: list,
                        schema=None) -> DataFrame:
    """The MERGE target read: only the touched partition directories
    (static IN-list -> PartitionFilters; plan-asserted in
    tests/test_plans.py::test_merge_touched_partition_read_prunes).
    Pass the writer's `schema` when available: partition-column type
    inference would otherwise coerce numeric-looking string partition
    values ('01' -> int 1), silently merging distinct directories."""
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.parquet(target_dir).filter(
        F.col(partition_col).isin(touched))


def merge_into_partitioned(
    spark: SparkSession,
    target_dir: str,
    source: DataFrame,
    keys: list[str],
    partition_col: str,
    verify_key_stability: bool = False,
) -> list:
    """MERGE INTO target USING source ON keys — matched rows are replaced
    by the source version, unmatched source rows are inserted. Returns the
    list of touched partition values.

    CONTRACT: the partition column must be key-stable — a source row's
    partition value must equal the partition its key already lives in (if
    any). This is what makes partition-pruned merge sound: only the
    source's partitions are read, so a key that "moved" partitions would
    not be found and would end up duplicated. (Delta/Iceberg MERGE with
    partition predicates carries the same requirement; enforcing it would
    mean scanning every untouched partition, which defeats the pruning.)
    Callers who cannot guarantee the contract can pass
    `verify_key_stability=True`: the merge then pre-validates the source
    keys against a FULL key scan of the target (key + partition columns
    only — column-pruned, but every partition is listed) and raises
    BEFORE any state change if a key moved. The default stays False
    because the validation cost is exactly the untouched-partition read
    the pruned merge exists to avoid.

    Scale shape: only partitions present in the source are read (static
    partition-pruning IN-list — the scan never lists untouched partition
    dirs), merged (source rows win via an anti-join on the key), staged to
    a fresh `_stage_<nonce>` directory, and swapped in per-partition with
    directory renames. The swap is validate-all-then-commit with rollback:
    every staged partition is checked BEFORE any rename, and a failure
    mid-swap restores the already-swapped partitions, so the target is
    never left half-merged or missing a partition. Untouched partitions:
    zero bytes read, zero bytes written, files byte-identical after
    commit (asserted in tests). Every directory operation goes through
    the Hadoop FileSystem API (r12): the commit protocol must run on the
    TABLE's filesystem — driver-local os.rename would corrupt nothing
    but also rename nothing on an HDFS/S3 target; this is the same
    portability contract as the snapshot manifest publisher
    (engine._manifest_write)."""
    import uuid

    from neumann_spark.session import hadoop_fs

    touched = sorted(
        r[0] for r in source.select(partition_col).distinct().collect()
    )
    # partition values must map 1:1 onto directory names: Spark
    # percent-escapes special characters and encodes NULL as
    # __HIVE_DEFAULT_PARTITION__, which the literal rename below would
    # miss — reject rather than mis-swap
    for v in touched:
        if v is None or not re.fullmatch(r"[\w][\w.\- ]*", str(v)):
            raise ValueError(
                f"MERGE partition value {v!r} needs escaped/null directory "
                "encoding — unsupported by the rename-based commit")
    # column-set check against the target's OWN (inferred) schema — the
    # typed reads below supply source.schema, under which parquet would
    # silently project away a column mismatch instead of surfacing it
    tgt_cols = set(spark.read.parquet(target_dir).columns)
    if tgt_cols != set(source.columns):
        raise ValueError(
            f"MERGE schema mismatch: target {sorted(tgt_cols)} "
            f"vs source {sorted(source.columns)}")
    if verify_key_stability:
        # full key scan (key + partition columns only): a source key that
        # already lives in a DIFFERENT partition would silently duplicate
        # under the pruned merge — abort before any state change instead.
        # Read with the SOURCE's schema: partition-column type inference
        # would otherwise coerce numeric-looking string values ('01' ->
        # int 1), making distinct partitions compare equal and the check
        # miss exactly the move it exists to catch
        moved = (
            spark.read.schema(source.schema).parquet(target_dir)
            .select(*keys, F.col(partition_col).alias("__tgt_part"))
            .join(
                source.select(
                    *keys, F.col(partition_col).alias("__src_part")),
                keys,
            )
            .filter(F.col("__tgt_part") != F.col("__src_part"))
            .limit(1)
            .collect()
        )
        if moved:
            r = moved[0]
            raise ValueError(
                "MERGE key-stability violation: key "
                f"{[r[k] for k in keys]} lives in partition "
                f"{r['__tgt_part']!r} but the source assigns "
                f"{r['__src_part']!r} — a pruned merge would duplicate it")
    old = _pruned_target_read(
        spark, target_dir, partition_col, touched, schema=source.schema)
    survivors = old.join(
        source.select(*keys).distinct(), keys, "left_anti")
    merged = survivors.select(*source.columns).unionByName(source)

    stage = f"{target_dir.rstrip('/')}/_stage_{uuid.uuid4().hex[:12]}"
    (merged.repartition(partition_col)
     .write.partitionBy(partition_col).parquet(stage))
    fs, jvm = hadoop_fs(spark, target_dir)
    Path = jvm.org.apache.hadoop.fs.Path

    def _rename(src: str, dst: str) -> None:
        if not fs.rename(Path(src), Path(dst)):
            raise IOError(f"MERGE commit rename {src} -> {dst} failed")

    try:
        # validate EVERY staged partition before touching the target, so
        # a missing stage dir aborts with zero partitions swapped
        plan = []
        for v in touched:
            part = f"{partition_col}={v}"
            new_dir = f"{stage}/{part}"
            if not fs.isDirectory(Path(new_dir)):
                raise ValueError(f"staged partition missing: {part}")
            plan.append((new_dir, f"{target_dir.rstrip('/')}/{part}"))
        swapped = []  # (final_dir, trash_dir or None) in commit order
        try:
            for new_dir, final_dir in plan:
                # underscore prefix: Spark/Hadoop readers skip _-prefixed
                # dirs, so a crash between the two renames (or a failed
                # delete) leaves trash that is invisible to
                # spark.read.parquet(target_dir) instead of surfacing as
                # a phantom partition value ('=' must not appear in the
                # name or partition inference still parses it as a
                # conflicting partition column)
                base = final_dir.rsplit("/", 1)[-1].replace("=", "-")
                trash = (f"{target_dir.rstrip('/')}/_old_{base}"
                         f"_{uuid.uuid4().hex[:8]}")
                if fs.isDirectory(Path(final_dir)):
                    _rename(final_dir, trash)
                else:
                    trash = None
                try:
                    _rename(new_dir, final_dir)
                except BaseException:
                    if trash is not None:
                        _rename(trash, final_dir)  # restore this one
                    raise
                swapped.append((final_dir, trash))
        except BaseException:
            # roll back the partitions already swapped: put the old
            # directories back so the target is the pre-merge state
            for final_dir, trash in reversed(swapped):
                if trash is not None:
                    fs.delete(Path(final_dir), True)
                    _rename(trash, final_dir)
                else:
                    fs.delete(Path(final_dir), True)
            raise
        for _, trash in swapped:
            if trash is not None:
                fs.delete(Path(trash), True)
    finally:
        fs.delete(Path(stage), True)
    return touched


@register(
    "dml_merge_partitioned",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
    ),
    source AS (
      -- updates: 2-HIGH orders with key % 10 = 0 get price * 2
      SELECT o_orderkey, o_orderpriority,
             ROUND(o_totalprice * 2, 2) AS o_totalprice
      FROM orders
      WHERE o_orderpriority = '2-HIGH' AND o_orderkey % 10 = 0
      UNION ALL
      -- inserts: synthetic new keys into the 5-LOW partition
      SELECT 900000000 + t.i, '5-LOW', CAST(100.0 AS DECIMAL(15,2))
      FROM generate_series(1, 7) AS t(i)
    ),
    merged AS (
      SELECT * FROM target t
      WHERE NOT EXISTS (SELECT 1 FROM source s
                        WHERE s.o_orderkey = t.o_orderkey)
      UNION ALL SELECT * FROM source
    )
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM merged GROUP BY o_orderpriority
    """,
)
def dml_merge_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO over a parquet table partitioned by o_orderpriority:
    build the target once in a private temp dir, merge a source of
    updates (2-HIGH price doubles for key % 10 = 0) plus inserts (seven
    new 5-LOW keys), then aggregate the post-merge table read back from
    disk — so the hash verifies the COMMITTED state, not an in-memory
    view. Only the 2-HIGH and 5-LOW partition directories are rewritten;
    the other three are untouched on disk (unit-tested by mtime/bytes).
    The target lives under the Spark-visible warehouse scratch
    (`scratch_dir`) and the merge commits through the Hadoop FS API —
    the MERGE story holds on any master."""
    from neumann_spark.session import scratch_dir

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice")
    tdir, cleanup = scratch_dir(spark, "merge_")
    try:
        o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(tdir)
        updates = (
            o.filter((F.col("o_orderpriority") == "2-HIGH")
                     & (F.col("o_orderkey") % 10 == 0))
            .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 2, 2))
        )
        inserts = spark.range(1, 8).select(
            (F.lit(900000000) + F.col("id")).alias("o_orderkey"),
            F.lit("5-LOW").alias("o_orderpriority"),
            F.lit(100.0).cast(o.schema["o_totalprice"].dataType)
            .alias("o_totalprice"),
        )
        merge_into_partitioned(
            spark, tdir, updates.unionByName(inserts),
            keys=["o_orderkey"], partition_col="o_orderpriority")
        out = (
            spark.read.parquet(tdir)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double").alias("total"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        cleanup()


@register(
    "dml_merge_key_stability",
    oracle="""
    WITH final AS (
      SELECT * FROM (VALUES
        (1, 'A', 10), (2, 'B', 20), (3, 'A', 99), (4, 'B', 40),
        (5, 'A', 50)) t(id, part, v)
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM final) AS n_rows,
           (SELECT CAST(SUM(v) AS BIGINT) FROM final) AS v_sum,
           (SELECT STRING_AGG(CAST(id AS VARCHAR) || ':' || part || ':'
                              || CAST(v AS VARCHAR), '|' ORDER BY id)
              FROM final) AS rows_sig,
           TRUE AS moved_key_rejected
    """,
)
def dml_merge_key_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE key-stability verify mode (new r8, VERDICT r7 item 7):
    `merge_into_partitioned(verify_key_stability=True)` pre-validates the
    source keys against a column-pruned full key scan and aborts with a
    typed error BEFORE any state change when a key's partition moved.
    Sequence: a clean verified merge applies (update id 3 + insert id 5),
    then a moved-key merge (id 2 lives in partition B, source says A) must
    raise AND leave the committed table bit-for-bit at the post-clean-merge
    state — the hashed row signs the full final table contents, so either
    a silent duplicate (the moved key landing in both partitions) or a
    partial apply flips the hash."""
    from neumann_spark.session import scratch_dir

    target = local_df(spark,
        [(1, "A", 10), (2, "B", 20), (3, "A", 30), (4, "B", 40)],
        "id int, part string, v int")
    tdir, cleanup = scratch_dir(spark, "mergekey_")
    try:
        target.write.mode("overwrite").partitionBy("part").parquet(tdir)
        clean = local_df(spark,
            [(3, "A", 99), (5, "A", 50)], "id int, part string, v int")
        merge_into_partitioned(
            spark, tdir, clean, keys=["id"], partition_col="part",
            verify_key_stability=True)
        moved_rejected = False
        try:
            merge_into_partitioned(
                spark, tdir,
                local_df(spark,
                    [(2, "A", 21)], "id int, part string, v int"),
                keys=["id"], partition_col="part",
                verify_key_stability=True)
        except ValueError:
            moved_rejected = True
        final = spark.read.parquet(tdir).select("id", "part", "v")
        out = final.agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum("v").cast("bigint").alias("v_sum"),
            F.array_join(
                F.sort_array(F.collect_list(
                    F.concat_ws(":", F.col("id"), F.col("part"),
                                F.col("v")))),
                "|").alias("rows_sig"),
        ).withColumn("moved_key_rejected", F.lit(moved_rejected))
        return out.localCheckpoint(eager=True)
    finally:
        cleanup()
