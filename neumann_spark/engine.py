"""Engine facade: `NeumannSparkEngine.execute(command)` — the Spark analog of
the reference's primary entry point `QueryRouter::execute`
(`query_router/src/lib.rs:1499-1538` keyword dispatch; SURVEY.md §3.1).

A user of the reference talks to it in its command language (SQL +
NODE/EDGE/NEIGHBORS/PATH + EMBED/SIMILAR + FIND). This facade accepts that
surface and lowers every command onto the DataFrame operators in this
package — the parse is a thin keyword dispatch + regex argument pull, NOT a
re-implementation of the reference's 18k-line recursive-descent parser
(`neumann_parser/`): for SQL we hand the statement to Spark SQL, which is a
strict superset of the reference's executable SQL (SURVEY.md §2.2).

Mutating commands (CREATE TABLE / INSERT / NODE / EDGE / EMBED) maintain
session-local DataFrames layered over the parquet fixtures — the batch
analog of the reference's in-memory stores. Results cache per command text
with write invalidation (`query_router/src/lib.rs:1931-1961`); streaming
cursors map to `toLocalIterator` batches (`relational_engine/src/cursor.rs`).
"""

from __future__ import annotations

import ast
import re
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neumann_spark.catalog import TABLES, load
from neumann_spark.functions.vector import knn
from neumann_spark.graph.model import edges_df, nodes_df, undirected_edges
from neumann_spark.graph.traversal import bfs_levels


class NeumannSparkEngine:
    """Session facade over the fixture tables + mutable session overlays."""

    CACHEABLE = ("SELECT", "SIMILAR", "NEIGHBORS", "PATH", "FIND")
    WRITES = ("CREATE", "INSERT", "DROP", "NODE", "EDGE", "EMBED", "UPDATE", "DELETE")

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}
        self._tables: dict[str, DataFrame] = {}
        self._nodes = nodes_df(spark, sf_dir)
        self._edges = edges_df(spark, sf_dir)
        self._embeddings = load(spark, sf_dir, "embeddings").select(
            F.col("vec_id").cast("string").alias("key"), "embedding"
        )
        for t in TABLES:
            load(spark, sf_dir, t).createOrReplaceTempView(t)

    # -- entry point ------------------------------------------------------

    def execute(self, command: str) -> DataFrame:
        """Keyword dispatch (`query_router/src/lib.rs:1499-1538`): the first
        token routes to SQL, graph, vector, or unified handlers. Cacheable
        results memoize on command text; writes invalidate
        (`query_router/src/lib.rs:1931-1961`)."""
        cmd = command.strip()
        head = cmd.split(None, 1)[0].upper() if cmd else ""
        if head in self.WRITES:
            self._cache.clear()
        elif cmd in self._cache:
            return self._cache[cmd]

        if head in ("SELECT", "WITH"):
            out = self.spark.sql(cmd)
        elif head == "CREATE":
            out = self._exec_create(cmd)
        elif head == "INSERT":
            out = self._exec_insert(cmd)
        elif head == "DROP":
            out = self._exec_drop(cmd)
        elif head == "SHOW":
            out = self._exec_show(cmd)
        elif head == "DESCRIBE":
            out = self.spark.sql(cmd)
        elif head == "NODE":
            out = self._exec_node(cmd)
        elif head == "EDGE":
            out = self._exec_edge(cmd)
        elif head == "NEIGHBORS":
            out = self._exec_neighbors(cmd)
        elif head == "PATH":
            out = self._exec_path(cmd)
        elif head == "EMBED":
            out = self._exec_embed(cmd)
        elif head == "SIMILAR":
            out = self._exec_similar(cmd)
        elif head == "FIND":
            out = self._exec_find(cmd)
        elif head == "MATCH":
            out = self._exec_match(cmd)
        else:
            raise ValueError(f"unsupported command: {head!r}")

        if head in self.CACHEABLE:
            self._cache[cmd] = out
        return out

    def execute_streaming(self, command: str, batch_size: int = 1000) -> Iterator[list]:
        """Batch-fetch cursor over a large result
        (`relational_engine/src/cursor.rs` StreamingCursor): yields row
        batches without materializing the result on the driver."""
        it = self.execute(command).toLocalIterator()
        batch: list = []
        for row in it:
            batch.append(row)
            if len(batch) >= batch_size:
                yield batch
                batch = []
        if batch:
            yield batch

    # -- relational DDL/DML ----------------------------------------------

    def _exec_create(self, cmd: str) -> DataFrame:
        m = re.match(r"CREATE\s+TABLE\s+(\w+)\s*\((.+)\)\s*$", cmd, re.I | re.S)
        if not m:
            raise ValueError("expected CREATE TABLE name (col type, ...)")
        name, cols = m.group(1), m.group(2)
        schema = ", ".join(
            f"{c.strip().split()[0]} {self._lower_type(c.strip().split()[1])}"
            for c in cols.split(",")
        )
        df = self.spark.createDataFrame([], schema)
        self._tables[name] = df
        df.createOrReplaceTempView(name)
        return self.spark.createDataFrame([(name, "created")], "table string, status string")

    @staticmethod
    def _lower_type(t: str) -> str:
        """Parser DataTypes collapse onto engine types (SURVEY.md §1.2) —
        here onto Spark types, a superset of the reference's 6."""
        t = t.upper()
        mapping = {
            "INT": "bigint", "INTEGER": "bigint", "BIGINT": "bigint",
            "SMALLINT": "int", "FLOAT": "double", "DOUBLE": "double",
            "REAL": "double", "TEXT": "string", "VARCHAR": "string",
            "CHAR": "string", "BOOLEAN": "boolean", "BOOL": "boolean",
            "DATE": "date", "TIMESTAMP": "timestamp", "BLOB": "binary",
            "JSON": "string",
        }
        return mapping.get(re.sub(r"\(.*", "", t), "string")

    def _exec_insert(self, cmd: str) -> DataFrame:
        m = re.match(r"INSERT\s+INTO\s+(\w+)\s+VALUES\s*(.+)$", cmd, re.I | re.S)
        if not m:
            raise ValueError("expected INSERT INTO name VALUES (...), (...)")
        name = m.group(1)
        if name not in self._tables:
            raise KeyError(f"unknown session table {name!r}")
        rows = self._parse_values(m.group(2))
        new = self.spark.createDataFrame(list(rows), self._tables[name].schema)
        self._tables[name] = self._tables[name].unionAll(new)
        self._tables[name].createOrReplaceTempView(name)
        return self.spark.createDataFrame(
            [(name, len(rows))], "table string, inserted bigint"
        )

    @staticmethod
    def _parse_values(body: str) -> list[tuple]:
        """Parse a VALUES clause of literal rows with `ast.literal_eval`
        (never eval: command text is user input). Each parenthesized group
        is one row, so single-column multi-row `(1), (2)` yields two rows —
        not Python's scalar collapse of `(1)` to `1`."""
        body = body.rstrip(";").strip()
        if not (body.startswith("(") and body.endswith(")")):
            raise ValueError("expected VALUES (...), (...)")
        rows = []
        for part in re.split(r"\)\s*,\s*\(", body[1:-1]):
            try:
                # trailing comma forces a tuple even for one element
                rows.append(ast.literal_eval(f"({part},)"))
            except (ValueError, SyntaxError) as e:
                raise ValueError(f"VALUES rows must be literals: ({part})") from e
        return rows

    def _exec_drop(self, cmd: str) -> DataFrame:
        m = self._require(re.match(r"DROP\s+TABLE\s+(\w+)", cmd, re.I),
                          "DROP TABLE name")
        name = m.group(1)
        self._tables.pop(name, None)
        self.spark.catalog.dropTempView(name)
        return self.spark.createDataFrame([(name, "dropped")], "table string, status string")

    def _exec_show(self, cmd: str) -> DataFrame:
        if re.match(r"SHOW\s+TABLES", cmd, re.I):
            names = sorted(set(TABLES) | set(self._tables))
            return self.spark.createDataFrame([(n,) for n in names], "table string")
        return self.spark.sql(cmd)

    # -- graph commands ---------------------------------------------------

    @staticmethod
    def _require(m: "Optional[re.Match]", expected: str) -> "re.Match":
        """Uniform malformed-command handling: ValueError, not AttributeError
        (the reference's parser errors are typed, `neumann_parser` Err)."""
        if m is None:
            raise ValueError(f"expected {expected}")
        return m

    def _exec_node(self, cmd: str) -> DataFrame:
        m = self._require(re.match(r"NODE\s+(\d+)(?:\s+(\w+))?", cmd, re.I),
                          "NODE id [label]")
        nid, label = int(m.group(1)), m.group(2) or "node"
        new = self.spark.createDataFrame([(nid, label)], "id bigint, label string")
        self._nodes = self._nodes.unionAll(new)
        return new

    def _exec_edge(self, cmd: str) -> DataFrame:
        m = self._require(
            re.match(r"EDGE\s+(\d+)\s+(\d+)(?:\s+(\w+))?(?:\s+([\d.]+))?", cmd, re.I),
            "EDGE src dst [type] [weight]")
        src, dst = int(m.group(1)), int(m.group(2))
        etype, w = m.group(3) or "edge", float(m.group(4) or 1.0)
        new = self.spark.createDataFrame(
            [(src, dst, etype, w)], "src bigint, dst bigint, edge_type string, weight double"
        )
        self._edges = self._edges.unionAll(new)
        return new

    def _exec_neighbors(self, cmd: str) -> DataFrame:
        m = self._require(re.match(r"NEIGHBORS\s+'?(\d+)'?", cmd, re.I),
                          "NEIGHBORS id")
        nid = int(m.group(1))
        ue = undirected_edges(self._edges).filter(F.col("src") == nid)
        return ue.join(self._nodes, ue.dst == self._nodes.id).select(
            F.col("dst").alias("neighbor_id"), "label", "edge_type", "weight"
        )

    def _exec_path(self, cmd: str) -> DataFrame:
        m = self._require(
            re.match(r"PATH\s+'?(\d+)'?\s+TO\s+'?(\d+)'?(?:\s+MAX\s+(\d+))?", cmd, re.I),
            "PATH a TO b [MAX d]")
        a, b = int(m.group(1)), int(m.group(2))
        max_d = int(m.group(3) or 4)
        src = self.spark.createDataFrame([(a, a)], "source bigint, node bigint")
        levels = bfs_levels(undirected_edges(self._edges), src, max_d)
        return levels.filter(F.col("node") == b).select("node", "dist")

    # -- vector commands --------------------------------------------------

    def _exec_embed(self, cmd: str) -> DataFrame:
        m = self._require(re.match(r"EMBED\s+'?([\w:]+)'?\s+\[(.+)\]", cmd, re.I | re.S),
                          "EMBED key [v1, v2, ...]")
        key, vals = m.group(1), [float(x) for x in m.group(2).split(",")]
        # dimension enforced per store, like the reference
        # (`vector_engine/src/lib.rs:1840-1895`)
        first = self._embeddings.select(F.size("embedding").alias("d")).head()
        if first is not None and first["d"] != len(vals):
            raise ValueError(
                f"dimension mismatch: store holds {first['d']}-d vectors, "
                f"got {len(vals)}"
            )
        new = self.spark.createDataFrame([(key, vals)], "key string, embedding array<float>")
        self._embeddings = (
            self._embeddings.join(new.select("key"), "key", "left_anti").unionAll(new)
        )
        return new.select("key")

    def _exec_similar(self, cmd: str) -> DataFrame:
        m = self._require(
            re.match(
                r"SIMILAR\s+'?([\w:]+)'?\s+TOP\s+(\d+)(?:\s+CONNECTED\s+TO\s+'?(\d+)'?)?",
                cmd,
                re.I,
            ),
            "SIMILAR key TOP k [CONNECTED TO id]")
        key, k = m.group(1), int(m.group(2))
        anchor = self._embeddings.filter(F.col("key") == key).head()
        if anchor is None:
            raise KeyError(f"no embedding for key {key!r}")
        qv = [float(x) for x in anchor["embedding"]]
        base = self._embeddings.filter(F.col("key") != key)
        if m.group(3) is None:
            return knn(base, "embedding", qv, k, "cosine", id_cols=("key",))
        # SIMILAR … CONNECTED TO: restrict to ≤2-hop reachability of anchor
        conn = int(m.group(3))
        src = self.spark.createDataFrame([(conn, conn)], "source bigint, node bigint")
        reach = bfs_levels(undirected_edges(self._edges), src, 2).select("node")
        # try_cast: non-numeric session keys (e.g. 'q:1') are simply
        # unreachable rather than an ANSI cast error
        cand = base.withColumn("_nid", F.expr("try_cast(key AS BIGINT)")).join(
            reach, F.col("_nid") == reach.node, "left_semi"
        ).drop("_nid")
        return knn(cand, "embedding", qv, k, "cosine", id_cols=("key",))

    # -- Cypher subset ----------------------------------------------------

    def _exec_match(self, cmd: str) -> DataFrame:
        """Cypher-subset MATCH (parse: `neumann_parser/src/cypher.rs:15-210`;
        exec: `query_router/src/cypher.rs:47`): single-edge pattern with
        optional labels/edge type, WHERE, RETURN, LIMIT. The pattern lowers
        to an edges⋈nodes⋈nodes join (motif finding)."""
        vm = re.match(
            r"MATCH\s+\((\w+)(?::(\w+))?\)\s*-\s*\[:?(\w+)?\*(\d+)\.\.(\d+)\]\s*->"
            r"\s*\((\w+)(?::(\w+))?\)\s+RETURN\s+(.+?)(?:\s+LIMIT\s+(\d+))?\s*$",
            cmd,
            re.I | re.S,
        )
        if vm:
            return self._exec_match_varlength(vm)
        m = re.match(
            r"MATCH\s+\((\w+)(?::(\w+))?\)\s*-\s*\[:?(\w+)?\]\s*->\s*\((\w+)(?::(\w+))?\)"
            r"(?:\s+WHERE\s+(.+?))?\s+RETURN\s+(.+?)(?:\s+LIMIT\s+(\d+))?\s*$",
            cmd,
            re.I | re.S,
        )
        if not m:
            raise ValueError(
                "unsupported MATCH pattern (single directed edge, optionally "
                "variable-length `-[:T*min..max]->`)"
            )
        a, a_lbl, etype, b, b_lbl, where, ret, limit = m.groups()
        na = self._nodes.select(
            F.col("id").alias(f"{a}_id"), F.col("label").alias(f"{a}_label")
        )
        nb = self._nodes.select(
            F.col("id").alias(f"{b}_id"), F.col("label").alias(f"{b}_label")
        )
        e = self._edges
        if etype:
            e = e.filter(F.col("edge_type") == etype)
        out = (
            e.join(na, e.src == F.col(f"{a}_id"))
            .join(nb, e.dst == F.col(f"{b}_id"))
            .select(f"{a}_id", f"{a}_label", f"{b}_id", f"{b}_label", "edge_type", "weight")
        )
        if a_lbl:
            out = out.filter(F.col(f"{a}_label") == a_lbl)
        if b_lbl:
            out = out.filter(F.col(f"{b}_label") == b_lbl)
        if where:
            out = out.filter(where)
        cols = [c.strip() for c in ret.split(",")]
        proj = [f"{c}_id" if c in (a, b) else c for c in cols]
        out = out.select(*proj)
        if limit:
            out = out.limit(int(limit))
        return out

    def _exec_match_varlength(self, m) -> DataFrame:
        """Cypher variable-length pattern `(a)-[:T*min..max]->(b)`
        (`neumann_parser/src/cypher.rs` var-length `*1..5`;
        `find_variable_paths` `graph_engine/src/lib.rs:5405`): multi-source
        BFS over type-filtered directed edges, hop range filtered, endpoint
        labels applied."""
        a, a_lbl, etype, lo, hi, b, b_lbl, ret, limit = m.groups()
        lo, hi = int(lo), int(hi)
        if hi < lo or hi > 8:
            raise ValueError("variable-length bounds must satisfy min ≤ max ≤ 8")
        e = self._edges
        if etype:
            e = e.filter(F.col("edge_type") == etype)
        srcs = self._nodes
        if a_lbl:
            srcs = srcs.filter(F.col("label") == a_lbl)
        sources = srcs.select(F.col("id").alias("source"), F.col("id").alias("node"))
        levels = bfs_levels(e, sources, hi)
        out = levels.filter(
            (F.col("dist") >= lo) & (F.col("dist") <= hi)
        ).select(
            F.col("source").alias(f"{a}_id"),
            F.col("node").alias(f"{b}_id"),
            F.col("dist").alias("hops"),
        )
        if b_lbl:
            nb = self._nodes.filter(F.col("label") == b_lbl).select(
                F.col("id").alias(f"{b}_id")
            )
            out = out.join(nb, f"{b}_id", "left_semi")
        cols = [c.strip() for c in ret.split(",")]
        proj = [f"{c}_id" if c in (a, b) else c for c in cols]
        out = out.select(*proj)
        if limit:
            out = out.limit(int(limit))
        return out

    # -- unified FIND -----------------------------------------------------

    def _exec_find(self, cmd: str) -> DataFrame:
        m = self._require(
            re.match(
                r"FIND\s+(NODES|EDGES|ROWS)\s+(?:(\w+)\s+)?(?:WHERE\s+(.+))?$",
                cmd,
                re.I | re.S,
            ),
            "FIND NODES|EDGES|ROWS [table] [WHERE cond]")
        kind = m.group(1).upper()
        if kind == "NODES":
            base = self._nodes
        elif kind == "EDGES":
            base = self._edges
        else:
            base = self.spark.table(m.group(2) or "customer")
        if m.group(3):
            base = base.filter(m.group(3))
        # UnifiedItem result schema: (source, id, data) — SURVEY.md §2.11
        if kind == "NODES":
            return base.select(
                F.lit("graph").alias("source"),
                F.col("id").cast("string").alias("id"),
                F.col("label").alias("data"),
            )
        if kind == "EDGES":
            return base.select(
                F.lit("graph").alias("source"),
                F.concat_ws("->", "src", "dst").alias("id"),
                F.col("edge_type").alias("data"),
            )
        first = base.columns[0]
        return base.select(
            F.lit("relational").alias("source"),
            F.col(first).cast("string").alias("id"),
            F.to_json(F.struct(*base.columns)).alias("data"),
        )
