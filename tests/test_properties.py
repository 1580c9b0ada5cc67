"""Property-based tests (hypothesis) — a testing layer the reference lacks
entirely (SURVEY.md §5 "no property-based testing framework"). Each property
pins an invariant the oracle comparison depends on."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # join key
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_rows)
def test_dsum_invariant_under_repartition(spark, rows):
    """Decimal-accumulated sums must be identical for ANY partitioning —
    the core determinism claim of sqlutil.dsum."""
    from neumann_spark.sqlutil import dsum

    df = spark.createDataFrame([(k, float(v)) for k, v in rows], "k int, v double")
    a = df.repartition(1).agg(dsum("v", 4).alias("s")).collect()[0]["s"]
    b = df.repartition(7, "k").agg(dsum("v", 4).alias("s")).collect()[0]["s"]
    assert a == b


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_rows)
def test_salted_join_equals_plain_join(spark, rows):
    """salted_join must be semantically identical to the plain join for any
    key distribution (including heavy skew, which the generator produces)."""
    from neumann_spark.operators.joins import salted_join

    big = spark.createDataFrame([(k, float(v)) for k, v in rows], "k int, v double")
    small = spark.createDataFrame([(k, f"d{k}") for k in range(6)], "k int, d string")
    salted = salted_join(big, small, "k", F.col("v").cast("int")).collect()
    plain = big.join(small, "k").collect()
    key = lambda r: (r["k"], r["v"], r["d"])
    assert sorted(map(key, salted)) == sorted(map(key, plain))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
        min_size=4,
        max_size=16,
    )
)
def test_cosine_bounds_and_self_similarity(spark, vec):
    """cosine ∈ [-1, 1] (modulo fp slack) and cos(v, v) = 1 for any nonzero v."""
    from neumann_spark.functions.vector import cosine_expr

    if all(abs(x) < 1e-3 for x in vec):
        return
    df = spark.createDataFrame([(vec,)], "v array<float>")
    q = F.lit([float(x) for x in vec]).cast("array<double>")
    s = df.select(cosine_expr(F.col("v"), q).alias("s")).collect()[0]["s"]
    assert abs(s - 1.0) < 1e-6


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=1, max_size=25
    )
)
def test_connected_components_partition_invariance(spark, pairs):
    """CC labels must not depend on physical partitioning of the edge list."""
    from neumann_spark.graph.algorithms import connected_components
    from neumann_spark.graph.model import undirected_edges

    nodes = spark.createDataFrame([(i,) for i in range(10)], "id bigint")
    edges = spark.createDataFrame(
        [(a, b, "e", 1.0) for a, b in pairs],
        "src bigint, dst bigint, edge_type string, weight double",
    )
    ue = undirected_edges(edges)
    a = sorted(map(tuple, connected_components(nodes, ue.repartition(1), 12).collect()))
    b = sorted(map(tuple, connected_components(nodes, ue.repartition(5), 12).collect()))
    assert a == b


_fk_pairs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),   # child id tail
        st.one_of(st.none(), st.integers(min_value=0, max_value=7)),  # pid
    ),
    min_size=0,
    max_size=15,
)
_parents = st.sets(st.integers(min_value=0, max_value=7), min_size=1, max_size=8)
_doomed = st.sets(st.integers(min_value=0, max_value=7), min_size=1, max_size=3)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(_parents, _fk_pairs, _doomed)
def test_fk_cascade_and_set_null_properties(spark, parents, pairs, doomed):
    """ON DELETE CASCADE must remove exactly the children of deleted
    parents; SET NULL must null exactly those children's pid — for ANY
    parent set / child multiset / delete set. NULL pids always survive."""
    from neumann_spark.engine import NeumannSparkEngine
    from tests.conftest import SF_DIR

    eng = NeumannSparkEngine(spark, SF_DIR)
    # children may only reference existing parents (insert validation is
    # part of the property: invalid pids must be rejected up front)
    pairs = [(i, p) for i, (i_, p) in enumerate(pairs) for _ in [0]
             if p is None or p in parents] or [(0, None)]
    eng.execute("CREATE TABLE pp (id INT)")
    eng.execute(
        "CREATE TABLE cc (cid INT, pid INT, "
        "FOREIGN KEY (pid) REFERENCES pp(id) ON DELETE CASCADE)")
    eng.execute(
        "CREATE TABLE cn (cid INT, pid INT, "
        "FOREIGN KEY (pid) REFERENCES pp(id) ON DELETE SET NULL)")
    try:
        eng.execute("INSERT INTO pp VALUES " + ", ".join(
            f"({p})" for p in sorted(parents)))
        vals = ", ".join(f"({c}, {'None' if p is None else p})" for c, p in pairs)
        eng.execute(f"INSERT INTO cc VALUES {vals}")
        eng.execute(f"INSERT INTO cn VALUES {vals}")
        eng.execute(
            "DELETE FROM pp WHERE id IN (" + ", ".join(map(str, sorted(doomed))) + ")")
        cc = {(r["cid"], r["pid"]) for r in eng.execute("SELECT * FROM cc").collect()}
        cn = {(r["cid"], r["pid"]) for r in eng.execute("SELECT * FROM cn").collect()}
        want_cc = {(c, p) for c, p in pairs if p is None or p not in doomed}
        want_cn = {(c, None if (p is not None and p in doomed) else p)
                   for c, p in pairs}
        assert cc == want_cc
        assert cn == want_cn
    finally:
        eng.execute("DROP TABLE cc")
        eng.execute("DROP TABLE cn")
        eng.execute("DROP TABLE pp")


_uq_batches = st.lists(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),                     # id
            st.one_of(st.none(), st.integers(min_value=0, max_value=4)),  # v
        ),
        min_size=1,
        max_size=5,
    ),
    min_size=1,
    max_size=5,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(_uq_batches)
def test_pk_unique_batch_properties(spark, batches):
    """For ANY insert-batch sequence: a batch is accepted iff it introduces
    no PRIMARY KEY duplicate (within itself or vs stored rows); a rejected
    batch leaves the table byte-identical (atomicity); the final table is
    exactly the union of accepted batches. UNIQUE on a nullable column
    exempts NULLs (SQL semantics)."""
    from neumann_spark.engine import NeumannSparkEngine
    from tests.conftest import SF_DIR

    eng = NeumannSparkEngine(spark, SF_DIR)
    eng.execute("CREATE TABLE uq_t (id INT PRIMARY KEY, v INT UNIQUE)")
    try:
        stored: dict[int, object] = {}
        for batch in batches:
            ids = [i for i, _ in batch]
            vs = [v for _, v in batch if v is not None]
            stored_vs = [v for v in stored.values() if v is not None]
            ok = (
                len(set(ids)) == len(ids)
                and not (set(ids) & set(stored))
                and len(set(vs)) == len(vs)
                and not (set(vs) & set(stored_vs))
            )
            vals = ", ".join(
                f"({i}, {'None' if v is None else v})" for i, v in batch)
            if ok:
                eng.execute(f"INSERT INTO uq_t VALUES {vals}")
                stored.update(dict(batch))
            else:
                import pytest as _pt

                with _pt.raises(ValueError):
                    eng.execute(f"INSERT INTO uq_t VALUES {vals}")
            got = {r["id"]: r["v"]
                   for r in eng.execute("SELECT * FROM uq_t").collect()}
            assert got == stored
    finally:
        eng.execute("DROP TABLE uq_t")


_VERB_HEADS = [
    "SELECT", "CREATE", "INSERT", "DROP", "ALTER", "SHOW", "NODE", "EDGE",
    "NEIGHBORS", "PATH", "EMBED", "SIMILAR", "FIND", "MATCH", "UPDATE",
    "DELETE", "COUNT", "ENTITY", "GRAPH", "CONSTRAINT", "BATCH", "AGGREGATE",
    "MERGE", "LIST", "PAGERANK", "LOUVAIN",
    # snapshot verbs: LOAD/ROLLBACK/CHECKPOINTS only reject or read —
    # SAVE and CHECKPOINT are excluded because a junk-but-valid operand
    # would write a real multi-directory snapshot per fuzz example
    "LOAD", "ROLLBACK", "CHECKPOINTS",
]

_fuzz_cmd = st.one_of(
    # arbitrary junk
    st.text(min_size=1, max_size=60),
    # verb head + junk tail (the shape most likely to reach deep parsing)
    st.tuples(
        st.sampled_from(_VERB_HEADS),
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd", "Po", "Ps", "Pe", "Sm"),
                whitelist_characters=" '\"(),=->:{}[]",
            ),
            max_size=50,
        ),
    ).map(lambda t: f"{t[0]} {t[1]}"),
)


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(_fuzz_cmd)
def test_engine_parser_fuzz_raises_typed_errors(spark, cmd):
    """Parser fuzzing (the reference runs 22 cargo-fuzz targets over its
    parsers — SURVEY.md §5): for ANY input, execute() either succeeds or
    raises a typed, intentional error (ValueError/KeyError, or Spark's
    own analysis errors for SQL passthrough) — never an AttributeError /
    IndexError / TypeError escaping from a half-matched regex."""
    from py4j.protocol import Py4JError

    from neumann_spark.engine import NeumannSparkEngine
    from tests.conftest import SF_DIR

    eng = NeumannSparkEngine(spark, SF_DIR)
    try:
        eng.execute(cmd)
    except (ValueError, KeyError, Py4JError) as e:
        # typed rejection (facade) or Spark analysis error (SQL passthrough)
        assert e is not None
    except Exception as e:  # noqa: BLE001
        # Spark's AnalysisException/ParseException subclasses are fine;
        # anything else is a parser crash
        mod = type(e).__module__
        assert mod.startswith("pyspark"), (
            f"parser crash on {cmd!r}: {type(e).__name__}: {e}")


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-10**9, max_value=10**9),
            st.one_of(
                st.none(),
                st.text(
                    alphabet=st.characters(
                        whitelist_categories=("Lu", "Ll", "Nd"),
                        whitelist_characters=" _-",
                    ),
                    max_size=12,
                ),
            ),
            st.one_of(
                st.none(),
                st.floats(allow_nan=False, allow_infinity=False, width=32),
            ),
        ),
        max_size=12,
    )
)
def test_snapshot_roundtrip_any_table(spark, rows):
    """SAVE → LOAD into a fresh engine is lossless for ANY table content —
    ints at bigint edges, NULLs in every column, empty tables, unicode-ish
    strings — because schemas ride in the manifest and parquet round-trips
    the values."""
    import shutil
    import tempfile

    from neumann_spark.engine import NeumannSparkEngine
    from tests.conftest import SF_DIR

    a = NeumannSparkEngine(spark, SF_DIR)
    df = spark.createDataFrame(
        [(int(i), *r) for i, r in enumerate(rows)],
        "rid int, k bigint, s string, v double",
    )
    a._tables["prop_snap_t"] = df
    df.createOrReplaceTempView("prop_snap_t")
    d = tempfile.mkdtemp(prefix="neumann_prop_snap_")
    try:
        a.execute(f"SAVE '{d}'")
        b = NeumannSparkEngine(spark, SF_DIR)
        b.execute(f"LOAD '{d}'")
        got = b.execute(
            "SELECT rid, k, s, v FROM prop_snap_t ORDER BY rid").collect()
        want = sorted(df.collect(), key=lambda r: r["rid"])
        assert [tuple(r) for r in got] == [tuple(r) for r in want]
        assert b._tables["prop_snap_t"].schema == df.schema
    finally:
        a.execute("DROP TABLE prop_snap_t")
        shutil.rmtree(d, ignore_errors=True)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.one_of(
            st.tuples(st.just("insert"), st.integers(0, 99)),
            st.tuples(st.just("checkpoint"), st.integers(0, 3)),
            st.tuples(st.just("rollback"), st.integers(0, 3)),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_checkpoint_rollback_model(spark, ops):
    """Model-based: any interleaving of insert / named-checkpoint /
    rollback must leave the table equal to a plain-Python model of the
    same sequence (checkpoint = copy state, rollback = restore copy,
    unknown rollback = error + state unchanged)."""
    from neumann_spark.engine import NeumannSparkEngine
    from tests.conftest import SF_DIR

    eng = NeumannSparkEngine(spark, SF_DIR)
    eng.execute("CREATE TABLE cpm_t (v INT)")
    model: list[int] = []
    saved: dict[str, list[int]] = {}
    try:
        for op, arg in ops:
            if op == "insert":
                eng.execute(f"INSERT INTO cpm_t VALUES ({arg})")
                model.append(arg)
            elif op == "checkpoint":
                eng.execute(f"CHECKPOINT 'm{arg}'")
                saved[f"m{arg}"] = list(model)
            else:
                name = f"m{arg}"
                if name in saved:
                    eng.execute(f"ROLLBACK TO '{name}'")
                    model = list(saved[name])
                else:
                    import pytest as _pt

                    with _pt.raises(ValueError, match="unknown checkpoint"):
                        eng.execute(f"ROLLBACK TO '{name}'")
        got = sorted(
            r["v"] for r in eng.execute("SELECT v FROM cpm_t").collect())
        assert got == sorted(model)
    finally:
        eng.execute("DROP TABLE cpm_t")


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.one_of(
            st.tuples(st.just("insert"), st.integers(0, 99)),
            st.tuples(st.just("begin"), st.just(0)),
            st.tuples(st.just("commit"), st.just(0)),
            st.tuples(st.just("rollback"), st.just(0)),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_transaction_model(spark, ops):
    """Model-based BEGIN/COMMIT/ROLLBACK: any interleaving of inserts and
    transaction verbs leaves the table equal to a plain-Python model
    (begin = fork list, commit = keep, rollback = restore fork; stray
    verbs = error + state unchanged; an open tx at the end is rolled
    back)."""
    from neumann_spark.engine import NeumannSparkEngine
    from tests.conftest import SF_DIR

    eng = NeumannSparkEngine(spark, SF_DIR)
    eng.execute("CREATE TABLE txm_t (v INT)")
    model: list[int] = []
    fork: "list[int] | None" = None
    try:
        for op, arg in ops:
            if op == "insert":
                eng.execute(f"INSERT INTO txm_t VALUES ({arg})")
                model.append(arg)
            elif op == "begin":
                if fork is None:
                    eng.execute("BEGIN")
                    fork = list(model)
                else:
                    import pytest as _pt

                    with _pt.raises(ValueError, match="already in progress"):
                        eng.execute("BEGIN")
            elif op == "commit":
                if fork is not None:
                    eng.execute("COMMIT")
                    fork = None
                else:
                    import pytest as _pt

                    with _pt.raises(ValueError, match="no transaction"):
                        eng.execute("COMMIT")
            else:
                if fork is not None:
                    eng.execute("ROLLBACK")
                    model, fork = fork, None
                else:
                    import pytest as _pt

                    with _pt.raises(ValueError, match="no transaction"):
                        eng.execute("ROLLBACK")
        if fork is not None:  # close any open tx before comparing
            eng.execute("ROLLBACK")
            model, fork = fork, None
        got = sorted(
            r["v"] for r in eng.execute("SELECT v FROM txm_t").collect())
        assert got == sorted(model)
    finally:
        if getattr(eng, "_tx_fork", None) is not None:
            eng.execute("ROLLBACK")
        eng.execute("DROP TABLE txm_t")


_merge_target = st.lists(
    st.tuples(st.integers(min_value=0, max_value=20),  # key
              st.sampled_from(["a", "b", "c"]),        # partition
              st.integers(min_value=0, max_value=99)),
    min_size=1, max_size=20, unique_by=lambda t: t[0],
)
_merge_source = st.lists(
    st.tuples(st.integers(min_value=0, max_value=25),
              st.sampled_from(["a", "b", "c"]),
              st.integers(min_value=100, max_value=199)),
    min_size=0, max_size=10, unique_by=lambda t: t[0],
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_merge_target, _merge_source)
def test_merge_into_matches_python_model(spark, tmp_path_factory, target, source):
    """merge_into_partitioned must equal the dict model upsert for any
    key/partition distribution, under the key-stability contract (a
    source row reuses the partition its key already lives in)."""
    from neumann_spark.operators.dml import merge_into_partitioned

    tdir = str(tmp_path_factory.mktemp("merge_prop"))
    spark.createDataFrame(
        [(k, p, v) for k, p, v in target], "k bigint, p string, v bigint"
    ).write.mode("overwrite").partitionBy("p").parquet(tdir)

    # enforce the documented key-stability contract in the generator's
    # output: a source key that exists in the target keeps its partition
    part_of = {k: p for k, p, _ in target}
    source = [(k, part_of.get(k, p), v) for k, p, v in source]

    model = {k: (p, v) for k, p, v in target}
    model.update({k: (p, v) for k, p, v in source})

    if source:
        merge_into_partitioned(
            spark,
            tdir,
            spark.createDataFrame(source, "k bigint, p string, v bigint"),
            keys=["k"],
            partition_col="p",
        )
    got = {
        r["k"]: (r["p"], r["v"])
        for r in spark.read.parquet(tdir).collect()
    }
    assert got == model


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=1, max_value=40),   # width
    st.integers(min_value=1, max_value=40),   # height
    st.integers(min_value=0, max_value=2**31 - 1),  # pixel seed
    st.sampled_from([0, 2, 3]),               # restart interval (0 = none)
)
def test_jpeg_roundtrip_matches_reference_for_any_shape(w, h, seed, rst):
    """For ANY image shape (including non-multiple-of-8 dims needing edge
    padding) and content, decoding our encoder's stream must reproduce the
    independent quant->dequant->IDCT reference reconstruction exactly —
    the end-to-end Huffman/zigzag/padding/restart paths have no
    shape-dependent corner cases."""
    import numpy as np

    from neumann_spark.pipeline.multimodal import (
        _JPEG_QLUM, _JPEG_ZZ, _jpeg_dct_mat, decode_jpeg_pixels, encode_jpeg)

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(img, restart_interval=rst))
    assert dec.shape == (h, w)

    T = _jpeg_dct_mat()
    q = np.array(_JPEG_QLUM, dtype=float)[np.argsort(_JPEG_ZZ)].reshape(8, 8)
    ph = -(-h // 8) * 8
    pw = -(-w // 8) * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge").astype(float)
    ref = np.zeros_like(padded)
    for by in range(ph // 8):
        for bx in range(pw // 8):
            b = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128
            c = T @ b @ T.T
            qq = np.sign(c) * np.floor(np.abs(c) / q + 0.5 + 1e-9)
            ref[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = np.clip(
                np.round(T.T @ (qq * q) @ T + 128), 0, 255)
    assert np.array_equal(dec, ref[:h, :w].astype(np.uint8))


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=1, max_value=6),    # width
    st.integers(min_value=1, max_value=5),    # height
    st.integers(min_value=1, max_value=6),    # frames
    st.integers(min_value=0, max_value=10**6),  # content seed
    st.data(),
)
def test_mp4_demux_any_layout(w, h, n, seed, data):
    """decode_mp4_frames must recover every frame byte from ANY legal
    sample-table layout: random chunk partitions of the sample list
    (multi-run stsc), per-sample vs uniform stsz, 32-bit stco vs 64-bit
    co64, and inter-chunk garbage gaps. No Spark — pure demux property."""
    import struct

    import numpy as np

    from neumann_spark.pipeline.multimodal import decode_mp4_frames

    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, w * h * 3).astype(np.uint8).tobytes()
              for _ in range(n)]
    sz = w * h * 3
    # random composition of n into chunk sizes
    chunks = []
    left = n
    while left:
        take = data.draw(st.integers(min_value=1, max_value=left))
        chunks.append(take)
        left -= take
    use_co64 = data.draw(st.booleans())
    uniform = data.draw(st.booleans())
    gap = data.draw(st.integers(min_value=0, max_value=7))

    def box(t, p):
        return struct.pack(">I", 8 + len(p)) + t + p

    def full(t, p, fl=0):
        return box(t, b"\x00" + fl.to_bytes(3, "big") + p)

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512))
    # mdat: chunks separated by `gap` junk bytes (legal — stco points at
    # absolute offsets, nothing says chunks are contiguous)
    body = bytearray()
    offs = []
    si = 0
    for c in chunks:
        body += b"\xee" * gap
        offs.append(len(ftyp) + 8 + len(body))
        for _ in range(c):
            body += frames[si]
            si += 1
    mdat = box(b"mdat", bytes(body))
    entry = (b"\x00" * 6 + struct.pack(">H", 1) + struct.pack(">HH", 0, 0)
             + b"\x00" * 12 + struct.pack(">HH", w, h)
             + struct.pack(">II", 0x480000, 0x480000)
             + struct.pack(">I", 0) + struct.pack(">H", 1) + b"\x00" * 32
             + struct.pack(">Hh", 24, -1))
    stsd = full(b"stsd", struct.pack(">I", 1) + box(b"raw ", entry))
    stts = full(b"stts", struct.pack(">III", 1, n, 1))
    # stsc runs: one entry per change in samples-per-chunk
    runs = []
    for i, c in enumerate(chunks):
        if not runs or runs[-1][1] != c:
            runs.append((i + 1, c))
    stsc = full(b"stsc", struct.pack(">I", len(runs)) + b"".join(
        struct.pack(">III", fc, spc, 1) for fc, spc in runs))
    if uniform:
        stsz = full(b"stsz", struct.pack(">II", sz, n))
    else:
        stsz = full(b"stsz", struct.pack(">II", 0, n)
                    + struct.pack(f">{n}I", *([sz] * n)))
    if use_co64:
        stco = full(b"co64", struct.pack(">I", len(offs))
                    + struct.pack(f">{len(offs)}Q", *offs))
    else:
        stco = full(b"stco", struct.pack(">I", len(offs))
                    + struct.pack(f">{len(offs)}I", *offs))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0),
                             fl=1) + stbl)
    mdia = box(b"mdia",
               full(b"mdhd", struct.pack(">IIII", 0, 0, 1000, n)
                    + struct.pack(">HH", 0x55C4, 0))
               + full(b"hdlr", struct.pack(">I", 0) + b"vide"
                      + b"\x00" * 12 + b"x\x00")
               + minf)
    moov = box(b"moov", box(b"trak", mdia))

    out = decode_mp4_frames(ftyp + mdat + moov)
    assert out.shape == (n, h, w, 3)
    for i, raw in enumerate(frames):
        assert out[i].tobytes() == raw


_doc_batch = st.lists(
    st.text(alphabet="abc ", min_size=1, max_size=20),
    min_size=0,
    max_size=12,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(base=_doc_batch, added=_doc_batch, drop_mask=st.lists(
    st.booleans(), min_size=12, max_size=12))
def test_bm25_stats_merge_equals_rebuild(spark, base, added, drop_mask):
    """Property: for ANY base corpus, insert batch, and delete subset,
    the additively-merged BM25 state (per-term df, n_docs, sum_dl)
    equals a from-scratch rebuild on the final corpus exactly — the
    invariant that lets the CDC path maintain ranking statistics without
    reindexing."""
    from neumann_spark.pipeline.fulltext import (
        bm25_stats_init,
        bm25_stats_merge,
    )

    def df_of(texts, start):
        rows = [(start + i, t) for i, t in enumerate(texts)]
        return spark.createDataFrame(
            rows or [(None, None)], "doc_id bigint, text string"
        ).filter(F.col("doc_id").isNotNull())

    base_df = df_of(base, 0)
    added_df = df_of(added, 1000)
    removed_df = base_df.filter(
        F.col("doc_id").isin(
            [i for i, d in enumerate(drop_mask[:len(base)]) if d]))
    final_df = base_df.join(
        removed_df.select("doc_id"), "doc_id", "left_anti"
    ).unionByName(added_df)

    inc_df, inc_tot, _ids = bm25_stats_merge(
        *bm25_stats_init(base_df), added_df, removed_df, seq=1)
    want_df, want_tot, _w = bm25_stats_init(final_df)
    got = {r["term"]: r["df"] for r in inc_df.collect()}
    want = {r["term"]: r["df"] for r in want_df.collect()}
    assert got == want
    g, w = inc_tot.head(), want_tot.head()
    assert g["n_docs"] == w["n_docs"] and g["sum_dl"] == w["sum_dl"]
