"""LLM-pipeline operator tests: dedup ground truth, text analysis bounds,
multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_minhash_identical_docs_collide(spark):
    """Two identical texts must share all bands; a disjoint text none."""
    from neumann_spark.functions.text import md5_int64

    docs = spark.createDataFrame(
        [
            (0, "a b c d e f g h"),
            (5, "a b c d e f g h"),
            (10, "z y x w v u t s"),
        ],
        "doc_id bigint, text string",
    )
    docs.createOrReplaceTempView("_mh_docs")
    w = F.split("text", " ")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(w) - 1),
        lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
    )
    sh = docs.select("doc_id", F.explode(bigrams).alias("sh")).distinct()
    seeds = spark.range(8).select(F.col("id").cast("int").alias("j"))
    sigs = (
        sh.crossJoin(seeds)
        .select(
            "doc_id", "j",
            md5_int64(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("sh"))).alias("h"),
        )
        .groupBy("doc_id", "j")
        .agg(F.min("h").alias("sig"))
    )
    sig_map = {(r["doc_id"], r["j"]): r["sig"] for r in sigs.collect()}
    assert all(sig_map[(0, j)] == sig_map[(5, j)] for j in range(8))
    assert any(sig_map[(0, j)] != sig_map[(10, j)] for j in range(8))


def test_quality_score_bounds(spark):
    from neumann_spark.pipeline.text_queries import text_quality_score

    rows = text_quality_score(spark, SF_DIR).collect()
    assert rows and all(0.0 <= r["quality"] <= 1.0 for r in rows)


def test_simhash_similar_docs_close(spark):
    """SimHash of near-identical word sets differs in few bits."""
    from neumann_spark.functions.text import md5_int64

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(50))),
         (2, " ".join(f"w{i}" for i in range(49)) + " zz"),
         (3, " ".join(f"q{i}" for i in range(50)))],
        "doc_id bigint, text string",
    )
    w = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    h = md5_int64(F.col("word"))
    sums = w.groupBy("doc_id").agg(
        *[
            F.sum(F.when(h.bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)).alias(f"s{b}")
            for b in range(16)
        ]
    )
    sim = None
    for b in range(16):
        t = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = t if sim is None else sim + t
    vals = {r["doc_id"]: r["sh"] for r in sums.select("doc_id", sim.alias("sh")).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(vals[1], vals[2]) <= ham(vals[1], vals[3])


def test_multimodal_decode_errors_are_typed():
    """Every format decodes for real now; malformed payloads and unknown
    types surface as typed parse errors (no NotImplementedError left)."""
    from neumann_spark.pipeline.multimodal import decode_media

    with pytest.raises(ValueError, match="JPEG"):
        decode_media(b"\xff\xd8\xff\xd9", "image/jpeg")
    with pytest.raises(ValueError, match="not a PNG"):
        decode_media(b"\x89PNG", "image/png")
    with pytest.raises(ValueError, match="unknown media type"):
        decode_media(b"", "application/octet-stream")


def test_multimodal_feature_plumbing(spark):
    """mapInPandas path: schema contract holds, features normalized."""
    from neumann_spark.pipeline.multimodal import extract_features, media_df, FEATURE_DIM

    feats = extract_features(media_df(spark, SF_DIR).limit(20)).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r["feature"]) == FEATURE_DIM
        assert abs(sum(r["feature"]) - 1.0) < 1e-3


def test_lsh_same_vector_same_bucket(spark):
    from neumann_spark.pipeline.ann import lsh_bucket_expr

    df = spark.createDataFrame(
        [(1, [float(i) for i in range(64)]), (2, [float(i) for i in range(64)])],
        "id int, v array<float>",
    )
    rows = df.select("id", lsh_bucket_expr(F.col("v")).alias("b")).collect()
    assert rows[0]["b"] == rows[1]["b"]


def test_minhash_single_pass_sigs_match_exploded_form(spark):
    """The r13 single-groupBy signature stage (8 parallel MIN aggregates
    over the raw shingle stream) must be bit-equal to the old exploded
    form (distinct shingles x seed crossJoin x per-(doc, seed) MIN) on
    the fixture corpus — the rewrite may only change the plan shape."""
    from neumann_spark.functions.text import md5_int64
    from neumann_spark.pipeline.dedup import _seed_constants, _shingles

    sh_old = _shingles(spark, SF_DIR).select(
        "doc_id", md5_int64(F.col("sh")).alias("h")
    )
    seeds = spark.createDataFrame(
        list(enumerate(_seed_constants())), "j int, c bigint"
    )
    old = {
        (r["doc_id"], r["j"]): r["sig"]
        for r in (
            sh_old.crossJoin(F.broadcast(seeds))
            .groupBy("doc_id", "j")
            .agg(F.min(F.col("h").bitwiseXOR(F.col("c"))).alias("sig"))
            .collect()
        )
    }
    sh_new = _shingles(spark, SF_DIR, distinct=False).select(
        "doc_id", md5_int64(F.col("sh")).alias("h")
    )
    new_rows = sh_new.groupBy("doc_id").agg(
        *[
            F.min(F.col("h").bitwiseXOR(F.lit(c))).alias(f"s{j}")
            for j, c in enumerate(_seed_constants())
        ]
    ).collect()
    assert new_rows
    for r in new_rows:
        for j in range(len(_seed_constants())):
            assert r[f"s{j}"] == old[(r["doc_id"], j)]


def test_cluster_canonical_invariants(spark):
    """Every cluster keeps exactly one canonical (min-id) doc and its id is
    a member: cluster_id must appear among the pair endpoints, and n_docs
    >= 2 (singletons never enter the pair graph)."""
    from neumann_spark.pipeline.dedup import (
        dedup_cluster_canonical,
        dedup_minhash_lsh,
    )

    pairs = dedup_minhash_lsh(spark, SF_DIR).collect()
    members = {r.id_a for r in pairs} | {r.id_b for r in pairs}
    clusters = dedup_cluster_canonical(spark, SF_DIR).collect()
    assert sum(r.n_docs for r in clusters) == len(members)
    for r in clusters:
        assert r.n_docs >= 2
        assert r.cluster_id in members
        assert r.n_removed == r.n_docs - 1


def test_sequence_packing_conserves_tokens(spark):
    """Chunk token totals must sum to the corpus token total per source."""
    from neumann_spark.pipeline.curation import pipeline_sequence_packing
    from neumann_spark.catalog import load
    from pyspark.sql import functions as F

    packed = pipeline_sequence_packing(spark, SF_DIR)
    per_source = {
        r.source: r.total
        for r in packed.groupBy("source")
        .agg(F.sum("n_tokens").alias("total"))
        .collect()
    }
    d = load(spark, SF_DIR, "documents")
    truth = {
        r.source: r.total
        for r in d.groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).alias("total"))
        .collect()
    }
    assert per_source == truth


def test_stratified_sample_exact_k(spark):
    from neumann_spark.pipeline.curation import STRAT_K, pipeline_stratified_sample

    rows = pipeline_stratified_sample(spark, SF_DIR).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, set()).add(r.doc_id)
    for src, ids in by_src.items():
        assert len(ids) == STRAT_K, src


def test_semdedup_partitions_every_vector(spark):
    """SemDeDup accounting: every embedding lands in exactly one cluster,
    kept + removed = cluster size, and a removed vector always has a
    smaller-id witness above the threshold in ITS OWN cluster."""
    from neumann_spark.catalog import load
    from neumann_spark.functions.vector import cosine_expr
    from neumann_spark.pipeline.ann import ivf_index
    from neumann_spark.pipeline.dedup import SEMDEDUP_TAU, dedup_semantic_semdedup

    stats = dedup_semantic_semdedup(spark, SF_DIR).collect()
    n_emb = load(spark, SF_DIR, "embeddings").count()
    assert sum(r["n_vectors"] for r in stats) == n_emb
    assert all(r["n_kept"] + r["n_removed"] == r["n_vectors"] for r in stats)
    assert all(r["n_kept"] >= 1 for r in stats)  # one survivor per ball chain

    # witness check on one cluster: recompute removals independently
    state, _ = ivf_index(spark, SF_DIR)
    emb = load(spark, SF_DIR, "embeddings").join(
        state.select("vec_id", "cluster"), "vec_id")
    one = emb.filter(F.col("cluster") == stats[0]["cluster"])
    a = one.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = one.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("ia") < F.col("ib")).filter(
        F.round(cosine_expr(F.col("va"), F.col("vb")), 6) > SEMDEDUP_TAU)
    n_removed = pairs.select("ib").distinct().count()
    assert n_removed == stats[0]["n_removed"]


def test_media_codecs_roundtrip_and_dispatch():
    """WAV/BMP encode->decode inverts exactly, and the parsers handle
    files we did NOT generate (a top-down BMP with negative height, a
    stereo 16-bit WAV from the stdlib writer)."""
    import io
    import struct
    import wave

    import pytest as _pt

    from neumann_spark.pipeline.multimodal import (
        _bmp_shape,
        _wav_shape,
        decode_bmp,
        decode_media,
        decode_wav,
        encode_bmp,
        encode_wav,
    )

    for d in (0, 7, 42, 1001):
        n, p = _wav_shape(d)
        assert decode_wav(encode_wav(d))[:2] == (n, 8000)
        w, h = _bmp_shape(d)
        assert decode_bmp(encode_bmp(d))[:2] == (w, h)
        # dispatch: wav/bmp real; mp4 routes to box-level metadata
        assert decode_media(encode_wav(d), "audio/wav")[0] == n
        assert decode_media(encode_bmp(d), "image/bmp")[0] == w
    from neumann_spark.pipeline.multimodal import _mp4_shape, encode_mp4_shell

    ts, dur = _mp4_shape(3)
    assert decode_media(encode_mp4_shell(3), "video/mp4") == (ts, dur, 0.0)
    with _pt.raises(ValueError, match="no mvhd"):
        decode_media(b"\x00\x00\x00\x10ftypisomisom", "video/mp4")

    # foreign stereo 16-bit WAV (not our generator's shape)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(2)
        wv.setsampwidth(2)
        wv.setframerate(44100)
        wv.writeframes(b"\x01\x02\x03\x04" * 10)
    n, rate, _ = decode_wav(buf.getvalue())
    assert (n, rate) == (10, 44100)

    # foreign PNG exercising ALL five filter types: take known pixel rows,
    # forward-filter them per the spec, and require decode to invert them
    import zlib

    from neumann_spark.pipeline.multimodal import _png_chunk, decode_png

    wpx, bpp = 3, 3
    pixel_rows = [bytes(range(9)), bytes(range(50, 59)),
                  bytes(range(100, 109)), bytes(range(7, 16)),
                  bytes(range(200, 209))]

    def fwd(f, cur, prev):
        out = bytearray([f])
        for i, v in enumerate(cur):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i] if prev else 0
            c = (prev[i - bpp] if i >= bpp else 0) if prev else 0
            if f == 0: pred = 0
            elif f == 1: pred = a
            elif f == 2: pred = b
            elif f == 3: pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((v - pred) & 0xFF)
        return bytes(out)

    raw = b"".join(
        fwd(f, row, pixel_rows[j - 1] if j else None)
        for j, (f, row) in enumerate(zip([0, 1, 2, 3, 4], pixel_rows)))
    ihdr = struct.pack(">IIBBBBB", wpx, len(pixel_rows), 8, 2, 0, 0, 0)
    foreign = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(raw))
               + _png_chunk(b"IEND", b""))
    w, h, mean = decode_png(foreign)
    exp = sum(sum(r) for r in pixel_rows) / (wpx * bpp * len(pixel_rows))
    assert (w, h) == (wpx, len(pixel_rows)) and abs(mean - exp) < 1e-9

    # foreign top-down BMP (negative height) with one padded 1-px row
    wpx, hpx = 1, 2
    row_size = 4  # 3 bytes pixel + 1 pad
    pixels = bytes([10, 20, 30, 0]) + bytes([40, 50, 60, 0])
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, wpx, -hpx, 1, 24, 0,
                       len(pixels), 0, 0, 0, 0)
    w, h, mean = decode_bmp(header + info + pixels)
    assert (w, h) == (1, 2)
    assert abs(mean - (10 + 20 + 30 + 40 + 50 + 60) / 6) < 1e-9


def test_multimodal_real_decode_sparkside(spark):
    """The distributed decode stage: every non-mp4 encoded row decodes,
    and per-row dims match the deterministic shapes."""
    from neumann_spark.pipeline.multimodal import (
        _bmp_shape,
        _wav_shape,
        encoded_media_df,
        multimodal_real_decode,
    )

    enc_n = encoded_media_df(spark, SF_DIR).count()
    rows = multimodal_real_decode(spark, SF_DIR).collect()
    assert len(rows) == enc_n
    assert {r["media_type"] for r in rows} == {
        "audio/wav", "image/bmp", "image/png", "video/mp4", "image/jpeg"}
    from neumann_spark.pipeline.multimodal import (
        _jpeg_shape, _mp4_shape, _png_shape)

    for r in rows[:40]:
        if r["media_type"] == "audio/wav":
            assert r["dim_a"] == _wav_shape(r["doc_id"])[0]
            assert r["dim_b"] == 8000
        elif r["media_type"] == "image/bmp":
            assert (r["dim_a"], r["dim_b"]) == _bmp_shape(r["doc_id"])
        elif r["media_type"] == "image/png":
            assert (r["dim_a"], r["dim_b"]) == _png_shape(r["doc_id"])
        elif r["media_type"] == "image/jpeg":
            assert (r["dim_a"], r["dim_b"]) == _jpeg_shape(r["doc_id"])
        else:
            assert (r["dim_a"], r["dim_b"]) == _mp4_shape(r["doc_id"])


def test_mp4_metadata_parse_v0_and_v1():
    """ISO-BMFF metadata: our v0 shell round-trips, and a foreign
    version-1 mvhd (64-bit times) from another writer parses too."""
    import struct

    import pytest as _pt

    from neumann_spark.pipeline.multimodal import (
        _mp4_shape,
        decode_mp4_metadata,
        encode_mp4_shell,
    )

    for d in (0, 3, 103, 4999):
        assert decode_mp4_metadata(encode_mp4_shell(d)) == _mp4_shape(d)

    def box(t, p):
        return struct.pack(">I", 8 + len(p)) + t + p

    mvhd1 = (b"\x01\x00\x00\x00" + struct.pack(">QQ", 0, 0)
             + struct.pack(">I", 90000) + struct.pack(">Q", 123456)
             + b"\x00" * 80)
    blob = box(b"ftyp", b"isom") + box(b"moov", box(b"mvhd", mvhd1))
    assert decode_mp4_metadata(blob) == (90000, 123456)

    with _pt.raises(ValueError, match="no mvhd"):
        decode_mp4_metadata(box(b"ftyp", b"isom"))
    with _pt.raises(ValueError, match="malformed"):
        decode_mp4_metadata(b"\x00\x00\x00\x02mooo")  # size 2 < header 8

    # non-faststart layout: a size=1 (64-bit largesize) mdat BEFORE moov,
    # and a size=0 (to-end-of-file) trailing box — both valid ISO-BMFF
    mvhd0 = (b"\x00" * 4 + struct.pack(">II", 0, 0)
             + struct.pack(">II", 600, 4242) + b"\x00" * 80)
    big_mdat = (struct.pack(">I", 1) + b"mdat"
                + struct.pack(">Q", 16 + 4) + b"\x00" * 4)
    moov_payload = box(b"mvhd", mvhd0)
    trailing_moov = struct.pack(">I", 0) + b"moov" + moov_payload
    assert decode_mp4_metadata(
        box(b"ftyp", b"isom") + big_mdat + trailing_moov) == (600, 4242)


def test_documents_ascii_assumption_for_byte_fold_oracle(spark):
    """The multimodal_features oracle equates ord(char) with the UTF-8
    byte and caps the per-doc fold at 100000 chars — both hold only while
    the corpus is pure ASCII and shorter than the cap. If a regenerated
    fixture breaks either, fail HERE with a pointed message instead of a
    mysterious hash mismatch in selfcheck."""
    from neumann_spark.catalog import load

    d = load(spark, SF_DIR, "documents")
    bad = d.filter(
        (F.octet_length(F.encode("text", "UTF-8")) != F.length("text"))
        | (F.length("text") > 100000)
    ).count()
    assert bad == 0, (
        "documents corpus is no longer pure ASCII under 100000 chars — "
        "rewrite the multimodal_features oracle's byte fold (ord(char) != "
        "utf-8 byte for non-ASCII)")


def test_jpeg_flat_block_closed_form():
    """The generator's flat-block grayscale JPEGs decode to EXACTLY the
    closed-form lossy round-trip the SQL oracle computes:
    recon = clip(2*round_half_away((g-128)/2) + 128)."""
    import math

    from neumann_spark.pipeline.multimodal import (
        _jpeg_block_gray, _jpeg_shape, decode_jpeg, encode_jpeg_doc)

    for doc_id in (0, 5, 20, 100, 995, 4660):
        w, h, mean = decode_jpeg(encode_jpeg_doc(doc_id))
        assert (w, h) == _jpeg_shape(doc_id)
        vals = []
        for by in range(h // 8):
            for bx in range(w // 8):
                g = _jpeg_block_gray(doc_id, bx, by)
                x = (g - 128) / 2.0
                q = math.floor(abs(x) + 0.5) * (1 if x >= 0 else -1)
                vals.append(min(255, max(0, 2 * q + 128)))
        assert abs(mean - sum(vals) / len(vals)) < 1e-9


def test_jpeg_nonflat_matches_reference_reconstruction():
    """Full AC-coefficient path (Huffman run/size, zigzag, dequant, IDCT):
    decoding our encoder's stream reproduces an independently computed
    quant->dequant->IDCT reference bit-for-bit on a random image."""
    import numpy as np

    from neumann_spark.pipeline.multimodal import (
        _JPEG_QLUM, _JPEG_ZZ, _jpeg_dct_mat, decode_jpeg_pixels, encode_jpeg)

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 16), dtype=np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(img))
    T = _jpeg_dct_mat()
    q = np.array(_JPEG_QLUM, dtype=float)[np.argsort(_JPEG_ZZ)].reshape(8, 8)
    ref = np.zeros_like(img, dtype=float)
    for by in range(3):
        for bx in range(2):
            b = img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8].astype(float) - 128
            qq = np.sign(T @ b @ T.T) * np.floor(
                np.abs(T @ b @ T.T) / q + 0.5 + 1e-9)
            ref[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = np.clip(
                np.round(T.T @ (qq * q) @ T + 128), 0, 255)
    assert np.array_equal(dec, ref.astype(np.uint8))
    # restart markers: same stream content, segmented — identical decode
    dec_rst = decode_jpeg_pixels(encode_jpeg(img, restart_interval=2))
    assert np.array_equal(dec_rst, ref.astype(np.uint8))


def test_jpeg_color_and_subsampling_roundtrip():
    """YCbCr 4:4:4 and 4:2:0 streams (multi-component MCUs, chroma
    upsampling, color transform) decode close to the original on a smooth
    gradient, and odd (non-multiple-of-8) dims pad/crop correctly."""
    import numpy as np

    from neumann_spark.pipeline.multimodal import (
        decode_jpeg, decode_jpeg_pixels, encode_jpeg)

    yy, xx = np.mgrid[0:32, 0:24]
    rgb = np.stack([(xx * 3 + yy) % 200 + 20, (xx + yy * 2) % 180 + 40,
                    (xx * 2 + yy * 2) % 160 + 50], axis=-1).astype(np.uint8)
    for subsample, tol in ((False, 12), (True, 16)):
        dec = decode_jpeg_pixels(encode_jpeg(rgb, subsample=subsample))
        assert dec.shape == rgb.shape
        assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= tol

    img2 = np.random.default_rng(3).integers(0, 256, (13, 11), dtype=np.uint8)
    w, h, _ = decode_jpeg(encode_jpeg(img2))
    assert (w, h) == (11, 13)


def test_jpeg_rejects_nonbaseline():
    """Progressive (SOF2) streams raise with the documented reason; junk
    raises the not-a-JPEG error."""
    from neumann_spark.pipeline.multimodal import decode_jpeg

    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x01\x02")
    import struct

    sof2 = (b"\xff\xd8" + struct.pack(">HH", 0xFFC2, 11)
            + struct.pack(">BHHB", 8, 8, 8, 1) + b"\x01\x11\x00")
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(sof2)


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: markers may be preceded by 0xFF fill bytes — a
    conformant foreign stream with fill padding must decode identically."""
    import numpy as np

    from neumann_spark.pipeline.multimodal import (
        decode_jpeg_pixels, encode_jpeg)

    img = np.random.default_rng(11).integers(0, 256, (16, 16), dtype=np.uint8)
    blob = encode_jpeg(img)
    # insert a run of fill bytes before the SOF0 marker
    sof = blob.index(b"\xff\xc0")
    padded = blob[:sof] + b"\xff\xff\xff" + blob[sof:]
    assert np.array_equal(decode_jpeg_pixels(padded), decode_jpeg_pixels(blob))


def test_dhash_near_dup_property():
    """dHash locality: an image with one slightly brightened pixel stays
    within a few Hamming bits of the original; an unrelated gradient is
    far. This is what makes the hash a valid dedup blocking key."""
    import numpy as np

    from neumann_spark.pipeline.multimodal import dhash_bits

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    rng = np.random.default_rng(5)
    base = rng.integers(0, 700, (32, 40)).astype(np.int64)
    tweaked = base.copy()
    tweaked[3, 5] += 4  # sub-quantization-step brightness nudge
    flipped = base[::-1, ::-1].copy()
    h0, h1, h2 = dhash_bits(base), dhash_bits(tweaked), dhash_bits(flipped)
    assert ham(h0, h1) <= 4
    assert ham(h0, h2) > 10


def test_dhash_spark_matches_local(spark):
    """The distributed stage reproduces the local hash for every decoded
    image row (one Arrow round-trip, no silent dtype truncation)."""
    from neumann_spark.pipeline.multimodal import (
        _image_luma,
        dhash_bits,
        encode_bmp,
        encode_jpeg_doc,
        encode_png,
        multimodal_image_dhash,
    )

    rows = multimodal_image_dhash(spark, SF_DIR).collect()
    assert rows
    enc = {"image/bmp": encode_bmp, "image/png": encode_png,
           "image/jpeg": encode_jpeg_doc}
    for r in rows[:15]:
        blob = enc[r["media_type"]](r["doc_id"])
        hi, lo = dhash_bits(_image_luma(blob, r["media_type"]))
        assert (r["dhash_hi"], r["dhash_lo"]) == (hi, lo)


def _make_png(w, h, ctype, rows):
    """Minimal non-interlaced 8-bit PNG from raw per-row sample bytes."""
    import struct
    import zlib

    from neumann_spark.pipeline.multimodal import _PNG_SIG, _png_chunk

    raw = b"".join(b"\x00" + bytes(r) for r in rows)  # filter None
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b""))


def test_image_luma_png_gray_and_rgba():
    """_image_luma must honor the PNG's actual samples-per-pixel:
    grayscale (1/px) scales by 3, gray+alpha (2/px) and RGBA (4/px) drop
    alpha — none may be misread as packed RGB triples."""
    import numpy as np

    from neumann_spark.pipeline.multimodal import _image_luma

    g = [[10, 20, 30, 40], [50, 60, 70, 80]]
    luma = _image_luma(_make_png(4, 2, 0, g), "image/png")
    assert luma.shape == (2, 4)
    assert (luma == 3 * np.array(g)).all()

    ga = [[10, 255, 20, 0], [30, 128, 40, 7]]  # (gray, alpha) pairs
    luma = _image_luma(_make_png(2, 2, 4, ga), "image/png")
    assert luma.shape == (2, 2)
    assert (luma == 3 * np.array([[10, 20], [30, 40]])).all()

    rgba = [[1, 2, 3, 255, 4, 5, 6, 0], [7, 8, 9, 9, 10, 11, 12, 1]]
    luma = _image_luma(_make_png(2, 2, 6, rgba), "image/png")
    assert luma.shape == (2, 2)
    assert (luma == np.array([[6, 15], [24, 33]])).all()

    rgb = [[100, 110, 120, 130, 140, 150]]
    luma = _image_luma(_make_png(2, 1, 2, rgb), "image/png")
    assert (luma == np.array([[330, 420]])).all()


def test_mp4_raw_roundtrip():
    """encode_mp4_raw → decode_mp4_frames reproduces every frame byte,
    and the mvhd metadata parses unchanged; a metadata shell (no video
    track) returns None rather than fake frames."""
    from neumann_spark.pipeline.multimodal import (
        _mp4_frame,
        _mp4_shape,
        _mp4_video_shape,
        decode_mp4_frames,
        decode_mp4_metadata,
        encode_mp4_raw,
        encode_mp4_shell,
    )

    for doc_id in [0, 15, 40, 123, 9997]:
        blob = encode_mp4_raw(doc_id)
        fr = decode_mp4_frames(blob)
        w, h, n = _mp4_video_shape(doc_id)
        assert fr.shape == (n, h, w, 3)
        for f in range(n):
            assert (fr[f] == _mp4_frame(doc_id, f, w, h)).all()
        assert decode_mp4_metadata(blob) == _mp4_shape(doc_id)
    assert decode_mp4_frames(encode_mp4_shell(7)) is None


def _foreign_mp4(fmt=b"raw "):
    """An MP4 exercising layouts OUR encoder never writes: co64 64-bit
    chunk offsets, per-sample (non-uniform-field) stsz, and a 2-run stsc
    mapping 3 samples into 2 chunks."""
    import struct

    def box(t, p):
        return struct.pack(">I", 8 + len(p)) + t + p

    def full(t, p, fl=0):
        return box(t, b"\x00" + fl.to_bytes(3, "big") + p)

    w = h = 2
    frames = [bytes(range(12)), bytes(range(12, 24)), bytes(range(24, 36))]
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512))
    mdat = box(b"mdat", b"".join(frames))
    off1 = len(ftyp) + 8
    off2 = off1 + 24
    entry = (b"\x00" * 6 + struct.pack(">H", 1) + struct.pack(">HH", 0, 0)
             + b"\x00" * 12 + struct.pack(">HH", w, h)
             + struct.pack(">II", 0x480000, 0x480000)
             + struct.pack(">I", 0) + struct.pack(">H", 1) + b"\x00" * 32
             + struct.pack(">Hh", 24, -1))
    stbl = box(b"stbl",
               full(b"stsd", struct.pack(">I", 1) + box(fmt, entry))
               + full(b"stts", struct.pack(">III", 1, 3, 1))
               + full(b"stsc", struct.pack(">I", 2)
                      + struct.pack(">III", 1, 2, 1)
                      + struct.pack(">III", 2, 1, 1))
               + full(b"stsz", struct.pack(">II", 0, 3)
                      + struct.pack(">III", 12, 12, 12))
               + full(b"co64", struct.pack(">I", 1 + 1)
                      + struct.pack(">QQ", off1, off2)))
    minf = box(b"minf", full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0),
                             fl=1) + stbl)
    mdia = box(b"mdia",
               full(b"mdhd", struct.pack(">IIII", 0, 0, 1000, 3)
                    + struct.pack(">HH", 0x55C4, 0))
               + full(b"hdlr", struct.pack(">I", 0) + b"vide"
                      + b"\x00" * 12 + b"x\x00")
               + minf)
    moov = box(b"moov", box(b"trak", mdia))
    return ftyp + mdat + moov, frames


def test_mp4_foreign_layouts():
    """The demuxer reads files from other writers: 64-bit co64 offsets,
    per-sample stsz table, multi-run stsc chunk mapping."""
    from neumann_spark.pipeline.multimodal import decode_mp4_frames

    payload, frames = _foreign_mp4()
    fr = decode_mp4_frames(payload)
    assert fr.shape == (3, 2, 2, 3)
    for i, raw in enumerate(frames):
        assert fr[i].tobytes() == raw


def test_mp4_compressed_codec_refused():
    import pytest as _pt

    from neumann_spark.pipeline.multimodal import decode_mp4_frames

    payload, _ = _foreign_mp4(fmt=b"avc1")
    with _pt.raises(ValueError, match="ffmpeg"):
        decode_mp4_frames(payload)


def test_jpeg_multiscan_rejected():
    """A non-interleaved multi-scan baseline JPEG (first scan covers one
    of three frame components) must raise, not silently decode as a
    grayscale plane of component 1."""
    import struct

    import pytest as _pt

    from neumann_spark.pipeline.multimodal import decode_jpeg_pixels

    sof_body = struct.pack(">BHHB", 8, 8, 8, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
    sos_body = bytes([1, 1, 0x00, 0, 63, 0])  # ns=1: component 1 only
    payload = (b"\xff\xd8"
               + b"\xff\xc0" + struct.pack(">H", len(sof_body) + 2) + sof_body
               + b"\xff\xda" + struct.pack(">H", len(sos_body) + 2) + sos_body
               + b"\xff\xd9")
    with _pt.raises(ValueError, match="multi-scan"):
        decode_jpeg_pixels(payload)


def test_bm25_stats_incremental_merge(spark):
    """The additively-maintained BM25 corpus state (per-term df, n_docs,
    sum_dl) after a CDC batch of inserts+deletes must equal a
    from-scratch rebuild on the final corpus EXACTLY — counts decompose
    additively, so any mismatch is a merge bug, not float noise. Since
    the registered BM25 surface derives its score from exactly these
    statistics, stats equality pins score equality too."""
    from neumann_spark.catalog import load
    from neumann_spark.pipeline.fulltext import (
        bm25_stats_init,
        bm25_stats_merge,
    )
    from tests.conftest import SF_DIR

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    added = docs.filter(F.col("doc_id") % 5 == 0)      # CDC inserts
    removed = base.filter(F.col("doc_id") % 7 == 0)    # CDC deletes ⊂ base
    final = docs.filter(
        (F.col("doc_id") % 5 == 0)
        | ((F.col("doc_id") % 5 != 0) & (F.col("doc_id") % 7 != 0)))

    inc_df, inc_tot, inc_st = bm25_stats_merge(
        *bm25_stats_init(base), added, removed, seq=1)
    want_df, want_tot, want_st = bm25_stats_init(final)

    got = {r["term"]: r["df"] for r in inc_df.collect()}
    want = {r["term"]: r["df"] for r in want_df.collect()}
    assert got == want
    g, w = inc_tot.head(), want_tot.head()
    assert g["n_docs"] == w["n_docs"]
    assert g["sum_dl"] == w["sum_dl"]
    # derived avgdl feeds the score; equal numerators/denominators
    assert g["sum_dl"] / g["n_docs"] == w["sum_dl"] / w["n_docs"]
    ids = lambda df: {  # noqa: E731  — LIVE members (tombstones stay)
        r["doc_id"] for r in df.filter(F.col("alive")).collect()}
    assert ids(inc_st) == ids(want_st)

    # REDELIVERY: re-applying the same batch (same seq) must be a no-op
    # (the at-least-once foreachBatch contract the graph CDC path pins)
    re_df, re_tot, re_st = bm25_stats_merge(
        inc_df, inc_tot, inc_st, added, removed, seq=1)
    assert {r["term"]: r["df"] for r in re_df.collect()} == want
    r2 = re_tot.head()
    assert r2["n_docs"] == w["n_docs"] and r2["sum_dl"] == w["sum_dl"]
    assert ids(re_st) == ids(want_st)

    # within-batch DUPLICATE inserts collapse to one (at-least-once
    # sources can emit the same change twice inside a batch)
    dup = added.unionByName(added)
    d_df, d_tot, d_st = bm25_stats_merge(
        *bm25_stats_init(base), dup, removed, seq=1)
    assert {r["term"]: r["df"] for r in d_df.collect()} == want
    d2 = d_tot.head()
    assert d2["n_docs"] == w["n_docs"] and d2["sum_dl"] == w["sum_dl"]

    # a same-batch UPDATE (one doc_id in both legs) must be rejected
    # loudly — aggregate state cannot apply it redelivery-safely
    import pytest

    upd = base.limit(1)
    with pytest.raises(Exception, match="both added and removed"):
        bm25_stats_merge(*bm25_stats_init(base), upd, upd, seq=2)


def test_bm25_stats_churn_redelivery_versioned(spark):
    """ADVICE r9 regression: delete a doc (batch 1), RE-INSERT it with
    DIFFERENT text (batch 2), then redeliver the ORIGINAL delete batch.
    Under the r9 membership-only guard the redelivered delete passed
    (the doc is a member again) and un-indexed the STALE tombstone text
    — silent per-term df corruption. The r10 versioned state drops it
    (the redelivered batch's seq=1 is below the doc's current ver=2);
    stats must equal a from-scratch rebuild of the final corpus, and a
    LATER legitimate delete (seq=3) must still apply."""
    from neumann_spark.pipeline.fulltext import (
        bm25_stats_init,
        bm25_stats_merge,
    )

    base = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta delta"), (3, "gamma gamma")],
        "doc_id bigint, text string")
    tomb = base.filter(F.col("doc_id") == 1)          # original text
    readd = spark.createDataFrame(
        [(1, "epsilon zeta")], "doc_id bigint, text string")
    empty = base.limit(0)

    # seq=0 = foreachBatch's FIRST batch_id: deleting an initially-
    # loaded doc in batch 0 must apply (init seeds ver=-1, not 0)
    st1 = bm25_stats_merge(*bm25_stats_init(base), empty, tomb, seq=0)
    st2 = bm25_stats_merge(*st1, readd, empty, seq=1)
    # redeliver the ORIGINAL delete (stale tombstone text, seq=0)
    st3 = bm25_stats_merge(*st2, empty, tomb, seq=0)

    final = base.filter(F.col("doc_id") != 1).unionByName(readd)
    want_df, want_tot, _ = bm25_stats_init(final)
    assert ({r["term"]: r["df"] for r in st3[0].collect()}
            == {r["term"]: r["df"] for r in want_df.collect()})
    g, w = st3[1].head(), want_tot.head()
    assert g["n_docs"] == w["n_docs"] and g["sum_dl"] == w["sum_dl"]

    # a fresh delete of the re-inserted doc (with its CURRENT text)
    # still applies at a later seq
    st4 = bm25_stats_merge(*st3, empty, readd, seq=2)
    want4_df, want4_tot, _ = bm25_stats_init(
        base.filter(F.col("doc_id") != 1))
    assert ({r["term"]: r["df"] for r in st4[0].collect()}
            == {r["term"]: r["df"] for r in want4_df.collect()})
    g4, w4 = st4[1].head(), want4_tot.head()
    assert g4["n_docs"] == w4["n_docs"] and g4["sum_dl"] == w4["sum_dl"]


def test_bm25_stats_update_without_delete_rejected(spark):
    """ADVICE r10: an insert for a currently-ALIVE doc at a fresh seq
    with DIFFERENT text is an update that lost its delete half — with
    no stored text fingerprint the state would silently keep serving
    the stale per-term df. The merge must raise (mirroring
    knn_graph_insert's different-embeddings rejection), while an
    IDENTICAL-text insert redelivery stays a silent no-op and a stale
    redelivery (seq <= ver) drops whatever its text says."""
    import pytest

    from neumann_spark.pipeline.fulltext import (
        bm25_stats_init,
        bm25_stats_merge,
    )

    base = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")],
        "doc_id bigint, text string")
    empty = base.limit(0)
    # materialize state between batches (what a foreachBatch consumer
    # does per micro-batch) — otherwise the 5-deep merge plan chain
    # re-analyzes the whole history at every action
    ck = lambda t: tuple(x.localCheckpoint(eager=True) for x in t)  # noqa: E731
    st = ck(bm25_stats_init(base))

    # update-without-delete: alive doc, fresh seq, different text
    upd = spark.createDataFrame(
        [(1, "delta epsilon")], "doc_id bigint, text string")
    with pytest.raises(Exception, match="update without its delete"):
        bm25_stats_merge(*st, upd, empty, seq=0)

    # identical-text redelivery of an applied insert: silent no-op
    ins = spark.createDataFrame(
        [(3, "zeta eta")], "doc_id bigint, text string")
    st1 = ck(bm25_stats_merge(*st, ins, empty, seq=0))
    st2 = ck(bm25_stats_merge(*st1, ins, empty, seq=0))   # same seq
    want_df, want_tot, _ = bm25_stats_init(base.unionByName(ins))
    assert ({r["term"]: r["df"] for r in st2[0].collect()}
            == {r["term"]: r["df"] for r in want_df.collect()})
    g, w = st2[1].head(), want_tot.head()
    assert g["n_docs"] == w["n_docs"] and g["sum_dl"] == w["sum_dl"]

    # stale redelivery with different text: doc 3 updated via
    # delete(seq=1)+insert(seq=2); the ORIGINAL insert (seq=0, old
    # text) redelivered afterwards must silently drop, not raise —
    # the doc legitimately changed after that batch's first delivery
    ins_v2 = spark.createDataFrame(
        [(3, "theta iota")], "doc_id bigint, text string")
    st3 = ck(bm25_stats_merge(*st2, empty, ins, seq=1))
    st4 = ck(bm25_stats_merge(*st3, ins_v2, empty, seq=2))
    st5 = ck(bm25_stats_merge(*st4, ins, empty, seq=0))  # stale redelivery
    want5_df, want5_tot, _ = bm25_stats_init(base.unionByName(ins_v2))
    assert ({r["term"]: r["df"] for r in st5[0].collect()}
            == {r["term"]: r["df"] for r in want5_df.collect()})
    g5, w5 = st5[1].head(), want5_tot.head()
    assert g5["n_docs"] == w5["n_docs"] and g5["sum_dl"] == w5["sum_dl"]

    # corrupt tombstone payload: deleting a live doc with text that
    # differs from what the state indexed must raise, never subtract
    # the wrong per-term counts
    bad_tomb = spark.createDataFrame(
        [(2, "totally other words")], "doc_id bigint, text string")
    with pytest.raises(Exception, match="corrupt tombstone payload"):
        bm25_stats_merge(*st5, empty, bad_tomb, seq=3)


def test_bm25_stats_tombstone_compaction(spark):
    """VERDICT r10 item 5: `bm25_stats_compact` drops tombstones below
    the caller-supplied redelivery horizon, keeps everything else, is
    idempotent, and — the safety contract — redelivered batches AT the
    horizon edge (seq == horizon, the lowest the source may still send)
    behave identically against the compacted and uncompacted state."""
    from neumann_spark.pipeline.fulltext import (
        bm25_stats_compact,
        bm25_stats_init,
        bm25_stats_merge,
    )

    base = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma"), (3, "gamma delta")],
        "doc_id bigint, text string")
    empty = base.limit(0)
    d1 = base.filter(F.col("doc_id") == 1)
    d2 = base.filter(F.col("doc_id") == 2)

    ck = lambda t: tuple(x.localCheckpoint(eager=True) for x in t)  # noqa: E731
    st = ck(bm25_stats_merge(*ck(bm25_stats_init(base)), empty, d1, seq=0))
    st = ck(bm25_stats_merge(*st, empty, d2, seq=1))
    df_tbl, totals, state = st

    # horizon 1: the ver=0 tombstone compacts away, the ver=1 one stays
    comp = bm25_stats_compact(state, 1)
    rows = {r["doc_id"]: (r["ver"], r["alive"]) for r in comp.collect()}
    assert rows == {2: (1, False), 3: (-1, True)}
    # idempotent at the same horizon
    again = bm25_stats_compact(comp, 1)
    assert {r["doc_id"] for r in again.collect()} == {2, 3}

    # horizon-edge redelivery: batch seq=1 (== horizon) redelivered
    # against the compacted state must equal the uncompacted replay —
    # the kept ver=1 tombstone refuses the seq=1 delete both ways
    want = bm25_stats_merge(df_tbl, totals, state, empty, d2, seq=1)
    got = bm25_stats_merge(df_tbl, totals, comp, empty, d2, seq=1)
    assert ({r["term"]: r["df"] for r in got[0].collect()}
            == {r["term"]: r["df"] for r in want[0].collect()})
    gw, ww = got[1].head(), want[1].head()
    assert gw["n_docs"] == ww["n_docs"] and gw["sum_dl"] == ww["sum_dl"]

    # a redelivered insert for the COMPACTED doc at seq >= horizon
    # applies on the missing key exactly as it would have applied on
    # its ver=0 tombstone (tombstone & ver < seq): same final stats
    re1 = bm25_stats_merge(df_tbl, totals, comp, d1, empty, seq=1)
    re1_unc = bm25_stats_merge(df_tbl, totals, state, d1, empty, seq=1)
    assert ({r["term"]: r["df"] for r in re1[0].collect()}
            == {r["term"]: r["df"] for r in re1_unc[0].collect()})
    r1, r2 = re1[1].head(), re1_unc[1].head()
    assert r1["n_docs"] == r2["n_docs"] and r1["sum_dl"] == r2["sum_dl"]
