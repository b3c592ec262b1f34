"""Quality gates for the probabilistic LLM-data operators: the driver
only checks rows for these, so precision/recall is asserted here
against the exact variants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from konohadataplatform_spark.operators import dedup as D
from konohadataplatform_spark.operators import multimodal as M
from konohadataplatform_spark.operators import similarity as S
from konohadataplatform_spark.sources.star_schema import load_table
from tests.conftest import SF_DIR


def _pairs(df):
    return {(r.a_id, r.b_id) for r in df.select("a_id", "b_id").collect()}


def test_minhash_recall_vs_exact(spark):
    """Guards q_minhash_dedup's oracle registration: the driver checks
    it against the EXACT Jaccard SQL, which is only stable because LSH
    recall on the fixture is exactly 1.0 (16 bands x 4 rows at j>=0.8:
    P[miss] < 0.1% per pair, and the planted near-dups sit far from the
    threshold boundary)."""
    docs = load_table(spark, SF_DIR, "documents")
    exact = _pairs(D.jaccard_similarity_join(docs, threshold=0.8))
    lsh = _pairs(D.minhash_dedup(docs, threshold=0.8))
    assert exact, "expected planted near-dup pairs in testdata"
    extra = lsh - exact
    assert not extra, f"LSH+verify produced non-exact pairs: {extra}"
    missed = exact - lsh
    assert not missed, (
        f"fixture recall must be exactly 1.0 for the oracle hash-match; "
        f"missed: {missed}"
    )


def test_minhash_verified_jaccard_values(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = D.minhash_dedup(docs, threshold=0.8)
    bad = out.filter((F.col("jaccard") < 0.8) | (F.col("jaccard") > 1.0)).count()
    assert bad == 0


def test_simhash_detects_neardups(spark):
    docs = load_table(spark, SF_DIR, "documents")
    hashes = D.simhash(docs)
    assert hashes.count() == docs.count()
    cands = D.simhash_candidates(hashes, bands=4)
    ha = hashes.select(F.col("sid").alias("a_id"), F.col("simhash").alias("h_a"))
    hb = hashes.select(F.col("sid").alias("b_id"), F.col("simhash").alias("h_b"))
    close = (
        cands.join(ha, "a_id")
        .join(hb, "b_id")
        .withColumn("ham", D.hamming_distance(F.col("h_a"), F.col("h_b")))
        .filter(F.col("ham") <= 8)
    )
    close_pairs = _pairs(close)
    exact = _pairs(D.jaccard_similarity_join(docs, threshold=0.8))
    # simhash at <=8/64 bits should find most of the planted near-dups
    if exact:
        recall = len(close_pairs & exact) / len(exact)
        assert recall >= 0.5, f"simhash recall unexpectedly low: {recall}"


def test_simhash_matches_casewhen_reference(spark):
    """r14 optimization guard: the ones-count + expr-string simhash
    spelling must be bit-identical to the original +-1 CaseWhen-sum
    fingerprint (inlined here as the reference), for BOTH token
    hashes — including xxhash64, whose bit 63 exercises the signed
    shiftleft wrap the md5 variant never reaches."""
    docs = load_table(spark, SF_DIR, "documents")
    for token_hash in ("md5", "xxhash64"):
        if token_hash == "md5":
            h = F.conv(
                F.substring(F.md5(F.col("t")), 1, 15), 16, 10
            ).cast("long")
        else:
            h = F.xxhash64("t")
        tok = docs.select(
            F.col("doc_id").alias("sid"),
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("t"),
        ).withColumn("h", h)
        bit_sums = [
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
        agg = tok.groupBy("sid").agg(*bit_sums)
        fp = F.lit(0).cast("long")
        for i in range(64):
            fp = fp.bitwiseOR(
                F.when(
                    F.col(f"b{i}") > 0,
                    F.shiftleft(F.lit(1).cast("long"), i),
                ).otherwise(F.lit(0).cast("long"))
            )
        ref = {
            r.sid: r.simhash
            for r in agg.select("sid", fp.alias("simhash")).collect()
        }
        got = {
            r.sid: r.simhash
            for r in D.simhash(docs, token_hash=token_hash).collect()
        }
        assert got == ref, f"simhash diverged for token_hash={token_hash}"


def test_ann_lsh_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.ann_lsh_topk(emb, queries, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"ANN recall vs brute force too low: {recall}"


def test_ann_scores_match_bruteforce_for_common_pairs(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    bf = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in S.cosine_topk(emb, queries, k=5).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in S.ann_lsh_topk(emb, queries, k=5).collect()
    }
    for k in set(bf) & set(ann):
        assert bf[k] == ann[k], "cosine must be identical for shared pairs"


def test_multimodal_pipeline(spark):
    docs = load_table(spark, SF_DIR, "documents")
    media = M.documents_as_media(docs)
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "content",
        "media_type",
        "meta",
    ]
    feats = M.extract_features(media, dim=8).collect()
    assert len(feats) == docs.count()
    row = feats[0]
    assert len(row.content_sha) == 64
    assert len(row.feature) == 8
    assert all(0 <= x < 1 for x in row.feature)
    # deterministic: same content -> same feature
    again = M.extract_features(media, dim=8).collect()
    assert {r.media_id: r.content_sha for r in feats} == {
        r.media_id: r.content_sha for r in again
    }


def test_decode_stub_raises(spark):
    import pytest

    # PIL-dependent formats still raise; stdlib BMP/PNG/WAV/JPEG do
    # not. Arithmetic-coded JPEG (SOF9) is the loud non-baseline guard
    # (progressive SOF2 decodes natively as of r6):
    import struct as _st

    sof9 = _st.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    arith = (b"\xff\xd8" + b"\xff\xc9" + _st.pack(">H", len(sof9) + 2) + sof9
             + b"\xff\xd9")
    with pytest.raises(NotImplementedError, match="arithmetic"):
        M.decode_image(arith)
    with pytest.raises(NotImplementedError):
        M.decode_audio(b"ID3\x03" + b"\x00" * 64)
    # compressed BMP/TIFF-class formats stay loud (WebP RIFF header)
    with pytest.raises(NotImplementedError):
        M.decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 " + b"\x00" * 32)


def test_png_codec_roundtrip_and_filters():
    """Stdlib PNG: encode->decode round-trip, plus decoding scanlines
    written with every filter type (Sub/Up/Average/Paeth) — the spec §9
    reconstruction, not just the filter-0 happy path."""
    import struct as _s
    import zlib as _z

    px = bytes(range(8 * 4 * 3))
    img = M.decode_image(M.encode_png(8, 4, px))
    assert (img["width"], img["height"], img["bpp"]) == (8, 4, 24)
    assert img["pixels"] == px

    # grayscale + RGBA color types round-trip too
    g = M.decode_png(M.encode_png(4, 2, bytes(range(8)), color_type=0))
    assert (g["channels"], g["pixels"]) == (1, bytes(range(8)))
    a = M.decode_png(M.encode_png(2, 2, bytes(range(16)), color_type=6))
    assert (a["channels"], a["pixels"]) == (4, bytes(range(16)))

    # hand-build an image whose rows use filters 1-4; reconstruct and
    # compare against the plain (filter-0) pixels
    w, h, ch = 4, 5, 3
    stride = w * ch
    rows = [bytes((r * 17 + c * 7) % 256 for c in range(stride)) for r in range(h)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = bytes(stride)
    for r, (f, line) in enumerate(zip([0, 1, 2, 3, 4], rows)):
        raw.append(f)
        for i in range(stride):
            left = line[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if f == 0:
                raw.append(line[i])
            elif f == 1:
                raw.append((line[i] - left) & 0xFF)
            elif f == 2:
                raw.append((line[i] - up) & 0xFF)
            elif f == 3:
                raw.append((line[i] - ((left + up) >> 1)) & 0xFF)
            else:
                raw.append((line[i] - paeth(left, up, ul)) & 0xFF)
        prev = line

    def chunk(ctype, body):
        return (_s.pack(">I", len(body)) + ctype + body
                + _s.pack(">I", _z.crc32(ctype + body) & 0xFFFFFFFF))

    content = (M.PNG_SIG
               + chunk(b"IHDR", _s.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", _z.compress(bytes(raw)))
               + chunk(b"IEND", b""))
    img = M.decode_png(content)
    assert img["pixels"] == b"".join(rows)

    # corrupt a chunk body: CRC check is loud
    bad = bytearray(M.encode_png(2, 2, bytes(12)))
    bad[40] ^= 0xFF
    import pytest
    with pytest.raises(ValueError, match="CRC"):
        M.decode_png(bytes(bad))


def test_resize_image_real():
    """Nearest-neighbor resize round-trips through both codecs."""
    px = bytes(range(8 * 4 * 3))
    small = M.decode_image(M.resize_image(M.encode_png(8, 4, px), 4, 2))
    assert (small["width"], small["height"]) == (4, 2)
    # top-left pixel survives nearest-neighbor exactly
    assert small["pixels"][:3] == px[:3]
    small_bmp = M.decode_image(M.resize_image(M.encode_bmp(8, 4, px), 4, 2))
    assert (small_bmp["width"], small_bmp["height"]) == (4, 2)
    assert small_bmp["pixels"][:3] == px[:3]


def test_bmp_codec_roundtrip():
    """Real byte-level BMP decode: padding, bottom-up rows, header."""
    px = bytes(range(5 * 3 * 3))  # 5x3, rows NOT 4-byte aligned
    img = M.decode_image(M.encode_bmp(5, 3, px))
    assert (img["width"], img["height"], img["bpp"]) == (5, 3, 24)
    assert img["pixels"] == px


def test_wav_codec_roundtrip():
    samples = [0, -1, 32767, -32768, 123, -456, 7, 8]
    au = M.decode_audio(M.encode_wav(samples, 8000))
    assert au["samples"] == samples
    assert au["n_samples"] == 8 and au["duration_ms"] == 1
    assert au["channels"] == 1 and au["sample_rate"] == 8000


def test_decode_features_real_payloads(spark):
    """decode_features parses genuine BMP/WAV bytes and passes opaque
    payloads through with nulls (no crash, no payload shuffle)."""
    px = bytes(96)
    rows = [
        (1, M.encode_bmp(8, 4, px)),
        (2, M.encode_wav([100, -100, 50, -50], 8000)),
        (3, b"not media at all"),
    ]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r for r in M.decode_features(media).collect()}
    assert (got[1].fmt, got[1].width, got[1].height, got[1].mean_val) == (
        "bmp", 8, 4, 0.0,
    )
    assert (got[2].fmt, got[2].n_samples, got[2].mean_val) == ("wav", 4, 0.0)
    assert got[3].fmt == "opaque" and got[3].width is None


def test_ann_ivf_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.ann_ivf_topk(emb, queries, k=5, n_cells=8, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall vs brute force too low: {recall}"


def test_ann_ivf_portable_recall_and_determinism(spark):
    """The exact-integer-arithmetic IVF (the oracle-checked q_ann_ivf
    path): useful recall vs brute force, and bit-stable across runs
    (every training step is order-independent integer math)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(emb, queries, k=5).collect()
    }
    runs = [
        {(r.query_id, r.neighbor_id, r.knn_rank)
         for r in S.ann_ivf_topk_portable(
             emb, queries, k=5, n_cells=8, nprobe=4, iters=2).collect()}
        for _ in range(2)
    ]
    assert runs[0] == runs[1]
    approx = {(q, n) for q, n, _rk in runs[0]}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"portable IVF recall too low: {recall}"


def test_ivf_deterministic(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    c1 = S.ivf_centroids(emb, n_cells=4)
    c2 = S.ivf_centroids(emb, n_cells=4)
    assert c1 == c2


def _py_lloyd(rows, n_seeds, iters):
    """Pure-Python replay of the portable Lloyd contract: seeds = the
    n lowest-id vectors (cell = rank by id), assignment by exact
    integer squared-L2 with ties to the lowest cell, update by
    per-dimension SUM // COUNT, empty cells dropped, cells ascending."""
    rows = sorted(rows)
    cents = [(i + 1, list(q)) for i, (_cid, q) in enumerate(rows[:n_seeds])]
    for _ in range(iters):
        acc: dict = {}
        for _cid, q in rows:
            best = min(
                cents,
                key=lambda c: (sum((a - b) ** 2 for a, b in zip(q, c[1])), c[0]),
            )[0]
            n, s = acc.get(best, (0, [0] * len(q)))
            acc[best] = (n + 1, [a + b for a, b in zip(s, q)])
        cents = [
            (cell, [x // n for x in s])
            for cell, (n, s) in sorted(acc.items())
        ]
    return cents


def test_ivf_trainer_matches_python_lloyd_replay(spark):
    """The r14 Arrow partial-sum kernel in _ivf_train_portable must
    reproduce the documented Lloyd contract bit-for-bit: centroids
    equal a pure-Python replay over the same grid rows."""
    emb = load_table(spark, SF_DIR, "embeddings")
    base = S._grid_base(emb, "vec_id", "embedding", 1_000_000, 2.0)
    rows = [(r["cid"], list(r["q"])) for r in base.select("cid", "q").collect()]
    got = S._ivf_train_portable(base, n_cells=8, iters=2)
    want = _py_lloyd(rows, n_seeds=8, iters=2)
    assert got == want


def test_pq_trainer_matches_python_lloyd_replay(spark):
    """Same contract per subspace for pq_train_portable's r14 kernel:
    every subspace codebook equals the pure-Python Lloyd replay over
    that subspace's grid slices."""
    emb = load_table(spark, SF_DIR, "embeddings")
    m, k_codes, iters = 4, 8, 2
    _final, codebooks = S.pq_train_portable(
        emb, m=m, k_codes=k_codes, iters=iters
    )
    base = S._grid_base(emb, "vec_id", "embedding", 1_000_000, 2.0)
    rows = [(r["cid"], list(r["q"])) for r in base.select("cid", "q").collect()]
    dim = len(rows[0][1])
    dsub = dim // m
    for s in range(m):
        srows = [(cid, q[s * dsub : (s + 1) * dsub]) for cid, q in rows]
        want = _py_lloyd(srows, n_seeds=k_codes, iters=iters)
        assert codebooks[s] == want, f"subspace {s} codebook diverged"


def test_frame_sampling(spark):
    docs = load_table(spark, SF_DIR, "documents")
    media = M.documents_as_media(docs.limit(20))
    frames = M.sample_frames(media, frame_size=64, stride=2)
    rows = frames.collect()
    assert rows, "no frames produced"
    # every media row with >=1 byte yields at least one frame
    assert frames.select("media_id").distinct().count() == 20
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, fr in by_media.items():
        idxs = sorted(f.frame_idx for f in fr)
        assert idxs == list(range(len(idxs))), "frame indices not dense"
        assert all(len(f.frame_bytes) <= 64 for f in fr)
        assert all(len(f.frame_sha) == 64 for f in fr)


def test_thumbnail_pipeline_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents")
    media = M.documents_as_media(docs.limit(10))
    a = {r.media_id: (r.content_sha, tuple(r.feature)) for r in M.thumbnail_features(media).collect()}
    b = {r.media_id: (r.content_sha, tuple(r.feature)) for r in M.thumbnail_features(media).collect()}
    assert a == b
    assert all(len(v[1]) == 4 for v in a.values())


def test_resize_stub_raises(spark):
    import pytest

    # WebP is PIL-only; truncated TIFF/JPEG/GIF are corrupt, not missing
    with pytest.raises(NotImplementedError):
        M.decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 " + b"\x00" * 40)
    with pytest.raises(ValueError):
        M.resize_image(b"II*\x00" + b"\x00" * 60, 64, 64)
    with pytest.raises(ValueError):
        M.resize_image(b"\xff\xd8", 64, 64)
    with pytest.raises(ValueError):
        M.decode_image(b"GIF89a" + b"\x00" * 8)


def test_tiff_roundtrip_both_byte_orders():
    import pytest

    px = bytes(range(8 * 4 * 3))
    for big_endian in (False, True):
        t = M.encode_tiff(8, 4, px, big_endian=big_endian)
        img = M.decode_tiff(t)
        assert (img["width"], img["height"], img["channels"]) == (8, 4, 3)
        assert img["pixels"] == px
        # and through the generic dispatcher
        assert M.decode_image(t)["pixels"] == px
    # grayscale single-strip variant
    g = M.encode_tiff(4, 4, bytes(range(16)), channels=1)
    img = M.decode_tiff(g)
    assert img["channels"] == 1 and img["pixels"] == bytes(range(16))
    # compressed TIFF is a loud capability gap, not silent garbage
    import struct

    lzw = bytearray(M.encode_tiff(8, 4, px))
    # flip the Compression SHORT (tag 259) to 5 (LZW)
    idx = lzw.find(struct.pack("<HHI", 259, 3, 1))
    lzw[idx + 8 : idx + 10] = struct.pack("<H", 5)
    with pytest.raises(NotImplementedError):
        M.decode_tiff(bytes(lzw))


def test_tiff_resize_preserves_format():
    px = bytes((i * 7) % 256 for i in range(8 * 4 * 3))
    for big_endian in (False, True):
        t = M.encode_tiff(8, 4, px, big_endian=big_endian)
        out = M.resize_image(t, 4, 2)
        assert out[:2] == (b"MM" if big_endian else b"II")
        img = M.decode_tiff(out)
        assert (img["width"], img["height"]) == (4, 2)
        # nearest-neighbor: every output pixel exists in the source
        src_rows = [px[r * 24 : (r + 1) * 24] for r in range(4)]
        for y in range(2):
            for x in range(4):
                trip = img["pixels"][(y * 4 + x) * 3 : (y * 4 + x) * 3 + 3]
                assert trip == src_rows[y * 2][x * 2 * 3 : x * 2 * 3 + 3]


def test_cosine_neardup_lsh_recall(spark):
    """LSH-bucketed near-dup pairs: exact precision (every returned
    cosine really >= t) and high recall vs the exact all-pairs kernel."""
    emb = load_table(spark, SF_DIR, "embeddings")
    exact = {
        (r.a_id, r.b_id) for r in S.cosine_pairs_exact(emb, 0.4).collect()
    }
    got = S.cosine_neardup_lsh(emb, 0.4).collect()
    got_pairs = {(r.a_id, r.b_id) for r in got}
    assert all(r.cos_sim >= 0.4 for r in got)          # exact precision
    assert got_pairs <= exact                           # no false pairs
    if exact:
        recall = len(got_pairs & exact) / len(exact)
        assert recall >= 0.6, f"recall {recall:.2f}"


def test_incremental_minhash_dedup_matches_full_rebuild(spark):
    """Index batch 1, then dedupe batch 2 incrementally: every pair the
    full-corpus run finds that involves a batch-2 doc is found, with
    identical jaccard values (exact verification)."""
    docs = load_table(spark, SF_DIR, "documents")
    cut = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).first()[0]
    batch1 = docs.filter(F.col("doc_id") <= cut)
    batch2 = docs.filter(F.col("doc_id") > cut)

    idx1 = D.minhash_index(batch1).cache()
    idx2 = D.minhash_index(batch2).cache()
    inc = D.incremental_minhash_dedup(idx1, idx2, threshold=0.8)
    inc_pairs = {(r.a_id, r.b_id, round(r.jaccard, 12)) for r in inc.collect()}

    full = D.minhash_dedup(docs, threshold=0.8)
    b2_ids = {r.sid for r in idx2.select("sid").collect()}
    full_pairs = {
        (r.a_id, r.b_id, round(r.jaccard, 12))
        for r in full.collect()
        if r.a_id in b2_ids or r.b_id in b2_ids
    }
    assert inc_pairs == full_pairs
    assert inc_pairs, "expected planted near-dup pairs spanning the batches"


def test_ivf_index_persist_and_search(spark, tmp_path):
    """Persistent IVF: build-once then search matches the train-inline
    ann_ivf_topk (same seed/cells/nprobe), incremental add is probed
    without retraining, and the probe prunes to probed cell partitions."""
    from konohadataplatform_spark.catalog import SnapshotCatalog

    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)

    S.build_ivf_index(cat, "ivf", emb, n_cells=8)
    got = {
        (r.query_id, r.neighbor_id, r.knn_rank)
        for r in S.ivf_index_search(cat, "ivf", queries, k=5, nprobe=4).collect()
    }
    inline = {
        (r.query_id, r.neighbor_id, r.knn_rank)
        for r in S.ann_ivf_topk(emb, queries, k=5, n_cells=8, nprobe=4).collect()
    }
    assert got == inline

    # incremental add: a brand-new vector becomes findable w/o rebuild
    probe = emb.filter(F.col("vec_id") == 3).select("embedding").first().embedding
    new = spark.createDataFrame(
        [(999999, [float(x) for x in probe], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    S.ivf_index_add(cat, "ivf", new)
    found = S.ivf_index_search(
        cat, "ivf", emb.filter(F.col("vec_id") == 3), k=3, nprobe=2
    )
    assert 999999 in {r.neighbor_id for r in found.collect()}

    # probe prunes: the cells scan carries a partition filter on cell
    q = S.ivf_index_search(cat, "ivf", queries, k=2, nprobe=2)
    plan = q._sc._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in plan and "cell" in plan


def test_ivf_index_add_cell_move_no_duplicates(spark, tmp_path):
    """Re-ingesting an id whose new embedding lands in a different cell
    must move it (delete from the old partition), never duplicate it."""
    from konohadataplatform_spark.catalog import SnapshotCatalog

    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    emb = load_table(spark, SF_DIR, "embeddings")
    S.build_ivf_index(cat, "ivf", emb, n_cells=8)
    cells = cat.read("ivf__cells")
    # pick a vector and replace its embedding with one from a DIFFERENT cell
    a = cells.orderBy("vid").first()
    other = cells.filter(F.col("cell") != a.cell).orderBy("vid").first()
    moved = spark.createDataFrame(
        [(a.vid, [float(x) for x in other.vec], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    S.ivf_index_add(cat, "ivf", moved)
    after = cat.read("ivf__cells").filter(F.col("vid") == a.vid).collect()
    assert len(after) == 1, f"id duplicated across cells: {after}"
    assert after[0].cell == other.cell
    assert cat.read("ivf__cells").count() == cells.count()


def test_lsh_bucket_cap_skew_guard(spark):
    """max_bucket bounds the quadratic blow-up of a hot LSH bucket:
    capped candidate sets are a subset of the uncapped ones, and a
    bucket over the cap stops contributing pairs entirely."""
    from pyspark.sql import Row

    # 6 identical docs -> every band bucket has size >= 6; 2 unrelated
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="the same boilerplate header text repeated here")
         for i in range(6)]
        + [Row(doc_id=10, text="entirely different content about spark catalysts"),
           Row(doc_id=11, text="another unrelated record talking about parquet")]
    )
    hashes = D.simhash(docs).cache()
    uncapped = _pairs(D.simhash_candidates(hashes, bands=4))
    capped = _pairs(D.simhash_candidates(hashes, bands=4, max_bucket=5))
    assert capped <= uncapped
    # the size-6 identical cluster is excluded by the cap
    hot = {(a, b) for a, b in uncapped if a < 6 and b < 6}
    assert hot and not (capped & hot)
    # a generous cap changes nothing
    assert _pairs(D.simhash_candidates(hashes, bands=4, max_bucket=100)) == uncapped


def test_minhash_dedup_passes_max_bucket_through(spark):
    """r7 VERDICT item 4: the flagship minhash_dedup wrapper must
    forward the skew cap to LSH candidate generation — a hot band
    bucket (identical boilerplate docs) stops pairing under a tight
    cap, while a generous cap is a no-op vs uncapped."""
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [Row(doc_id=i,
             text="the exact same boilerplate footer text repeated verbatim "
                  "in every single document of this hot cluster")
         for i in range(6)]
        + [Row(doc_id=10, text="entirely different content about spark "
                               "catalyst optimizer internals and plans"),
           Row(doc_id=11, text="another unrelated record talking about "
                               "parquet row groups and column statistics")]
    )

    def _p(res):
        return {(r.a_id, r.b_id) for r in res.collect()}

    uncapped = _p(D.minhash_dedup(docs, threshold=0.8))
    hot = {(a, b) for a, b in uncapped if a < 6 and b < 6}
    assert hot  # the identical cluster pairs when uncapped
    # every band bucket of the 6 identical docs has size 6 > 5, and the
    # docs are identical in EVERY band, so the cap removes exactly the
    # hot cluster's pairs and nothing else
    capped = _p(D.minhash_dedup(docs, threshold=0.8, max_bucket=5))
    assert capped == uncapped - hot
    assert _p(D.minhash_dedup(docs, threshold=0.8, max_bucket=100)) == uncapped


def test_prebucketed_candidates_max_bucket_guard(spark):
    """The incremental-ingest fast path honors the same cap: a corpus
    bucket over the cap stops emitting candidates for colliding batch
    docs; everything else is untouched."""
    from pyspark.sql import Row

    hot_text = ("the exact same boilerplate footer text repeated verbatim "
                "in every single document of this hot cluster")
    corpus = spark.createDataFrame(
        [Row(doc_id=i, text=hot_text) for i in range(6)]
        + [Row(doc_id=20, text="a unique corpus document describing spark "
                               "adaptive query execution and skew joins")]
    )
    batch = spark.createDataFrame(
        [Row(doc_id=100, text=hot_text),
         Row(doc_id=101, text="a unique corpus document describing spark "
                              "adaptive query execution and skew joins")]
    )
    cidx = D.minhash_index(corpus)
    bidx = D.minhash_index(batch)
    cbuckets = D.band_bucket_keys(cidx)

    def _p(cands):
        return {(r.a_id, r.b_id) for r in cands.collect()}

    uncapped = _p(D.prebucketed_candidates(cbuckets, bidx))
    assert (20, 101) in uncapped and any(b == 100 for _a, b in uncapped)
    capped = _p(D.prebucketed_candidates(cbuckets, bidx, max_bucket=5))
    # hot-bucket pairs (batch doc 100 vs the 6 identical corpus docs)
    # are gone; the unique-doc pair survives
    assert (20, 101) in capped
    assert not any(b == 100 and a < 6 for a, b in capped)
    assert _p(
        D.prebucketed_candidates(cbuckets, bidx, max_bucket=1000)
    ) == uncapped


def test_ngram_decontaminate_planted(spark):
    """A training doc that copies a 5-word span from an eval doc is
    flagged with the exact count of shared distinct 5-grams; clean
    docs are absent from the output."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),   # eval
        (2, "x alpha beta gamma delta epsilon zeta y"),  # shares 2 5-grams w/ doc 1
        (3, "one two three four five six seven"),     # clean
        (4, "short doc"),                             # < n words, excluded
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = D.ngram_decontaminate(docs, eval_pred=F.col("doc_id") == 1, n=5)
    got = {r.doc_id: r.n_eval_grams for r in out.collect()}
    assert got == {2: 2}


def test_repetition_stats_values(spark):
    """dup-word fraction and top-2-gram char mass on a constructed doc:
    'a b a b a b' -> 4/6 dup words; top 2-gram 'a b' occurs 3 times,
    covering 3*2=6 of 6 non-space chars."""
    from konohadataplatform_spark.operators import text as TXO

    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "u v w x y z"), (3, "solo")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in TXO.repetition_stats(docs).collect()}
    assert 3 not in out  # < 2 words filtered
    r1 = out[1]
    assert abs(r1.dup_word_frac - 4 / 6) < 1e-12
    assert r1.top_2gram == "a b" and r1.top_2gram_cnt == 3
    assert abs(r1.top_2gram_char_frac - 1.0) < 1e-12
    r2 = out[2]
    assert r2.dup_word_frac == 0.0
    # all five 2-grams tie at cnt=1 -> lexicographically smallest wins
    assert r2.top_2gram == "u v" and r2.top_2gram_cnt == 1


def test_word_entropy_known_values(spark):
    """Uniform 4-word doc -> exactly 2 bits; single repeated word -> 0."""
    from konohadataplatform_spark.operators import text as TXO

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "w w w w w")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in TXO.word_entropy(docs).collect()}
    assert out[1].word_entropy == 2.0 and out[1].n_tokens == 4 and out[1].n_distinct == 4
    assert out[2].word_entropy == 0.0 and out[2].n_distinct == 1


def test_boilerplate_coverage_values(spark):
    """Two docs sharing one 5-gram span, one unique doc: shared grams
    get df>=2, unique doc scores 0."""
    from konohadataplatform_spark.operators import text as TXO

    rows = [
        (1, "a b c d e f"),        # grams: 'a b c d e', 'b c d e f'
        (2, "a b c d e zz"),       # shares 'a b c d e'
        (3, "p q r s t u"),        # unique
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in TXO.boilerplate_coverage(docs, n=5).collect()}
    assert out[1].n_grams == 2 and out[1].n_common_grams == 1
    assert abs(out[1].boilerplate_frac - 0.5) < 1e-12
    assert out[2].n_common_grams == 1
    assert out[3].n_common_grams == 0 and out[3].boilerplate_frac == 0.0


def test_jpeg_codec_roundtrips():
    """Baseline JPEG: with identity quant tables and 4:4:4 the only
    loss is DCT float rounding — on these fixtures, exactly zero.
    Subsampled/restart variants decode within chroma-averaging bounds."""
    import numpy as np

    from konohadataplatform_spark.operators import jpeg_py as J

    w, h = 24, 17
    orig = np.zeros((h, w, 3), np.uint8)
    for yy in range(h):
        for xx in range(w):
            orig[yy, xx] = ((yy * 9) % 256, (xx * 11) % 256, (yy * 3 + xx * 5) % 256)

    dec = J.decode_jpeg(J.encode_jpeg(w, h, orig.tobytes()))
    assert (dec["width"], dec["height"], dec["channels"]) == (w, h, 3)
    got = np.frombuffer(dec["pixels"], np.uint8).reshape(h, w, 3)
    assert np.array_equal(got, orig), "4:4:4 identity-quant must be lossless here"

    for kw, tol in (({"subsampling": "420"}, 16), ({"subsampling": "422"}, 16),
                    ({"restart_interval": 2}, 0)):
        dec = J.decode_jpeg(J.encode_jpeg(w, h, orig.tobytes(), **kw))
        got = np.frombuffer(dec["pixels"], np.uint8).reshape(h, w, 3)
        err = np.abs(got.astype(int) - orig.astype(int)).max()
        assert err <= tol, f"{kw}: max err {err} > {tol}"

    # grayscale single-component path; non-multiple-of-8 dims
    gray = bytes((x * 19 + y * 7) % 256 for y in range(9) for x in range(13))
    g = J.decode_jpeg(J.encode_jpeg_gray(13, 9, gray))
    assert (g["width"], g["height"], g["channels"]) == (13, 9, 1)
    assert max(abs(a - b) for a, b in zip(g["pixels"], gray)) <= 1

    # determinism: same bytes in, same bytes out, twice
    enc = J.encode_jpeg(w, h, orig.tobytes(), subsampling="420")
    assert enc == J.encode_jpeg(w, h, orig.tobytes(), subsampling="420")
    assert J.decode_jpeg(enc)["pixels"] == J.decode_jpeg(enc)["pixels"]


def test_jpeg_via_decode_image_dispatch():
    """decode_image routes FFD8 payloads through the JPEG decoder with
    the same dict contract as PNG/BMP."""
    import numpy as np

    from konohadataplatform_spark.operators import jpeg_py as J

    w, h = 8, 8
    orig = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
    img = M.decode_image(J.encode_jpeg(w, h, orig.tobytes()))
    assert (img["width"], img["height"], img["bpp"]) == (w, h, 24)
    assert img["pixels"] == orig.tobytes()


def test_jpeg_quantized_lossy_but_close():
    """Non-identity quant tables (real compression) stay within a
    quality envelope on a smooth gradient."""
    import numpy as np

    from konohadataplatform_spark.operators import jpeg_py as J

    w, h = 32, 32
    orig = np.zeros((h, w, 3), np.uint8)
    for yy in range(h):
        for xx in range(w):
            v = (yy * 4 + xx * 4) % 256
            orig[yy, xx] = (v, v, v)
    q = np.full((8, 8), 4.0)
    enc = J.encode_jpeg(w, h, orig.tobytes(), quant_luma=q, quant_chroma=q)
    dec = J.decode_jpeg(enc)
    got = np.frombuffer(dec["pixels"], np.uint8).reshape(h, w, 3)
    err = np.abs(got.astype(int) - orig.astype(int)).max()
    assert err <= 12, f"quantized roundtrip err {err}"


def test_jpeg_resize_real():
    """resize_image decodes baseline JPEG and re-encodes as JPEG."""
    import numpy as np

    from konohadataplatform_spark.operators import jpeg_py as J

    w, h = 16, 16
    orig = np.zeros((h, w, 3), np.uint8)
    orig[:, : w // 2] = (200, 40, 90)
    orig[:, w // 2 :] = (10, 250, 120)
    small = M.resize_image(J.encode_jpeg(w, h, orig.tobytes()), 8, 8)
    assert small[:2] == b"\xff\xd8"
    img = M.decode_image(small)
    assert (img["width"], img["height"]) == (8, 8)
    got = np.frombuffer(img["pixels"], np.uint8).reshape(8, 8, 3)
    # halves survive the resize+recompress within JPEG tolerance
    assert np.abs(got[:, :4].astype(int) - [200, 40, 90]).max() <= 3
    assert np.abs(got[:, 4:].astype(int) - [10, 250, 120]).max() <= 3


def test_unigram_surprisal_uniform_corpus(spark):
    """With all words equally frequent, every doc's surprisal is
    exactly log2(vocab); a doc of rare words scores higher than one
    of common words."""
    from konohadataplatform_spark.operators import text as TXO

    uni = spark.createDataFrame(
        [(1, "a b"), (2, "c d")], ["doc_id", "text"]
    )
    out = {r.doc_id: r.unigram_surprisal for r in TXO.unigram_surprisal(uni).collect()}
    assert out[1] == out[2] == 2.0  # 4 words, each p=1/4

    skew = spark.createDataFrame(
        [(1, "x x x x"), (2, "y z w v")], ["doc_id", "text"]
    )
    s = {r.doc_id: r.unigram_surprisal for r in TXO.unigram_surprisal(skew).collect()}
    assert s[2] > s[1]  # rare words are more surprising


def test_vocab_stats_values(spark):
    from konohadataplatform_spark.operators import text as TXO

    docs = spark.createDataFrame(
        [(1, "a b a", "s1"), (2, "c c", "s1"), (3, "x y", "s2")],
        ["doc_id", "text", "source"],
    )
    out = {r.source: r for r in TXO.vocab_stats(docs).collect()}
    assert out["s1"].n_tokens == 5 and out["s1"].n_distinct_words == 3
    assert abs(out["s1"].type_token_ratio - 0.6) < 1e-12
    assert out["s2"].n_tokens == 2 and out["s2"].type_token_ratio == 1.0


def test_gif_codec_roundtrips():
    """Stdlib GIF: LZW encode/decode round trip, multi-frame animation
    with delays, code-width growth + dict reset on larger images."""
    import random

    from konohadataplatform_spark.operators import gif_py as G

    pal = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
    w, h = 7, 5
    px = bytes(c for i in range(w * h) for c in pal[3 * (i % 4):3 * (i % 4) + 3])
    dec = G.decode_gif(G.encode_gif(w, h, [px], palette=pal))
    assert (dec["width"], dec["n_frames"]) == (w, 1)
    assert dec["frames"][0]["pixels"] == px

    f2 = bytes(c for i in range(w * h) for c in pal[3 * ((i + 1) % 4):3 * ((i + 1) % 4) + 3])
    dec = G.decode_gif(G.encode_gif(w, h, [px, f2, px], palette=pal, delay_ms=50))
    assert dec["n_frames"] == 3
    assert dec["frames"][1]["pixels"] == f2
    assert dec["frames"][0]["delay_ms"] == 50

    rnd = random.Random(42)
    big = [rnd.randrange(4) for _ in range(64 * 64)]
    bpx = bytes(c for i in big for c in pal[3 * i:3 * i + 3])
    dec = G.decode_gif(G.encode_gif(64, 64, [bpx], palette=pal))
    assert dec["frames"][0]["pixels"] == bpx

    # decode_image dispatch: first frame, n_frames surfaced
    img = M.decode_image(G.encode_gif(w, h, [px, f2], palette=pal))
    assert (img["width"], img["height"], img["n_frames"]) == (w, h, 2)
    assert img["pixels"] == px

    import pytest

    with pytest.raises(ValueError, match="not in palette"):
        G.encode_gif(1, 1, [b"\x01\x02\x03"], palette=pal)


def test_audio_window_stats_values(spark):
    """Constructed PCM: energy/zero-crossings/peak per window, exact."""
    media = M.documents_as_media(
        spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    )
    # bypass the md5 fixture: hand-build one WAV with known samples
    import pandas as pd

    wav = M.encode_wav([100, -200, 300, 0, -5, -5, 5, 5], 8000)
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [7], "content": [wav]})
    )
    out = {r.window_idx: r for r in M.audio_window_stats(df, window=4).collect()}
    w0, w1 = out[0], out[1]
    assert w0.energy == 100**2 + 200**2 + 300**2 + 0
    assert w0.zero_crossings == 2  # +100 -> -200 -> +300 -> 0 (0 is non-neg)
    assert w0.peak == 300
    assert w1.energy == 25 * 4 and w1.zero_crossings == 1 and w1.peak == 5


def test_gif_interlaced_decode():
    """Hand-built interlaced GIF (flag 0x40, spec row passes 8/8/4/2)
    reconstructs to the same pixels as the sequential encoding."""
    import struct as _s

    from konohadataplatform_spark.operators import gif_py as G

    pal = bytes(c for i in range(4) for c in (i * 80 % 256, i * 40 % 256, i))
    w, h = 4, 9
    idx = [(r * 3 + c) % 4 for r in range(h) for c in range(w)]
    px = bytes(c for i in idx for c in pal[3 * i:3 * i + 3])

    # interlaced row order per spec
    order = (list(range(0, h, 8)) + list(range(4, h, 8))
             + list(range(2, h, 4)) + list(range(1, h, 2)))
    inter_idx = [idx[r * w + c] for r in order for c in range(w)]

    out = bytearray(b"GIF89a")
    out += _s.pack("<HHBBB", w, h, 0x80 | 1, 0, 0)  # GCT, 4 colors
    out += pal
    out += b"\x2c" + _s.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlaced
    out.append(2)  # min code size
    payload = G._lzw_encode(2, inter_idx)
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out.append(0x3B)

    dec = G.decode_gif(bytes(out))
    assert dec["frames"][0]["pixels"] == px


def test_word_ngrams_short_docs_yield_empty(spark):
    """Docs shorter than n must give an empty gram array, not a slice
    error (review finding: sequence(1,0) is DESCENDING in Spark)."""
    from konohadataplatform_spark.operators.text import word_ngrams

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "one two three four five")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r.g
        for r in docs.select(
            "doc_id", word_ngrams(F.split("text", " "), 5).alias("g")
        ).collect()
    }
    assert out[1] == []
    assert out[2] == ["one two three four five"]


def test_canonicalize_collapses_stutter(spark):
    from konohadataplatform_spark.operators import text as TXO

    docs = spark.createDataFrame(
        [(1, "The the THE cat cat sat"), (2, "a b a b")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in TXO.canonicalize(docs).collect()}
    assert out[1].n_before == 6 and out[1].n_after == 3  # "the cat sat"
    assert out[2].n_before == 4 and out[2].n_after == 4  # non-adjacent kept
    import hashlib

    assert out[1].canonical_md5 == hashlib.md5(b"the cat sat").hexdigest()


def test_semantic_dedup_scale_knobs(spark):
    """The r5-verdict fix: bits and max_bucket are REAL parameters of
    the shipped code path. Raising bits only splits buckets (kept set
    can only grow — fewer cross-bucket pairs); the bucket cap skips
    pairing in oversized buckets (their members are all kept); out of
    range bits fail loudly."""
    import pytest as _pytest
    from pyspark.sql import Row

    emb = load_table(spark, SF_DIR, "embeddings")
    base = S.semantic_dedup(emb, bits=4, threshold=0.35)
    kept4 = {r.vec_id for r in base.collect() if r.kept}
    more = S.semantic_dedup(emb, bits=8, threshold=0.35)
    kept8 = {r.vec_id for r in more.collect() if r.kept}
    assert kept4 <= kept8  # more buckets -> strictly fewer pairs scored
    assert more.select("bucket").distinct().count() > 16

    # hot-bucket cap: 6 identical vectors all land in one bucket; with
    # max_bucket=5 the bucket skips pairing -> everything kept
    rows = [Row(vec_id=i, embedding=[1.0, 2.0, 3.0, 4.0]) for i in range(6)]
    rows += [Row(vec_id=10, embedding=[-1.0, -2.0, 3.0, 4.0])]
    tiny = spark.createDataFrame(rows)
    uncapped = S.semantic_dedup(tiny, bits=4, threshold=0.9)
    assert sum(1 for r in uncapped.collect() if not r.kept) == 5
    capped = S.semantic_dedup(tiny, bits=4, threshold=0.9, max_bucket=5)
    assert all(r.kept for r in capped.collect())
    # a generous cap changes nothing
    generous = S.semantic_dedup(tiny, bits=4, threshold=0.9, max_bucket=100)
    assert sum(1 for r in generous.collect() if not r.kept) == 5

    with _pytest.raises(ValueError, match="bits"):
        S.semantic_dedup(tiny, bits=0)
    with _pytest.raises(ValueError, match="bits"):
        S.semantic_dedup(tiny, bits=31)


def test_token_budget_pack_keeps_null_lang_docs(spark, tmp_path):
    """Review regression: the r6 two-phase join-back must be null-safe
    on lang — groupBy and window both treat NULL lang as its own
    group, so a null-rejecting equi-join would silently drop those
    documents (and NULL-text docs via a NULL shard key)."""
    from konohadataplatform_spark.queries.llmdata import QUERIES

    rows = [
        (1, "alpha beta", "en", "web", 10),
        (2, "gamma delta", None, "web", 11),   # NULL lang
        (3, None, "en", "web", 0),             # NULL text -> NULL pri
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = QUERIES["q_token_budget_pack"](spark, str(tmp_path)).collect()
    by_id = {r.doc_id: r for r in out}
    assert 2 in by_id and by_id[2].lang is None
    # NULL text: toks = size(split(NULL)) = -1? -> spark size(NULL) is
    # None with ansi off... whatever it yields, the row must not be
    # silently DROPPED by the join; presence or a NULL cum is accepted
    assert 1 in by_id


def test_semantic_index_incremental_matches_full_rebuild(spark, tmp_path):
    """The persisted semantic index is the ingest path: batch-adding
    the second half of the corpus must keep exactly the vectors a full
    one-shot semantic_dedup would keep (earlier-arrival-wins == the
    keep-lowest-id rule when ids arrive in order), with an O(|batch|)
    commit, never a corpus rescore."""
    from konohadataplatform_spark.catalog import SnapshotCatalog

    catalog = SnapshotCatalog(spark, str(tmp_path / "wh"))
    emb = load_table(spark, SF_DIR, "embeddings").orderBy("vec_id")
    ids = [r.vec_id for r in emb.select("vec_id").collect()]
    cut = ids[len(ids) // 2]
    first = emb.filter(F.col("vec_id") <= cut)
    second = emb.filter(F.col("vec_id") > cut)

    S.build_semantic_index(catalog, "corpus", first, bits=4, threshold=0.35)
    out = S.semantic_index_add(catalog, "corpus", second)
    batch_kept = {r.vec_id for r in out.collect() if r.kept}

    full = S.semantic_dedup(emb, bits=4, threshold=0.35)
    full_kept = {r.vec_id for r in full.collect() if r.kept}
    first_kept = {
        r.vec_id
        for r in S.semantic_dedup(first, bits=4, threshold=0.35).collect()
        if r.kept
    }
    assert first_kept | batch_kept == full_kept
    # the index now holds the whole corpus, flagged
    idx = catalog.read("corpus__semidx").collect()
    assert {r.vid for r in idx} == set(ids)
    assert {r.vid for r in idx if r.kept} == full_kept
    # re-adding the same batch finds everything duplicated
    again = S.semantic_index_add(catalog, "corpus", second)
    assert not any(r.kept for r in again.collect())


def test_semantic_index_add_respects_persisted_bucket_cap(spark, tmp_path):
    """Review regression: the build-time max_bucket persists in the
    table properties and the add-time gate counts the CURRENT
    population (index + batch) — an over-cap bucket skips pairing, so
    an identical new vector is still kept."""
    from pyspark.sql import Row

    from konohadataplatform_spark.catalog import SnapshotCatalog

    catalog = SnapshotCatalog(spark, str(tmp_path / "wh"))
    # 3 identical vectors, one bucket; cap=3 -> bucket fits at build
    base = spark.createDataFrame(
        [Row(vec_id=i, embedding=[1.0, 2.0, 3.0, 4.0]) for i in range(3)]
    )
    S.build_semantic_index(catalog, "c", base, bits=4, threshold=0.9,
                           max_bucket=3)
    props = catalog.table_properties("c__semidx")
    assert int(props["max_bucket"]) == 3
    # adding a 4th identical vector pushes population to 4 > cap:
    # pairing skipped -> kept, even though it duplicates the bucket
    out = S.semantic_index_add(
        catalog, "c",
        spark.createDataFrame([Row(vec_id=10, embedding=[1.0, 2.0, 3.0, 4.0])]),
    ).collect()
    assert out[0].kept is True
    # explicit override re-enables pairing for the next add
    out2 = S.semantic_index_add(
        catalog, "c",
        spark.createDataFrame([Row(vec_id=11, embedding=[1.0, 2.0, 3.0, 4.0])]),
        max_bucket=100,
    ).collect()
    assert out2[0].kept is False


def _encode_png_variant(width, height, depth, color_type, rows,
                        plte=None, trns=None, interlace=0):
    """Test-side PNG encoder for the widened decode matrix: rows is
    height lists of per-pixel channel samples; packs sub-byte depths
    MSB-first, 16-bit big-endian, filter 0 everywhere, optional Adam7."""
    import struct as _struct
    import zlib as _zlib

    from konohadataplatform_spark.operators.multimodal import (
        _ADAM7,
        _png_chunk,
        PNG_SIG,
    )

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]

    def pack_row(samples):
        if depth == 8:
            return bytes(samples)
        if depth == 16:
            return b"".join(_struct.pack(">H", s) for s in samples)
        per_byte = 8 // depth
        out = bytearray()
        for i in range(0, len(samples), per_byte):
            b = 0
            chunk = samples[i:i + per_byte]
            for k, s in enumerate(chunk):
                b |= s << ((per_byte - 1 - k) * depth)
            out.append(b)
        return bytes(out)

    raw = bytearray()
    passes = _ADAM7 if interlace else [(0, 0, 1, 1)]
    for x0, y0, dx, dy in passes:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        for j in range(ph):
            y = y0 + j * dy
            samples = []
            for i in range(pw):
                x = x0 + i * dx
                samples.extend(rows[y][x * channels:(x + 1) * channels])
            raw += b"\x00" + pack_row(samples)
    ihdr = _struct.pack(">IIBBBBB", width, height, depth, color_type,
                        0, 0, interlace)
    out = PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", bytes(plte))
    if trns is not None:
        out += _png_chunk(b"tRNS", bytes(trns))
    out += _png_chunk(b"IDAT", _zlib.compress(bytes(raw)))
    out += _png_chunk(b"IEND", b"")
    return out


def test_png_widened_matrix_palette_subbyte_16bit_adam7():
    """r6 codec-matrix widening: palette (+tRNS alpha), 4-bit gray,
    16-bit RGB (high-byte emission), and Adam7 interlace all decode
    natively; gray+alpha stays a loud DecodeNotAvailable."""
    from konohadataplatform_spark.operators.multimodal import (
        DecodeNotAvailable,
        decode_png,
    )

    # palette 3x2, indices 0..2, tRNS alpha on index 1
    pal = [255, 0, 0, 0, 255, 0, 0, 0, 255]
    rows = [[0, 1, 2], [2, 1, 0]]
    d = decode_png(_encode_png_variant(3, 2, 8, 3, rows, plte=pal))
    assert (d["width"], d["height"], d["channels"]) == (3, 2, 3)
    assert d["pixels"][:9] == bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    da = decode_png(_encode_png_variant(3, 2, 8, 3, rows, plte=pal,
                                        trns=[255, 128]))
    assert da["channels"] == 4
    assert da["pixels"][:4] == bytes([255, 0, 0, 255])   # idx0, opaque
    assert da["pixels"][4:8] == bytes([0, 255, 0, 128])  # idx1, a=128

    # 4-bit gray 5x2: value v scales to v*255//15
    g = [[0, 5, 10, 15, 7], [15, 0, 3, 12, 1]]
    dg = decode_png(_encode_png_variant(5, 2, 4, 0, g))
    assert dg["channels"] == 1 and dg["bit_depth"] == 4
    assert list(dg["pixels"][:5]) == [v * 255 // 15 for v in g[0]]

    # 2-bit palette (sub-byte indexed)
    d2 = decode_png(_encode_png_variant(3, 2, 2, 3, rows, plte=pal))
    assert d2["pixels"] == d["pixels"]

    # 16-bit RGB 2x2: high byte comes back
    r16 = [[0x1234, 0xFF00, 0x0001, 0x8000, 0x7FFF, 0xABCD],
           [0, 0xFFFF, 0x5555, 0x1000, 0x2000, 0x3000]]
    d16 = decode_png(_encode_png_variant(2, 2, 16, 2, r16))
    assert d16["bit_depth"] == 16 and d16["channels"] == 3
    assert list(d16["pixels"][:6]) == [0x12, 0xFF, 0x00, 0x80, 0x7F, 0xAB]

    # Adam7 interlaced 8-bit RGB 9x9 == its non-interlaced twin
    rgb = [[(x * 7 + y * 31 + c) % 256 for x in range(9) for c in range(3)]
           for y in range(9)]
    plain = decode_png(_encode_png_variant(9, 9, 8, 2, rgb))
    inter = decode_png(_encode_png_variant(9, 9, 8, 2, rgb, interlace=1))
    assert inter["pixels"] == plain["pixels"]

    # Adam7 + palette + sub-byte together
    prow = [[(x + y) % 3 for x in range(9)] for y in range(9)]
    pi = decode_png(_encode_png_variant(9, 9, 2, 3, prow, plte=pal,
                                        interlace=1))
    pp = decode_png(_encode_png_variant(9, 9, 2, 3, prow, plte=pal))
    assert pi["pixels"] == pp["pixels"]

    # r7: gray+alpha (color_type 4) closes the PNG matrix — the last
    # DecodeNotAvailable boundary is gray/RGB tRNS color keys
    import struct as _struct
    import zlib as _zlib

    from konohadataplatform_spark.operators.multimodal import (
        PNG_SIG,
        _png_chunk,
    )

    ga = (
        PNG_SIG
        + _png_chunk(b"IHDR", _struct.pack(">IIBBBBB", 1, 1, 8, 4, 0, 0, 0))
        + _png_chunk(b"IDAT", _zlib.compress(b"\x00\x80\xff"))
        + _png_chunk(b"IEND", b"")
    )
    dga = decode_png(ga)
    assert (dga["channels"], dga["bpp"]) == (2, 16)
    assert dga["pixels"] == bytes([0x80, 0xFF])


def test_png_gray_alpha_matrix():
    """r7: color_type 4 (gray+alpha) across the whole matrix — 8-bit
    fast path, 16-bit high-byte emission, Adam7 interlace equivalence,
    and every scanline filter via the encode helper."""
    from konohadataplatform_spark.operators.multimodal import decode_png

    # 8-bit 3x2 (fast byte path): (gray, alpha) pairs round-trip
    rows = [[10, 255, 20, 128, 30, 0], [200, 1, 100, 2, 50, 3]]
    d = decode_png(_encode_png_variant(3, 2, 8, 4, rows))
    assert (d["channels"], d["bit_depth"], d["bpp"]) == (2, 8, 16)
    assert list(d["pixels"]) == rows[0] + rows[1]

    # 16-bit: high bytes come back
    r16 = [[0x1234, 0xFF00, 0x8000, 0x0001], [0x0000, 0xFFFF, 0x7FFF, 0xABCD]]
    d16 = decode_png(_encode_png_variant(2, 2, 16, 4, r16))
    assert (d16["channels"], d16["bit_depth"]) == (2, 16)
    assert list(d16["pixels"]) == [0x12, 0xFF, 0x80, 0x00,
                                   0x00, 0xFF, 0x7F, 0xAB]

    # Adam7 interlaced == non-interlaced twin (9x9 hits all 7 passes)
    ga = [[(x * 11 + y * 29 + c * 3) % 256
           for x in range(9) for c in range(2)] for y in range(9)]
    plain = decode_png(_encode_png_variant(9, 9, 8, 4, ga))
    inter = decode_png(_encode_png_variant(9, 9, 8, 4, ga, interlace=1))
    assert inter["pixels"] == plain["pixels"]


def test_png_general_path_size_guard():
    """Oversized general-path images fail loudly instead of burning
    executor-minutes in the serial filter loops (r6 advice)."""
    import struct as _struct
    import zlib as _zlib

    import pytest as _pytest

    from konohadataplatform_spark.operators.multimodal import (
        DecodeNotAvailable,
        PNG_SIG,
        _png_chunk,
        decode_png,
    )

    big = (
        PNG_SIG
        + _png_chunk(b"IHDR",
                     _struct.pack(">IIBBBBB", 100_000, 100_000, 16, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", _zlib.compress(b"\x00"))
        + _png_chunk(b"IEND", b"")
    )
    with _pytest.raises(DecodeNotAvailable, match="cap"):
        decode_png(big)


def test_jpeg_progressive_decodes_bit_identical_to_baseline():
    """r6: progressive (SOF2) decode — DC first/refinement, AC spectral
    bands with successive approximation, EOB runs, buffered correction
    bits — accumulates to EXACTLY the coefficients the baseline stream
    carries, so pixels match the baseline decode bit for bit, across
    subsampling modes and non-multiple-of-8 dimensions (partial MCUs +
    the used-vs-padded block grid distinction)."""
    import numpy as np

    from konohadataplatform_spark.operators import jpeg_py as J

    rng = np.random.RandomState(7)
    for (w, h) in ((19, 13), (8, 8), (33, 9)):
        rgb = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()
        for sub in ("444", "422", "420"):
            base = J.decode_jpeg(J.encode_jpeg(w, h, rgb, subsampling=sub))
            prog = J.decode_jpeg(
                J.encode_jpeg_progressive(w, h, rgb, subsampling=sub)
            )
            assert prog["width"] == w and prog["height"] == h
            assert prog["pixels"] == base["pixels"], (w, h, sub)


def test_jpeg_progressive_via_decode_image_dispatch():
    """The multimodal dispatcher routes progressive JPEGs through the
    same decode path (SOF2 is no longer a DecodeNotAvailable)."""
    import numpy as np

    from konohadataplatform_spark.operators import jpeg_py as J

    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, size=(10, 12, 3), dtype=np.uint8).tobytes()
    out = M.decode_image(J.encode_jpeg_progressive(12, 10, rgb))
    assert (out["width"], out["height"], out["channels"]) == (12, 10, 3)


def test_jpeg_progressive_gradient_quality():
    """Sanity beyond self-consistency: a smooth gradient survives the
    progressive round trip within DCT rounding error (identity quant),
    i.e. the scan script actually carries ALL the spectral content."""
    import numpy as np

    from konohadataplatform_spark.operators import jpeg_py as J

    w, h = 24, 16
    rgb = bytes(
        int(255 * ((x / (w - 1)) * 0.5 + (y / (h - 1)) * 0.5))
        for y in range(h) for x in range(w) for _c in range(3)
    )
    out = J.decode_jpeg(J.encode_jpeg_progressive(w, h, rgb))
    a = np.frombuffer(rgb, np.uint8).astype(int)
    b = np.frombuffer(out["pixels"], np.uint8).astype(int)
    assert np.abs(a - b).max() <= 3  # DCT float rounding only


def test_semantic_index_stats_maintained_incrementally(spark, tmp_path):
    """r7 verdict task: the skew gate's bucket populations come from
    the incrementally-maintained __semidx_stats table (metadata-sized),
    not a per-add scan of the index. Stats must track actual bucket
    populations across builds, adds, and idempotent re-adds, and
    self-repair when missing (pre-stats index)."""
    from pyspark.sql import Row

    from konohadataplatform_spark.catalog import SnapshotCatalog

    catalog = SnapshotCatalog(spark, str(tmp_path / "wh"))
    emb = load_table(spark, SF_DIR, "embeddings").orderBy("vec_id")
    ids = [r.vec_id for r in emb.select("vec_id").collect()]
    cut = ids[len(ids) // 2]
    first = emb.filter(F.col("vec_id") <= cut)
    second = emb.filter(F.col("vec_id") > cut)

    def actual_counts():
        return {
            r.bucket: r.n
            for r in catalog.read("corpus__semidx")
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
        }

    def stats_counts():
        return {r.bucket: r.n
                for r in catalog.read("corpus__semidx_stats").collect()}

    S.build_semantic_index(catalog, "corpus", first, bits=4, threshold=0.35)
    assert stats_counts() == actual_counts()
    S.semantic_index_add(catalog, "corpus", second)
    assert stats_counts() == actual_counts()
    # idempotent re-add: no stats drift
    S.semantic_index_add(catalog, "corpus", second)
    assert stats_counts() == actual_counts()
    # repair path: a pre-stats index (stats table missing) rebuilds it
    # once, then stays incremental
    import shutil

    shutil.rmtree(str(tmp_path / "wh" / "corpus__semidx_stats"))
    S.semantic_index_add(
        catalog, "corpus",
        spark.createDataFrame(
            [Row(vec_id=10_000_000, embedding=[1.0] * 8)]
        ),
    )
    assert stats_counts() == actual_counts()


def test_png_trns_color_key():
    """r7: gray/RGB tRNS transparent-color keys close the LAST PNG
    boundary — a pixel matching the key on every channel (compared at
    source depth) gets alpha 0, and the output gains an alpha
    channel."""
    import struct as _s
    import zlib as _z

    from konohadataplatform_spark.operators.multimodal import (
        PNG_SIG,
        _png_chunk,
        decode_png,
    )

    # 8-bit gray 3x1, key = 0x80: middle pixel transparent
    keyed = (
        PNG_SIG
        + _png_chunk(b"IHDR", _s.pack(">IIBBBBB", 3, 1, 8, 0, 0, 0, 0))
        + _png_chunk(b"tRNS", _s.pack(">H", 0x80))
        + _png_chunk(b"IDAT", _z.compress(b"\x00\x10\x80\xf0"))
        + _png_chunk(b"IEND", b"")
    )
    d = decode_png(keyed)
    assert (d["channels"], d["bpp"]) == (2, 16)
    assert list(d["pixels"]) == [0x10, 255, 0x80, 0, 0xF0, 255]

    # 8-bit RGB 2x1, key = (1,2,3): first pixel transparent, a pixel
    # matching on only some channels stays opaque
    keyed_rgb = (
        PNG_SIG
        + _png_chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0))
        + _png_chunk(b"tRNS", _s.pack(">HHH", 1, 2, 3))
        + _png_chunk(b"IDAT", _z.compress(b"\x00" + bytes([1, 2, 3, 1, 2, 9])))
        + _png_chunk(b"IEND", b"")
    )
    dr = decode_png(keyed_rgb)
    assert dr["channels"] == 4
    assert list(dr["pixels"]) == [1, 2, 3, 0, 1, 2, 9, 255]

    # 16-bit gray: key compares at SOURCE depth — 0x8000 and 0x8001
    # both emit high byte 0x80, but only the exact key is transparent
    keyed16 = (
        PNG_SIG
        + _png_chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 1, 16, 0, 0, 0, 0))
        + _png_chunk(b"tRNS", _s.pack(">H", 0x8000))
        + _png_chunk(b"IDAT", _z.compress(b"\x00" + _s.pack(">HH", 0x8000, 0x8001)))
        + _png_chunk(b"IEND", b"")
    )
    d16 = decode_png(keyed16)
    assert d16["channels"] == 2 and d16["bit_depth"] == 16
    assert list(d16["pixels"]) == [0x80, 0, 0x80, 255]

    # 4-bit gray + Adam7-free: sub-byte key
    keyed4 = (
        PNG_SIG
        + _png_chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 1, 4, 0, 0, 0, 0))
        + _png_chunk(b"tRNS", _s.pack(">H", 5))
        + _png_chunk(b"IDAT", _z.compress(b"\x00\x5f"))
        + _png_chunk(b"IEND", b"")
    )
    d4 = decode_png(keyed4)
    assert d4["channels"] == 2
    assert list(d4["pixels"]) == [5 * 255 // 15, 0, 255, 255]


def test_prebucketed_candidates_backfill_mode_same_pairs(spark, tmp_path):
    """broadcast_new=False (backfill mode) must produce the identical
    candidate set through shuffle joins — the knob changes the plan,
    never the answer."""
    from konohadataplatform_spark.catalog import SnapshotCatalog
    from konohadataplatform_spark.streaming.ingest import DocIngestPipeline

    docs = load_table(spark, SF_DIR, "documents")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    pipe = DocIngestPipeline(spark, cat, "c", quality_min=0.0)
    pipe.apply_batch(
        half.select("doc_id", "text", "lang", "source",
                    F.col("n_chars")),
        batch_id=0,
    )
    corpus_buckets = cat.read(pipe.buckets_table)
    new_index = D.minhash_index(rest, "text", "doc_id")
    bc = _pairs(D.prebucketed_candidates(corpus_buckets, new_index))
    sj = _pairs(D.prebucketed_candidates(corpus_buckets, new_index,
                                         broadcast_new=False))
    assert bc == sj and bc  # same pairs, and the fixture collides


def test_pq_adc_recall_and_determinism(spark):
    """PQ/ADC (the oracle-checked q_ann_pq path): useful recall vs
    exact L2 brute force on the SAME integer grid, and bit-stable
    across runs + input repartitionings (every training step is
    order-independent integer math)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    runs = [
        {(r.query_id, r.neighbor_id, r.pq_dist, r.knn_rank)
         for r in S.ann_pq_topk_portable(
             e, queries, k=5, m=4, k_codes=8, iters=2).collect()}
        for e in (emb, emb.repartition(3), emb)
    ]
    assert runs[0] == runs[1] == runs[2]
    # exact-L2 top-20 on the same grid as the recall reference (ADC is
    # lossy by design: k_codes=8 keeps only 8 prototypes per subspace)
    from pyspark.sql.window import Window as W

    grid = F.expr(
        "transform(cast(embedding as array<double>), "
        "x -> cast(floor((x + 2.0d) * 1000000.0d) as long))"
    )
    g = emb.select("vec_id", grid.alias("q"))
    qg = g.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
    )
    d = F.expr(
        "aggregate(zip_with(q, qq, (x, y) -> (x - y) * (x - y)), "
        "0L, (acc, v) -> acc + v)"
    )
    exact20 = (
        g.crossJoin(qg)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                d.alias("dist"))
        .withColumn("rk", F.row_number().over(
            W.partitionBy("query_id").orderBy("dist", "neighbor_id")))
        .filter(F.col("rk") <= 20)
    )
    exact = {(r.query_id, r.neighbor_id) for r in exact20.collect()}
    approx = {(q, n) for q, n, _d, _rk in runs[0]}
    recall = len(exact & approx) / (8 * 5)
    assert recall >= 0.5, f"PQ/ADC top-5-in-exact-top-20 too low: {recall}"


def test_pq_empty_cluster_drop(spark):
    """A codeword that loses all members after a Lloyd update vanishes
    from the codebook (SUM//COUNT has no row to emit); remaining codes
    still cover every vector, and quantize output stays total: every
    input id appears exactly once with m codes."""
    from pyspark.sql import Row

    # 8 seed ids but only 2 genuinely distinct clusters -> most seed
    # codes collapse onto the two centers and lose their members
    rows = [
        Row(vec_id=i, embedding=[float(1 if i % 2 else -1)] * 64)
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows)
    out = S.pq_quantize_portable(emb, m=4, k_codes=8, iters=2).collect()
    assert sorted(r.vec_id for r in out) == list(range(40))
    assert all(len(r.codes) == 4 and r.pq_err == 0 for r in out)
    # exactly the two surviving prototypes per subspace
    distinct_codes = {tuple(r.codes) for r in out}
    assert len(distinct_codes) == 2


def test_mmr_diversifies_vs_pure_relevance(spark):
    """A tight cluster near the query + one far-but-distinct point:
    pure top-3 keeps the cluster; MMR must swap in the distinct one."""
    import pyspark.sql.functions as F

    from konohadataplatform_spark.operators.similarity import (
        mmr_candidates_grid,
        mmr_select_portable,
    )

    def vec(x, y):
        return [float(x), float(y)] + [0.0] * 62

    rows = [
        (0, vec(0, 0)),      # query
        (1, vec(0.01, 0)),   # cluster
        (2, vec(0.011, 0)),
        (3, vec(0.012, 0)),
        (4, vec(1.5, 1.5)),  # distinct
    ]
    emb = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    cands = mmr_candidates_grid(emb, emb.filter(F.col("vec_id") == 0), m=4)
    out = mmr_select_portable(cands, k=3, rel_weight=1, div_weight=5)
    picked = [r["neighbor_id"] for r in out.orderBy("mmr_rank").collect()]
    assert picked[0] == 1          # round 1: pure relevance
    assert 4 in picked             # diversity pulls in the far point
    assert len(picked) == len(set(picked)) == 3


def test_mmr_handles_small_candidate_sets(spark):
    from konohadataplatform_spark.operators.similarity import (
        mmr_select_portable,
    )

    cands = spark.createDataFrame(
        [(1, 10, 5, [0, 0]), (1, 11, 7, [9, 9])],
        "query_id: long, cand_id: long, dq: long, cq: array<long>",
    )
    out = mmr_select_portable(cands, k=5).collect()
    assert len(out) == 2  # k > n: selects everything once, no crash


def test_exact_substring_spans_islands(spark):
    """Two docs share one long phrase: the overlapping duplicated
    shingles must merge into ONE span covering the phrase, not one
    span per shingle position."""
    from konohadataplatform_spark.operators.dedup import (
        exact_substring_spans,
    )

    shared = "0123456789" * 4  # 40 chars -> 11 dup positions at k=30
    docs = spark.createDataFrame(
        [
            (1, "xxxxxA" + shared + "Byyyyy"),
            (2, "zz" + shared + "qqqqqqqqqq"),
            (3, "totally unrelated text that is long enough ok!"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r.asDict() for r in
            exact_substring_spans(docs, k=30).collect()}
    assert rows[1]["n_dup_spans"] == 1
    assert rows[1]["dup_chars"] == 40  # the merged island spans the phrase
    assert rows[1]["longest_span"] == 40
    assert rows[2]["n_dup_spans"] == 1 and rows[2]["dup_chars"] == 40
    assert rows[3]["n_dup_spans"] == 0 and rows[3]["dup_chars"] == 0


def test_exact_substring_short_docs_clean(spark):
    from konohadataplatform_spark.operators.dedup import (
        exact_substring_spans,
    )

    docs = spark.createDataFrame(
        [(1, "short"), (2, "short")], ["doc_id", "text"]
    )
    rows = exact_substring_spans(docs, k=30).collect()
    assert {r["doc_id"] for r in rows} == {1, 2}
    assert all(r["n_dup_spans"] == 0 for r in rows)


def test_chunk_dedup_rewrite_fixture(spark):
    """First-occurrence-wins semantics on a hand-built corpus: a full
    duplicate doc rewrites to '', a partial overlap loses only the
    repeated chunk, and surviving chunks keep their original order."""
    a = " ".join(f"a{i}" for i in range(64))          # chunks A0, A1
    b_words = [f"b{i}" for i in range(32)]
    b = " ".join(b_words + [f"a{i}" for i in range(32)])  # B0 + copy of A0
    docs = spark.createDataFrame(
        [(1, a), (2, a), (3, b)], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r
        for r in D.chunk_dedup_rewrite(docs, chunk_words=32).collect()
    }
    assert out[1].n_chunks == 2 and out[1].n_kept == 2
    assert out[1].kept_text == a
    # doc 2 is a byte-identical copy of doc 1 → everything deleted
    assert out[2].n_chunks == 2 and out[2].n_kept == 0
    assert out[2].kept_text == ""
    # doc 3 keeps its unique first chunk, loses the copied A0 chunk
    assert out[3].n_chunks == 2 and out[3].n_kept == 1
    assert out[3].kept_text == " ".join(b_words)


def test_chunk_dedup_rewrite_order_preserved(spark):
    """A doc that loses a MIDDLE chunk re-joins its survivors in the
    original order (winner markers re-sort per doc)."""
    shared = " ".join(f"s{i}" for i in range(32))
    head = " ".join(f"h{i}" for i in range(32))
    tail = " ".join(f"t{i}" for i in range(32))
    docs = spark.createDataFrame(
        [(1, shared), (2, f"{head} {shared} {tail}")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r
        for r in D.chunk_dedup_rewrite(docs, chunk_words=32).collect()
    }
    assert out[1].kept_text == shared
    assert out[2].n_kept == 2
    assert out[2].kept_text == f"{head} {tail}"


def test_chunk_dedup_rewrite_total_mass_conserved(spark):
    """Across the real corpus every distinct chunk digest survives
    exactly once: sum(n_kept) == corpus distinct-chunk count."""
    docs = load_table(spark, SF_DIR, "documents")
    out = D.chunk_dedup_rewrite(docs)
    kept_total = out.agg(F.sum("n_kept")).first()[0]
    w = F.split(F.trim(F.col("text")), " ")
    distinct_chunks = (
        docs.select(F.col("doc_id"), w.alias("w"))
        .select(F.explode(F.expr(
            "sequence(0, cast((size(w) + 31) / 32 as int) - 1)")).alias("i"), "w")
        .select(F.md5(F.array_join(F.expr("slice(w, i * 32 + 1, 32)"), " ")).alias("d"))
        .distinct()
        .count()
    )
    assert kept_total == distinct_chunks


def test_chunk_dedup_rewrite_plan_no_window_no_cartesian(spark):
    """The rewrite's 100 TB contract: winner selection is a packed-MIN
    aggregate (no per-digest window, no join back to the chunk
    relation), reassembly joins on unique doc_id — so the plan must
    have zero Windows and zero cartesian products, and the chunk-text
    relation must never feed a sort."""
    docs = load_table(spark, SF_DIR, "documents")
    out = D.chunk_dedup_rewrite(docs)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_audio_utterances_islands(spark):
    """Constructed clip: loud-quiet-loud-loud-quiet windows (window=4)
    must yield two utterances — a single window and a merged two-window
    run — with exact integer energies."""
    loud = [1000, -1000, 1000, -1000]      # energy 4_000_000
    quiet = [1, -1, 1, -1]                 # energy 4
    samples = loud + quiet + loud + loud + quiet
    media = spark.createDataFrame(
        [(1, M.encode_wav(samples, 8000))], "media_id: long, content: binary"
    )
    out = sorted(
        (r.utt_idx, r.start_win, r.end_win, r.n_windows, r.utt_energy)
        for r in M.audio_utterances(media, window=4).collect()
    )
    assert out == [
        (0, 0, 0, 1, 4_000_000),
        (1, 2, 3, 2, 8_000_000),
    ]


def test_audio_utterances_silent_clip_has_none(spark):
    """A constant-energy clip has no above-mean window: zero rows."""
    samples = [5, -5, 5, -5] * 4
    media = spark.createDataFrame(
        [(1, M.encode_wav(samples, 8000))], "media_id: long, content: binary"
    )
    assert M.audio_utterances(media, window=4).count() == 0


def test_chunk_dedup_rewrite_null_text_is_zero_chunk_doc(spark):
    """Review regression: a NULL-text doc must surface as (0, 0, '')
    and MUST NOT corrupt its neighbors — the unguarded sequence(0, -1)
    exploded to [0, -1], whose packed key doc_id*1e6 - 1 unpacked to a
    phantom winner marker on the PREVIOUS doc at i=999999."""
    docs = spark.createDataFrame(
        [(4, "hello world"), (5, None)], "doc_id: long, text: string"
    )
    out = {r.doc_id: r for r in D.chunk_dedup_rewrite(docs).collect()}
    assert (out[4].n_chunks, out[4].n_kept, out[4].kept_text) == (
        1, 1, "hello world"
    )
    assert (out[5].n_chunks, out[5].n_kept, out[5].kept_text) == (0, 0, "")


def test_centroid_outliers_finds_planted_noise(spark):
    """A vector far from its tight class cluster must rank far_rank=1
    for that label, with dist2 >> the cluster members'."""
    rows = [(i, [1.0, 1.0, 0.0, 0.0], 7) for i in range(10)]
    rows.append((99, [-5.0, 4.0, 3.0, -2.0], 7))     # planted outlier
    rows += [(100 + i, [0.0, 0.0, 1.0, 1.0], 8) for i in range(5)]
    emb = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>, label: int"
    )
    out = {
        (r.label, r.far_rank): r
        for r in S.centroid_outliers(emb, topk=2).collect()
    }
    assert out[(7, 1)].vec_id == 99
    assert out[(7, 1)].dist2 > 10 * out[(7, 2)].dist2
    # the uniform label-8 cluster: all dist2 identical, ids break ties
    assert out[(8, 1)].vec_id == 100 and out[(8, 1)].dist2 == 0.0


# -- exact-substring span REMOVAL (Lee 2022 rewrite) ------------------------


def test_exact_substring_rewrite_fixture(spark):
    """First-occurrence-wins span removal: the doc that introduced the
    span keeps it, a later doc embedding the same span loses exactly
    those characters, unique/short/NULL docs pass through untouched."""
    span = "the quick brown fox jumps over the lazy dog tonight"  # 51 chars
    docs = spark.createDataFrame(
        [
            (1, span),
            (2, f"HEAD {span} TAIL"),
            (3, "totally unique text that shares nothing with anything!!"),
            (4, None),
            (5, "short"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r for r in D.exact_substring_rewrite(docs, k=30).collect()
    }
    assert (out[1].n_cut_spans, out[1].kept_text) == (0, span)
    assert out[2].n_cut_spans == 1
    assert out[2].kept_text == "HEAD  TAIL"
    assert out[2].removed_chars == len(span)
    assert (out[3].n_cut_spans, out[3].kept_text.startswith("totally")) == (
        0, True
    )
    assert out[4].kept_text is None and out[4].removed_chars == 0
    assert (out[5].n_cut_spans, out[5].kept_text) == (0, "short")


def test_exact_substring_rewrite_overlapping_runs_merge(spark):
    """Two duplicated windows 15 chars apart in the same doc produce
    cut spans that would OVERLAP ([0,29] and [15,44]) — the gap-aware
    island merge must fuse them into ONE span so removed_chars stays
    exact and mass is conserved (the naive profile-islands grouping
    would report 60 removed chars of a 45-char doc)."""
    a = "0123456789abcdefghijklmnopqrst"            # 30 chars
    b = a[15:30] + "XYZWVUTSRQPONML"                # 30 chars, B[0:15]=A[15:30]
    c = a + b[15:30]                                # 45 chars: C[0:30]=A, C[15:45]=B
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    out = {
        r.doc_id: r for r in D.exact_substring_rewrite(docs, k=30).collect()
    }
    assert (out[1].n_cut_spans, out[1].kept_text) == (0, a)
    assert (out[2].n_cut_spans, out[2].kept_text) == (0, b)
    assert out[3].n_cut_spans == 1
    assert out[3].removed_chars == 45
    assert out[3].kept_text == ""


def test_exact_substring_rewrite_mass_conserved_corpus(spark):
    """On the real corpus: length(text) = removed_chars +
    length(kept_text) for every document, and at least one doc is cut
    (the testdata plants near-duplicates)."""
    docs = load_table(spark, SF_DIR, "documents")
    out = D.exact_substring_rewrite(docs, k=30)
    bad = out.join(
        docs.select("doc_id", "text"), "doc_id"
    ).where(
        F.col("text").isNotNull()
        & (
            F.length("text")
            != F.col("removed_chars") + F.length("kept_text")
        )
    )
    assert bad.count() == 0
    assert out.where(F.col("n_cut_spans") > 0).count() > 0


def test_exact_substring_rewrite_negative_doc_id_loud(spark):
    """A negative doc_id would silently corrupt ANOTHER doc's packed
    winner key — the operator must fail loudly instead."""
    import pytest
    from py4j.protocol import Py4JJavaError

    docs = spark.createDataFrame(
        [(-1, "x" * 40), (2, "y" * 40)], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="packed-key bound|USER_RAISED"):
        D.exact_substring_rewrite(docs, k=30).collect()


def test_exact_substring_rewrite_plan_no_cartesian(spark):
    """Scale contract: winner selection is a packed-MIN aggregate and
    reassembly joins on unique doc_id — no cartesian product anywhere;
    the only Windows partition by doc_id (bounded by one document)."""
    docs = load_table(spark, SF_DIR, "documents")
    out = D.exact_substring_rewrite(docs, k=30)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan


# -- ANN-probed MMR candidate stage ----------------------------------------


def test_mmr_candidates_grid_broadcasts_queries(spark):
    """Candidate-stage scale contract: the query side must ride a
    broadcast so the corpus is scanned, never exchanged, before the
    per-query top-m window (an un-hinted cross join can pick the tiny
    query relation as the stream side and shuffle the corpus)."""
    from konohadataplatform_spark.operators.similarity import (
        mmr_candidates_grid,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    out = mmr_candidates_grid(emb, emb.filter(F.col("vec_id") < 8), m=8)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_mmr_candidates_ivf_full_probe_parity(spark):
    """nprobe = n_cells probes every cell, so the IVF candidate stage
    must be BIT-IDENTICAL to the brute-force grid stage — and feeding
    both into mmr_select_portable must pick the same neighbors."""
    from konohadataplatform_spark.operators.similarity import (
        mmr_candidates_grid,
        mmr_candidates_ivf,
        mmr_select_portable,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    brute = mmr_candidates_grid(emb, q, m=8)
    ivf = mmr_candidates_ivf(emb, q, m=8, n_cells=4, nprobe=4, iters=2)
    key = lambda r: (r.query_id, r.cand_id, r.dq, tuple(r.cq))
    assert sorted(map(key, brute.collect())) == sorted(map(key, ivf.collect()))
    sel = lambda df: sorted(
        (r.query_id, r.mmr_rank, r.neighbor_id, r.mmr_score)
        for r in mmr_select_portable(df, k=3).collect()
    )
    assert sel(brute) == sel(ivf)


def test_mmr_candidates_ivf_pruned_recall(spark):
    """With nprobe < n_cells the probe skips cells, but recall of the
    brute-force top-m on the fixture must stay high (clustered
    embeddings: the nearest cells hold the near neighbors)."""
    from konohadataplatform_spark.operators.similarity import (
        mmr_candidates_grid,
        mmr_candidates_ivf,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    brute = {
        (r.query_id, r.cand_id)
        for r in mmr_candidates_grid(emb, q, m=8).collect()
    }
    ivf = {
        (r.query_id, r.cand_id)
        for r in mmr_candidates_ivf(
            emb, q, m=8, n_cells=8, nprobe=4, iters=2
        ).collect()
    }
    assert len(ivf & brute) / len(brute) >= 0.6


# ---------------------------------------------------------------------------
# r9: quality-based cluster representatives
# ---------------------------------------------------------------------------


def test_cluster_best_representative_picks_max_quality(spark):
    # 40-word base: one edited word changes 3 of 38 word-trigrams, so
    # Jaccard = 35/41 ~= 0.854 >= the 0.8 default threshold (the old
    # 20-word fixture gave 15/21 ~= 0.714 < 0.8 -- impossible to pass).
    base = " ".join(f"word{i:02d}" for i in range(40))
    near = base.replace("word20", "wordXX")  # near-dup of base
    other = "one two three four five six seven eight nine ten " * 2
    docs = spark.createDataFrame(
        [(1, base, 200), (2, near, 500), (3, other.strip(), 90)],
        "doc_id long, text string, n_chars long",
    )
    out = {r.cluster_rep: r for r in
           D.cluster_best_representative(docs).collect()}
    # docs 1+2 cluster under rep 1; doc 2 wins on n_chars
    assert out[1].n_members == 2 and out[1].kept_doc_id == 2
    assert out[1].kept_quality == 500
    # singleton keeps itself
    assert out[3].n_members == 1 and out[3].kept_doc_id == 3


def test_cluster_best_representative_accepts_precomputed_clusters(spark):
    """r10: passing a precomputed (doc_id, cluster_rep) relation skips
    the internal Jaccard join + connected components and returns the
    identical result — the compositional fast path."""
    base = " ".join(f"word{i:02d}" for i in range(40))
    near = base.replace("word20", "wordXX")
    docs = spark.createDataFrame(
        [(1, base, 200), (2, near, 500), (3, "x y z a b c d e f g", 90)],
        "doc_id long, text string, n_chars long",
    )
    pre = D.dedup_clusters(docs)
    full = sorted(map(tuple, D.cluster_best_representative(docs).collect()))
    fast = sorted(map(tuple,
                      D.cluster_best_representative(
                          docs, clusters=pre).collect()))
    assert full == fast
    # and a hand-built clusters relation is honored verbatim (no
    # re-derivation): force 1+3 together despite zero text overlap
    forced = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 1)], "doc_id long, cluster_rep long"
    )
    out = {r.cluster_rep: r for r in D.cluster_best_representative(
        docs, clusters=forced).collect()}
    assert out[1].n_members == 2 and out[1].kept_doc_id == 1


def test_cluster_best_representative_tie_breaks_lowest_id(spark):
    t = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15"
    docs = spark.createDataFrame(
        [(7, t, 100), (3, t, 100)], "doc_id long, text string, n_chars long"
    )
    r = D.cluster_best_representative(docs).collect()[0]
    assert r.kept_doc_id == 3 and r.kept_quality == 100


def test_cluster_best_representative_bounds_are_loud(spark):
    import pytest

    docs = spark.createDataFrame(
        [(1, "a b c d e", -5)], "doc_id long, text string, n_chars long"
    )
    with pytest.raises(Exception, match="packed-argmax bounds"):
        D.cluster_best_representative(docs).collect()


# ---------------------------------------------------------------------------
# r9: fuzzy cross-corpus decontamination
# ---------------------------------------------------------------------------


def test_cross_corpus_contamination_finds_planted_overlap(spark):
    bench_text = ("the capital of france is paris and the capital of "
                  "italy is rome and the capital of spain is madrid")
    contaminated = bench_text.replace("madrid", "sevilla")  # near-verbatim
    clean = "completely unrelated words about spark shuffles and joins " * 2
    corpus = spark.createDataFrame(
        [(10, contaminated), (11, clean.strip()), (12, bench_text)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1, bench_text)], "doc_id long, text string"
    )
    out = D.cross_corpus_contamination(corpus, bench, threshold=0.8)
    rows = {(r.doc_id, r.bench_id): r.jaccard for r in out.collect()}
    assert (12, 1) in rows and rows[(12, 1)] == 1.0  # verbatim copy
    assert (10, 1) in rows and 0.8 <= rows[(10, 1)] < 1.0
    assert not any(d == 11 for d, _ in rows)


def test_cross_corpus_contamination_guards_benchmark_ids(spark):
    """A negative benchmark doc_id would offset its sid below 2^40
    into the corpus sid space and silently misattribute pairs — both
    sides are runtime-guarded, not just the corpus."""
    import pytest

    t = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame([(1, t)], "doc_id long, text string")
    bad_bench = spark.createDataFrame([(-1, t)], "doc_id long, text string")
    with pytest.raises(Exception, match="benchmark"):
        D.cross_corpus_contamination(corpus, bad_bench).collect()


def test_cross_corpus_contamination_matches_exact_cross_join(spark):
    """LSH recall 1.0 on the sf fixture at 0.8 — the property the
    q_fuzzy_decontaminate oracle hash-match rests on."""
    docs = load_table(spark, SF_DIR, "documents")
    corp = docs.filter(F.col("doc_id") % 10 != 0)
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    got = {(r.doc_id, r.bench_id) for r in
           D.cross_corpus_contamination(corp, bench, 0.8).collect()}
    # exact reference: full Jaccard join, restricted to cross pairs
    allp = D.jaccard_similarity_join(docs, threshold=0.8)
    exact = set()
    for r in allp.collect():
        a_b, b_b = r.a_id % 10 == 0, r.b_id % 10 == 0
        if a_b and not b_b:
            exact.add((r.b_id, r.a_id))
        elif b_b and not a_b:
            exact.add((r.a_id, r.b_id))
    assert got == exact and exact, "planted cross-split near-dups expected"


def test_cross_corpus_contamination_guards_sid_space(spark):
    import pytest

    corpus = spark.createDataFrame(
        [(1 << 41, "a b c d e f")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="benchmark sid space"):
        D.cross_corpus_contamination(corpus, bench).collect()


# ---------------------------------------------------------------------------
# r10: context-window slicing
# ---------------------------------------------------------------------------


def test_context_windows_overlap_and_remainders(spark):
    from konohadataplatform_spark.operators.text import context_windows

    import pytest

    docs = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5"), (2, "a"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    out = sorted(
        (r.doc_id, r.win_id, r.start_tok, r.n_toks, r.chunk)
        for r in context_windows(docs, window=3, stride=2).collect()
    )
    assert out == [
        (1, 0, 0, 3, "t1 t2 t3"),
        (1, 1, 2, 3, "t3 t4 t5"),
        (1, 2, 4, 1, "t5"),
        (2, 0, 0, 1, "a"),
    ]  # empty/NULL docs yield no rows
    with pytest.raises(ValueError):
        context_windows(docs, window=0)


def test_span_corrupt_t5_contract(spark):
    """r10: sentinels are ordered, consecutive masked blocks merge,
    corrupted+targets reconstruct the doc exactly, and the draw is
    deterministic across calls."""
    from konohadataplatform_spark.operators.text import span_corrupt

    import pytest

    text = " ".join(f"t{i}" for i in range(60))
    docs = spark.createDataFrame([(1, text), (2, None)],
                                 "doc_id long, text string")
    r = {x.doc_id: x for x in
         span_corrupt(docs, mask_rate=0.4, span=3).collect()}[1]
    toks = text.split(" ")
    # reconstruct: walk corrupted, splice targets at each sentinel
    tgt = r.targets.split(" ") if r.targets else []
    spans = {}
    cur = None
    for w in tgt:
        if w.startswith("<extra_id_"):
            cur = w
            spans[cur] = []
        else:
            spans[cur].append(w)
    rebuilt = []
    for w in (r.corrupted.split(" ") if r.corrupted else []):
        if w.startswith("<extra_id_"):
            rebuilt.extend(spans[w])
        else:
            rebuilt.append(w)
    assert rebuilt == toks  # mass conservation, order preserved
    # sentinels appear in increasing order in BOTH strings
    ids = [int(w[10:-1]) for w in r.corrupted.split(" ")
           if w.startswith("<extra_id_")]
    assert ids == list(range(r.n_spans))
    assert r.n_masked_toks == sum(len(v) for v in spans.values())
    # deterministic
    again = span_corrupt(docs, mask_rate=0.4, span=3).collect()
    assert {(x.doc_id, x.corrupted) for x in again} >= {(1, r.corrupted)}
    # NULL doc -> empty strings, zero spans
    r2 = {x.doc_id: x for x in again}[2]
    assert (r2.corrupted, r2.targets, r2.n_spans) == ("", "", 0)
    with pytest.raises(ValueError):
        span_corrupt(docs, mask_rate=1.5)


def test_normalized_dedup_collapses_case_punct_digits(spark):
    docs = spark.createDataFrame(
        [
            (1, "Hello, World! Seen 1234 times."),
            (2, "hello world seen 9876 times"),   # same after normalize
            (3, "Hello, World! Seen 1234 times."),  # raw copy of 1
            (4, "a completely different document"),
        ],
        "doc_id long, text string",
    )
    rows = {r.kept_doc_id: r for r in D.normalized_dedup(docs).collect()}
    assert set(rows) == {1, 4}
    assert rows[1].n_copies == 3
    # docs 1+3 share one raw text; doc 2 is a second raw form
    assert rows[1].n_distinct_raw == 2
    assert rows[4].n_copies == 1 and rows[4].n_distinct_raw == 1


def test_normalized_dedup_space_collapse_and_trim(spark):
    docs = spark.createDataFrame(
        [(1, "  foo   bar  "), (2, "foo bar")],
        "doc_id long, text string",
    )
    out = D.normalized_dedup(docs).collect()
    assert len(out) == 1 and out[0].n_copies == 2


def test_margin_mining_hand_computed(spark):
    import pytest as _pt

    src = spark.createDataFrame(
        [(0, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    tgt = spark.createDataFrame(
        [(1, [1.0, 0.0]), (3, [0.8, 0.6]), (5, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r.src_id: r for r in
           S.margin_mining(src, tgt, k=2, threshold=1.0).collect()}
    # fwd sums: sx(0)=1+0.8=1.8, sx(2)=1+0.6=1.6
    # bwd sums: sy(1)=1.0, sy(3)=1.4, sy(5)=1.0
    # margin(0,1) = 1/((1.8+1.0)/4) = 1.428571..., best for src 0
    # margin(2,5) = 1/((1.6+1.0)/4) = 1.538461..., best for src 2
    assert set(out) == {0, 2}
    assert out[0].tgt_id == 1
    assert out[0].margin == _pt.approx(4 / 2.8)
    assert out[2].tgt_id == 5
    assert out[2].margin == _pt.approx(4 / 2.6)


def test_margin_mining_threshold_filters(spark):
    src = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    tgt = spark.createDataFrame(
        [(1, [1.0, 0.0]), (3, [0.9, 0.4358898943540674])],
        "vec_id long, embedding array<float>",
    )
    # best margin for src 0 is finite; a huge threshold empties it
    assert S.margin_mining(src, tgt, k=2, threshold=99.0).count() == 0


def test_margin_mining_k_validation(spark):
    import pytest as _pt

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with _pt.raises(ValueError):
        S.margin_mining(emb, emb, k=0)


def test_data_card_counts_and_dup_mass(spark):
    from konohadataplatform_spark.operators.text import data_card

    docs = spark.createDataFrame(
        [
            (1, "a b c", "en", "s1"),
            (2, "a b c", "en", "s2"),   # exact dup of 1
            (3, "d e", "fr", "s1"),
            (4, None, "fr", "s3"),      # null text
        ],
        "doc_id long, text string, lang string, source string",
    )
    r = data_card(docs).collect()[0]
    assert r.n_docs == 4 and r.n_with_text == 3
    assert r.total_tokens == 8 and r.total_chars == 13
    assert r.n_langs == 2 and r.n_sources == 3
    assert r.n_distinct_texts == 2 and r.n_exact_dup_docs == 1
    assert r.mean_doc_tokens == 2.0


def test_boilerplate_strip_rewrite(spark):
    from konohadataplatform_spark.operators.text import (
        boilerplate_strip_rewrite,
    )

    nav = "home | about | contact"
    docs = spark.createDataFrame(
        [
            (1, nav + "\nunique one\n\nlast line"),
            (2, nav + "\nunique two"),
            (3, "prefix\n" + nav),
            (4, "no boilerplate here\nat all"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           boilerplate_strip_rewrite(docs, min_docs=3).collect()}
    # nav appears in 3 docs -> stripped everywhere; empty line kept
    assert out[1].cleaned_text == "unique one\n\nlast line"
    assert out[1].n_lines == 4 and out[1].n_stripped == 1
    assert out[2].cleaned_text == "unique two"
    assert out[3].cleaned_text == "prefix"
    assert out[4].n_stripped == 0
    assert out[4].cleaned_text == "no boilerplate here\nat all"
    # NULL text -> one empty line, kept
    assert out[5].cleaned_text == "" and out[5].n_stripped == 0
    # below the bar: nothing stripped
    none = boilerplate_strip_rewrite(docs, min_docs=4).collect()
    assert all(r.n_stripped == 0 for r in none)


def test_margin_mining_ann_full_probe_matches_bruteforce(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    src = emb.filter(F.col("vec_id") % 2 == 0).limit(40)
    tgt = emb.filter(F.col("vec_id") % 2 == 1).limit(40)
    bf = {(r.src_id, r.tgt_id, r.cos_sim, r.margin)
          for r in S.margin_mining(src, tgt, k=3).collect()}
    ann = {(r.src_id, r.tgt_id, r.cos_sim, r.margin)
           for r in S.margin_mining_ann(
               src, tgt, k=3, n_cells=4, nprobe=4).collect()}
    assert bf == ann  # full probe: bit-identical, including doubles


def test_contamination_report_aggregates_pairs(spark):
    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = spark.createDataFrame(
        [
            (10, base),                 # benchmark (id % 10 == 0)
            (11, base),                 # contaminated copy
            (12, base + " extra"),      # near-dup of the benchmark
            (13, "totally different words here nothing shared at all xx"),
        ],
        "doc_id long, text string",
    )
    pairs = D.cross_corpus_contamination(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
        threshold=0.8,
    )
    rep = (
        pairs.groupBy("bench_id")
        .agg(
            F.count(F.lit(1)).alias("n_contaminated"),
            F.max("jaccard").alias("max_jaccard"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .collect()
    )
    assert len(rep) == 1
    r = rep[0]
    assert r.bench_id == 10 and r.n_contaminated == 2
    assert r.max_jaccard == 1.0 and r.first_doc_id == 11


def test_cosine_topk_exclude_self_param(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    with_self = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(emb, emb, k=2, exclude_self=False).collect()
    }
    assert (0, 0) in with_self and (1, 1) in with_self
    default = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(emb, emb, k=2).collect()
    }
    assert (0, 0) not in default


def test_margin_mining_shared_ids_keeps_aligned_pair(spark):
    """ADVICE r10: src and tgt are distinct corpora that may reuse id
    values (each language indexed 1..N). The aligned translation often
    carries the SAME id — the miner must not drop it."""
    src = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    tgt = spark.createDataFrame(
        [(1, [0.9, 0.1]), (2, [0.1, 0.9]), (3, [0.7, 0.7])],
        "vec_id long, embedding array<float>",
    )
    out = {r.src_id: r.tgt_id for r in
           S.margin_mining(src, tgt, k=2, threshold=0.0).collect()}
    # every src mines its aligned same-id tgt (nearest by cosine)
    assert out == {1: 1, 2: 2}


def test_margin_mining_ann_shared_ids_matches_bruteforce(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    # force OVERLAPPING id ranges: both sides keyed 0..n by dense rank
    from pyspark.sql.window import Window as W

    src = emb.filter(F.col("vec_id") % 2 == 0).limit(30).withColumn(
        "vec_id", F.row_number().over(W.orderBy("vec_id")).cast("long")
    )
    tgt = emb.filter(F.col("vec_id") % 2 == 1).limit(30).withColumn(
        "vec_id", F.row_number().over(W.orderBy("vec_id")).cast("long")
    )
    bf = {(r.src_id, r.tgt_id, r.cos_sim, r.margin)
          for r in S.margin_mining(src, tgt, k=3).collect()}
    ann = {(r.src_id, r.tgt_id, r.cos_sim, r.margin)
           for r in S.margin_mining_ann(
               src, tgt, k=3, n_cells=4, nprobe=4).collect()}
    assert bf and bf == ann


def test_ann_ivf_salted_shuffle_matches_broadcast(spark):
    emb = load_table(spark, SF_DIR, "embeddings").limit(60)
    q = emb.limit(10)
    bc = {(r.query_id, r.neighbor_id, r.cos_sim, r.knn_rank)
          for r in S.ann_ivf_topk_portable(
              emb, q, k=4, n_cells=4, nprobe=4,
              probe_broadcast=True).collect()}
    sh = {(r.query_id, r.neighbor_id, r.cos_sim, r.knn_rank)
          for r in S.ann_ivf_topk_portable(
              emb, q, k=4, n_cells=4, nprobe=4,
              probe_broadcast=False, salt=4).collect()}
    assert bc and bc == sh  # join strategy never changes values


def test_ann_ivf_thin_train_sample_falls_back(spark):
    # PARTIAL probe (the r14 full-probe fast path skips training
    # entirely, so the thin-sample guard only exists — and only
    # matters — when nprobe < n_cells and centroids are trained)
    import warnings as _w

    emb = load_table(spark, SF_DIR, "embeddings").limit(20)
    q = emb.limit(3)
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        out = {
            (r.query_id, r.neighbor_id, r.cos_sim, r.knn_rank)
            for r in S.ann_ivf_topk_portable(
                emb, q, k=2, n_cells=4, nprobe=2,
                train_mod=10_000_000,  # samples ~0 of 20 rows
            ).collect()
        }
    assert any("full-corpus centroid training" in str(c.message)
               for c in caught)
    # the fallback trains on the FULL corpus, so the result must be
    # bit-identical to an explicit train_mod=None run
    full = {
        (r.query_id, r.neighbor_id, r.cos_sim, r.knn_rank)
        for r in S.ann_ivf_topk_portable(
            emb, q, k=2, n_cells=4, nprobe=2, train_mod=None
        ).collect()
    }
    assert out and out == full


def test_ann_ivf_multi_assign_full_probe_bit_identical(spark):
    emb = load_table(spark, SF_DIR, "embeddings").limit(60)
    q = emb.limit(8)
    one = {(r.query_id, r.neighbor_id, r.cos_sim, r.knn_rank)
           for r in S.ann_ivf_topk_portable(
               emb, q, k=4, n_cells=4, nprobe=4).collect()}
    multi = {(r.query_id, r.neighbor_id, r.cos_sim, r.knn_rank)
             for r in S.ann_ivf_topk_portable(
                 emb, q, k=4, n_cells=4, nprobe=4, n_assign=2).collect()}
    assert one and one == multi


def test_ann_ivf_multi_assign_lifts_partial_probe_recall(spark):
    """Clustered fixture: Gaussian blobs around 8 centers. At probe-1,
    indexing each corpus vector under its 2 nearest cells must recover
    at least as many true neighbors as single assignment."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.standard_normal((8, 16)) * 3.0
    rows = []
    for i in range(240):
        c = centers[i % 8]
        rows.append((i, (c + rng.standard_normal(16) * 0.5).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.limit(24)
    exact = {(r.query_id, r.neighbor_id)
             for r in S.cosine_topk(emb, q, k=5).collect()}

    def recall(n_assign):
        got = {(r.query_id, r.neighbor_id)
               for r in S.ann_ivf_topk_portable(
                   emb, q, k=5, n_cells=8, nprobe=1, iters=2,
                   n_assign=n_assign).collect()}
        return len(got & exact) / len(exact)

    r1, r2 = recall(1), recall(2)
    assert r2 >= r1
    assert r2 > 0.5  # clustered data: partial probe is usable
