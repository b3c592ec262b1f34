"""Perceptual media fingerprints: dHash image dedup + audio
fingerprint. The LSH near-dup path is checked against a brute-force
Hamming scan (recall must be exactly 1.0 by the pigeonhole argument),
and the feature extractors against plain-Python recomputation from the
md5-derived fixture bytes."""

from __future__ import annotations

import hashlib
import struct

import pytest
from pyspark.sql import functions as F

from konohadataplatform_spark.operators import fingerprint as FP
from konohadataplatform_spark.operators import multimodal as M
from konohadataplatform_spark.sources.star_schema import load_table
from tests.conftest import SF_DIR


def _expected_dhash(text: str, width: int = 8, height: int = 4) -> int:
    npix = width * height * 3
    px = (hashlib.md5(text.encode()).digest() * ((npix // 16) + 1))[:npix]
    gray = [
        (px[3 * i] + px[3 * i + 1] + px[3 * i + 2]) // 3
        for i in range(width * height)
    ]
    return FP.dhash_bits(gray, width, height)


def test_dhash_bits_known():
    # 3x2 grid: row0 [1,5,2] -> bits (5>1)=1, (2>5)=0;
    # row1 [9,3,3] -> (3>9)=0, (3>3)=0  => hash 0b0001
    assert FP.dhash_bits([1, 5, 2, 9, 3, 3], 3, 2) == 1


def test_dhash_features_match_python(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    texts = {r.doc_id: r.text for r in docs.collect()}
    feats = FP.dhash_features(M.documents_as_bmp(docs)).collect()
    assert len(feats) == len(texts)
    for r in feats:
        assert r.width == 8 and r.height == 4 and r.nbits == 28
        assert r.dhash == _expected_dhash(texts[r.media_id])


def test_dhash_neardup_recall_exact_vs_bruteforce(spark):
    docs = load_table(spark, SF_DIR, "documents")
    feats = FP.dhash_features(M.documents_as_bmp(docs))
    hashes = {r.media_id: r.dhash for r in feats.collect()}
    ids = sorted(hashes)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(hashes[a] ^ hashes[b]).count("1") <= 3
    }
    got = {
        (r.a_id, r.b_id)
        for r in FP.dhash_neardup_pairs(
            feats, nbits=28, bands=4, max_hamming=3
        ).collect()
    }
    assert brute, "fixture should contain Hamming-close image pairs"
    assert got == brute  # recall 1.0 (pigeonhole) AND no false positives


def test_dhash_neardup_rejects_bad_band_count(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(5)
    feats = FP.dhash_features(M.documents_as_bmp(docs))
    with pytest.raises(ValueError, match="pigeonhole"):
        FP.dhash_neardup_pairs(feats, bands=3, max_hamming=3)


def test_dhash_undecodable_payload_is_null(spark):
    media = spark.createDataFrame(
        [(1, bytearray(b"not an image")), (2, None)],
        "media_id long, content binary",
    )
    rows = {r.media_id: r.dhash for r in FP.dhash_features(media).collect()}
    assert rows == {1: None, 2: None}


def _chain_samples(text: str, n: int) -> list[int]:
    hx = hashlib.md5(text.encode()).hexdigest()
    buf = bytes.fromhex(hx)
    while len(buf) < 2 * n:
        hx = hashlib.md5(hx.encode()).hexdigest()
        buf += bytes.fromhex(hx)
    return list(struct.unpack(f"<{n}h", buf[: 2 * n]))


def test_audio_fingerprint_matches_python(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(40)
    texts = {r.doc_id: r.text for r in docs.collect()}
    out = FP.audio_fingerprint_features(
        M.documents_as_wav(docs, n_samples=16), window=4
    ).collect()
    assert len(out) == len(texts)
    for r in out:
        smp = _chain_samples(texts[r.media_id], 16)
        wins = [smp[4 * k : 4 * k + 4] for k in range(4)]
        e = [sum(v * v for v in w) for w in wins]
        zcr = [
            sum(1 for i in range(3) if (w[i] < 0) != (w[i + 1] < 0))
            for w in wins
        ]
        pk = [max(abs(v) for v in w) for w in wins]
        fp = 0
        for k in range(3):
            if e[k + 1] > e[k]:
                fp |= 1 << k
        for k in range(4):
            if zcr[k] % 2:
                fp |= 1 << (3 + k)
        for k in range(4):
            if pk[k] >= 16384:
                fp |= 1 << (7 + k)
        assert (r.fingerprint, r.n_windows, r.total_energy) == (
            fp,
            4,
            sum(e),
        )


def test_documents_as_wav_n_samples_backcompat(spark):
    """n_samples=8 must be byte-identical to the original single-digest
    builder (q_wav_windows' oracle depends on that derivation)."""
    docs = load_table(spark, SF_DIR, "documents").limit(10)
    rows = {
        r.media_id: bytes(r.content)
        for r in M.documents_as_wav(docs, n_samples=8).collect()
    }
    texts = {r.doc_id: r.text for r in docs.collect()}
    for mid, content in rows.items():
        d = hashlib.md5(texts[mid].encode()).digest()
        expected = M.encode_wav(list(struct.unpack("<8h", d)), 8000)
        assert content == expected


def test_dhash_resize_production_geometry(spark):
    """resize_to=(9,8): 64-bit hash recomputed in plain Python with the
    same nearest-neighbor index arithmetic as resize_image."""
    docs = load_table(spark, SF_DIR, "documents").limit(30)
    texts = {r.doc_id: r.text for r in docs.collect()}
    feats = FP.dhash_features(
        M.documents_as_bmp(docs), resize_to=(9, 8)
    ).collect()
    for r in feats:
        assert (r.width, r.height, r.nbits) == (8, 4, 64)
        npix = 8 * 4 * 3
        px = (hashlib.md5(texts[r.media_id].encode()).digest() * 7)[:npix]
        gray = [(px[3 * i] + px[3 * i + 1] + px[3 * i + 2]) // 3
                for i in range(32)]
        rg = [gray[(y * 4 // 8) * 8 + (x * 8 // 9)]
              for y in range(8) for x in range(9)]
        assert r.dhash == FP.dhash_bits(rg, 9, 8)


def test_dhash_neardup_max_bucket_cap(spark):
    """The skew guard drops only hot buckets: an infinite cap matches
    the uncapped answer; a cap of 1 over three identical images kills
    every pair between them (every band bucket holds all three)."""
    import pandas as pd

    docs = load_table(spark, SF_DIR, "documents").limit(200)
    feats = FP.dhash_features(M.documents_as_bmp(docs))
    uncapped = {
        (r.a_id, r.b_id)
        for r in FP.dhash_neardup_pairs(feats).collect()
    }
    big_cap = {
        (r.a_id, r.b_id)
        for r in FP.dhash_neardup_pairs(feats, max_bucket=10**6).collect()
    }
    assert big_cap == uncapped

    trio = spark.createDataFrame(
        pd.DataFrame({"media_id": [1, 2, 3], "dhash": [5, 5, 5],
                      "width": 8, "height": 4, "nbits": 28}),
    )
    assert FP.dhash_neardup_pairs(trio, max_bucket=2).count() == 0
    assert FP.dhash_neardup_pairs(trio, max_bucket=3).count() == 3


def test_video_scene_cuts_constructed(spark):
    """Hand-built 3-frame GIF: flat-0 -> flat-17 -> flat-17. The first
    transition diffs every channel by 17 (8*4*3*17 = 1632), the second
    by 0 — threshold between them yields exactly one cut."""
    from konohadataplatform_spark.operators.gif_py import encode_gif

    palette = bytes(c for i in range(16) for c in (17 * i,) * 3)
    w, h = 8, 4
    f0 = bytes(96)
    f1 = bytes([17] * 96)
    gif = encode_gif(w, h, [f0, f1, f1], palette=palette, delay_ms=40)
    media = spark.createDataFrame(
        [(7, bytearray(gif))], "media_id long, content binary"
    )
    rows = {
        r.frame_idx: (r.diff_sum, r.is_cut)
        for r in M.video_scene_cuts(media, threshold=1000).collect()
    }
    assert rows == {1: (1632, True), 2: (0, False)}


def test_dhash_neardup_plan_no_cartesian(spark):
    docs = load_table(spark, SF_DIR, "documents")
    feats = FP.dhash_features(M.documents_as_bmp(docs))
    plan = FP.dhash_neardup_pairs(feats)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
