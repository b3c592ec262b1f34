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


def test_dhash_neardup_plan_no_cartesian(spark):
    docs = load_table(spark, SF_DIR, "documents")
    feats = FP.dhash_features(M.documents_as_bmp(docs))
    plan = FP.dhash_neardup_pairs(feats)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
