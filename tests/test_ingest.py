"""Streaming document-ingest curation (streaming/ingest.py): micro-
batches gated for quality, exact-deduped and near-deduped against the
persisted corpus state, with O(batch) commits and checkpoint-idempotent
replay — the streaming half of the batch curation flagship."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from konohadataplatform_spark.catalog import SnapshotCatalog
from konohadataplatform_spark.streaming.ingest import DOC_SCHEMA, DocIngestPipeline

GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the quiet green forest where it finds a warm safe place to rest "
    "for the night before continuing the long journey home in the morning"
)
GOOD2 = (
    "a completely different story about data engines and the catalyst "
    "optimizer that plans scans joins and aggregates for very large "
    "clusters while keeping every shuffle as small as it can possibly be"
)
NEAR_GOOD = GOOD.replace("lazy dog", "sleepy dog")  # near-dup of GOOD
# repeated single token, no stopwords: uniq_ratio ~0.03 -> score ~0.5
SPAM = " ".join(["spam"] * 40)


def doc(i, text, lang="en", source="web"):
    return {"doc_id": i, "text": text, "lang": lang, "source": source,
            "n_chars": len(text) if text else 0}


@pytest.fixture()
def catalog(spark, tmp_path):
    return SnapshotCatalog(spark, str(tmp_path / "wh"))


def _df(spark, rows):
    return spark.createDataFrame(
        [(r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
         for r in rows],
        DOC_SCHEMA,
    )


def test_batch_curation_gates(spark, catalog):
    """One batch: low-quality, in-batch exact dup, and in-batch
    near-dup are rejected with reasons; the survivors land."""
    pipe = DocIngestPipeline(spark, catalog, "corpus")
    pipe.apply_batch(_df(spark, [
        doc(1, GOOD),
        doc(2, GOOD),        # exact dup of 1
        doc(3, NEAR_GOOD),   # near dup of 1
        doc(4, SPAM),        # low quality (repetition, no stopwords)
        doc(5, GOOD2),
    ]))
    kept = {r.doc_id for r in catalog.read("corpus").collect()}
    assert kept == {1, 5}
    reasons = {r.doc_id: r.reason
               for r in catalog.read("corpus__rejects").collect()}
    assert reasons == {2: "exact_duplicate", 3: "near_duplicate",
                       4: "low_quality"}


def test_cross_batch_dedup_uses_persisted_state(spark, catalog):
    """Batch 2's duplicates of batch 1 docs are caught via the digest
    table and the minhash index — the corpus text is never re-read."""
    pipe = DocIngestPipeline(spark, catalog, "corpus")
    pipe.apply_batch(_df(spark, [doc(1, GOOD)]))
    pipe.apply_batch(_df(spark, [
        doc(10, GOOD),       # exact dup of corpus doc 1
        doc(11, NEAR_GOOD),  # near dup of corpus doc 1
        doc(12, GOOD2),      # novel
    ]))
    kept = {r.doc_id for r in catalog.read("corpus").collect()}
    assert kept == {1, 12}
    reasons = {r.doc_id: r.reason
               for r in catalog.read("corpus__rejects").collect()}
    assert reasons == {10: "exact_duplicate", 11: "near_duplicate"}
    # digests hold accepted docs only; the minhash index also keeps
    # near-dup-rejected entries so later arrivals dedup against them
    # regardless of micro-batch slicing
    assert {r.doc_id for r in catalog.read("corpus__digests").collect()} \
        == {1, 12}
    assert {r.sid for r in catalog.read("corpus__dedupidx").collect()} \
        == {1, 11, 12}


def test_batch_id_replay_is_idempotent(spark, catalog):
    """Checkpoint replay: re-applying an already-applied batch_id is a
    no-op (same contract as apply_cdc_batch)."""
    pipe = DocIngestPipeline(spark, catalog, "corpus")
    b1 = _df(spark, [doc(1, GOOD)])
    pipe.apply_batch(b1, batch_id=1)
    v1 = catalog.current_snapshot("corpus").version
    pipe.apply_batch(b1, batch_id=1)  # replayed
    assert catalog.current_snapshot("corpus").version == v1
    assert catalog.read("corpus").count() == 1


def test_streaming_end_to_end(spark, catalog, tmp_path):
    """A real Structured Streaming run over JSON document files, two
    availableNow drains with state carried between them."""
    src = tmp_path / "docs_src"
    ckpt = tmp_path / "ckpt"
    os.makedirs(src)
    with open(src / "drop1.json", "w") as f:
        for d in [doc(1, GOOD), doc(2, SPAM)]:
            f.write(json.dumps(d) + "\n")
    pipe = DocIngestPipeline(spark, catalog, "corpus")
    pipe.start_stream(str(src), str(ckpt)).awaitTermination(120)
    assert {r.doc_id for r in catalog.read("corpus").collect()} == {1}

    with open(src / "drop2.json", "w") as f:
        for d in [doc(3, GOOD), doc(4, GOOD2)]:  # 3 = exact dup of 1
            f.write(json.dumps(d) + "\n")
    pipe.start_stream(str(src), str(ckpt)).awaitTermination(120)
    assert {r.doc_id for r in catalog.read("corpus").collect()} == {1, 4}
    reasons = {r.doc_id: r.reason
               for r in catalog.read("corpus__rejects").collect()}
    assert reasons[2] == "low_quality" and reasons[3] == "exact_duplicate"


def test_empty_text_rejected_not_lost(spark, catalog):
    """Review regression: whitespace-only text gives a NULL quality
    score (0-token division) — it must land in the rejects table, not
    silently vanish from both tables."""
    pipe = DocIngestPipeline(spark, catalog, "corpus")
    pipe.apply_batch(_df(spark, [doc(1, GOOD), doc(2, "   "), doc(3, "")]))
    assert {r.doc_id for r in catalog.read("corpus").collect()} == {1}
    reasons = {r.doc_id: r.reason
               for r in catalog.read("corpus__rejects").collect()}
    assert reasons == {2: "low_quality", 3: "low_quality"}


def test_crash_replay_does_not_pollute_rejects(spark, catalog):
    """Review regression: commits landed but the batch marker did not
    (crash window) -> redelivery must re-accept the batch's own docs,
    not file them as duplicates of themselves."""
    pipe = DocIngestPipeline(spark, catalog, "corpus")
    b = _df(spark, [doc(1, GOOD), doc(2, GOOD2)])
    pipe.apply_batch(b, batch_id=1)
    # simulate the marker being lost in the crash
    os.remove(os.path.join(catalog._tdir("corpus"), "_last_batch"))
    pipe.apply_batch(b, batch_id=1)  # checkpoint redelivery
    assert {r.doc_id for r in catalog.read("corpus").collect()} == {1, 2}
    assert not catalog.exists("corpus__rejects") \
        or catalog.read("corpus__rejects").count() == 0


def test_near_dup_chain_consistent_across_batch_slicing(spark, catalog):
    """Review regression: rejected docs' index entries persist, so a
    doc near-dup of a REJECTED doc is dropped the same way whether the
    pair arrives in one batch or across two."""
    NEAR2 = NEAR_GOOD.replace("green forest", "dark forest")
    # one batch: GOOD accepted, NEAR_GOOD dropped, NEAR2 dropped (chain)
    p1 = DocIngestPipeline(spark, catalog, "one")
    p1.apply_batch(_df(spark, [doc(1, GOOD), doc(2, NEAR_GOOD),
                               doc(3, NEAR2)]))
    one = {r.doc_id for r in catalog.read("one").collect()}
    # split batches: same outcome
    p2 = DocIngestPipeline(spark, catalog, "two")
    p2.apply_batch(_df(spark, [doc(1, GOOD), doc(2, NEAR_GOOD)]))
    p2.apply_batch(_df(spark, [doc(3, NEAR2)]))
    two = {r.doc_id for r in catalog.read("two").collect()}
    assert one == two


def test_replay_rejects_after_threshold_change(spark, catalog):
    """The reject DLQ lifecycle (r7): rejects carry the full doc row,
    so loosening a gate and calling replay_rejects() re-ingests the
    docs that now pass and drains them from the quarantine — without
    the original source. Still-failing docs stay, with reasons."""
    from konohadataplatform_spark.streaming.ingest import DocIngestPipeline

    pipe = DocIngestPipeline(spark, catalog, "corpus", quality_min=0.9)
    good = ("the quick brown fox jumps over the lazy dog and keeps on "
            "running through the quiet green field toward the distant "
            "hills under a clear blue morning sky today")
    soso = "word another thing item point value detail note case fact"
    pipe.apply_batch(
        _df(spark, [doc(1, good), doc(2, soso), doc(3, None)]), batch_id=0
    )
    kept = {r.doc_id for r in catalog.read("corpus").collect()}
    quarantined = {r.doc_id for r in catalog.read("corpus__rejects").collect()}
    assert 2 in quarantined and 3 in quarantined
    # rejects are self-contained: the text rides along
    stored = {r.doc_id: r.text for r in catalog.read("corpus__rejects").collect()}
    assert stored[2] == soso and stored[3] is None

    # operator loosens the quality gate and replays
    pipe.quality_min = 0.2
    n = pipe.replay_rejects()
    assert n == 1
    kept2 = {r.doc_id for r in catalog.read("corpus").collect()}
    assert kept2 == kept | {2}
    # doc 2 drained; doc 3 (NULL text) still quarantined
    left = {(r.doc_id, r.reason)
            for r in catalog.read("corpus__rejects").collect()}
    assert left == {(3, "low_quality")}
    # replay with nothing newly passing is a no-op
    assert pipe.replay_rejects() == 0


def test_ingest_decontamination_gate(spark, catalog):
    """r10: register_benchmark() arms the eval-set gate — batch docs
    that exactly or nearly duplicate a benchmark doc quarantine as
    'contaminated'; novel docs land; benchmark docs never enter the
    corpus themselves."""
    bench2 = (
        "counting tokens across shards requires careful planning because "
        "the partitioner must balance work while the reducers merge all "
        "partial sums into one final answer for the whole giant corpus"
    )
    pipe = DocIngestPipeline(spark, catalog, "corpus")
    pipe.register_benchmark(
        spark.createDataFrame([(1, GOOD), (2, bench2)],
                              "doc_id long, text string")
    )
    pipe.apply_batch(_df(spark, [
        doc(20, GOOD),       # exact copy of the benchmark doc
        doc(21, NEAR_GOOD),  # near-dup of 20 in-batch (gate order:
                             # near-dup fires before decontamination)
        doc(22, GOOD2),      # novel
    ]))
    kept = {r.doc_id for r in catalog.read("corpus").collect()}
    assert kept == {22}
    reasons = {r.doc_id: r.reason
               for r in catalog.read("corpus__rejects").collect()}
    assert reasons == {20: "contaminated", 21: "near_duplicate"}
    # the gate persists across batches (state, not per-batch config):
    # doc 30 near-dups benchmark doc 2, which no batch has seen yet
    pipe.apply_batch(_df(spark, [
        doc(30, bench2.replace("giant", "large")),
        doc(31, GOOD2),
    ]))
    kept = {r.doc_id for r in catalog.read("corpus").collect()}
    assert kept == {22}  # 31 is an exact dup of accepted 22
    reasons = {r.doc_id: r.reason
               for r in catalog.read("corpus__rejects").collect()}
    assert reasons[30] == "contaminated"
    assert reasons[31] == "exact_duplicate"


def test_decontamination_gate_inactive_without_benchmark(spark, catalog):
    """No register_benchmark() -> no contamination rejects, even for
    text that WOULD collide with some benchmark elsewhere."""
    pipe = DocIngestPipeline(spark, catalog, "corpus")
    pipe.apply_batch(_df(spark, [doc(1, GOOD)]))
    assert {r.doc_id for r in catalog.read("corpus").collect()} == {1}
    assert not catalog.exists("corpus__rejects") or \
        catalog.read("corpus__rejects").isEmpty()


def _classifier_train_df(spark):
    """Labeled training corpus for the classifier-gate tests: "good"
    docs share English filler vocabulary; "bad" docs are
    keyword-stuffed listicles. doc_id < 100 is the positive slice."""
    good_texts = [GOOD, GOOD2,
                  GOOD.replace("fox", "hare"), GOOD2.replace("data", "sql")]
    bad_texts = [
        "buy cheap pills now click here buy cheap pills now click here",
        "win prize free money win prize free money win prize free money",
        "buy cheap prize click free pills money now win here buy cheap",
        "click now free win pills buy money prize here now click free",
    ]
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(good_texts)]
        + [(100 + i, t) for i, t in enumerate(bad_texts)],
        "doc_id long, text string",
    )


def test_classifier_gate_train_in_batch_score_in_stream(spark, catalog):
    """r9: the trained-classifier quality gate — weights from a BATCH
    train_perceptron run gate the STREAMING ingest, low-margin docs are
    quarantined as low_margin, and the stream-side margin is
    bit-identical to the batch scorer's (one shared margin_column
    expression)."""
    from konohadataplatform_spark.operators import classifier as C

    train = _classifier_train_df(spark)
    feats = C.hashed_features(train, F.col("doc_id") < 100)
    w = C.train_perceptron(spark, feats, iters=3)

    # the trained boundary must separate the training slices
    scored = {r.doc_id: r.margin
              for r in C.score_with_weights(train, w).collect()}
    assert all(scored[i] > 0 for i in range(4))
    assert all(scored[100 + i] <= 0 for i in range(4))

    pipe = DocIngestPipeline(
        spark, catalog, "corpus",
        quality_min=0.0,  # isolate the classifier gate
        classifier_weights=w,
    )
    fresh_bad = "free pills click win money now buy cheap prize here"
    pipe.apply_batch(_df(spark, [
        doc(1, GOOD),
        doc(2, fresh_bad),
    ]), batch_id=0)
    assert {r.doc_id for r in catalog.read("corpus").collect()} == {1}
    reasons = {r.doc_id: r.reason
               for r in catalog.read("corpus__rejects").collect()}
    assert reasons == {2: "low_margin"}

    # batch/stream bit-parity on the gated batch: the margin the
    # stream gate computed equals score_with_weights on the same rows
    batch_margins = {
        r.doc_id: r.margin
        for r in C.score_with_weights(
            _df(spark, [doc(1, GOOD), doc(2, fresh_bad)]), w
        ).collect()
    }
    assert batch_margins[1] > pipe.margin_min >= batch_margins[2]

    # DLQ lifecycle holds for the new gate: loosen margin_min, replay,
    # the quarantined doc drains
    pipe.margin_min = min(batch_margins[2] - 1, -1)
    assert pipe.replay_rejects() == 1
    assert {r.doc_id for r in catalog.read("corpus").collect()} == {1, 2}


def test_classifier_gate_streaming_end_to_end(spark, catalog, tmp_path):
    """The gate composes with the real Structured Streaming entry
    point: low-margin docs quarantined from a file-source stream."""
    from konohadataplatform_spark.operators import classifier as C

    train = _classifier_train_df(spark)
    w = C.train_perceptron(
        spark, C.hashed_features(train, F.col("doc_id") < 100), iters=3
    )
    pipe = DocIngestPipeline(
        spark, catalog, "corpus", quality_min=0.0, classifier_weights=w
    )
    src = tmp_path / "src"
    src.mkdir()
    # same spam text the batch-gate test proved scores <= 0 under
    # these weights
    rows = [doc(1, GOOD),
            doc(2, "free pills click win money now buy cheap prize here")]
    (src / "b0.json").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )
    q = pipe.start_stream(str(src), str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert {r.doc_id for r in catalog.read("corpus").collect()} == {1}
    reasons = {r.doc_id: r.reason
               for r in catalog.read("corpus__rejects").collect()}
    assert reasons == {2: "low_margin"}


def test_streaming_data_card_cumulative(spark, tmp_path):
    import json as _json

    from konohadataplatform_spark.streaming.monitor import (
        streaming_data_card,
    )

    src = tmp_path / "docs_stream"
    src.mkdir()
    (src / "b1.json").write_text("\n".join(
        _json.dumps(d) for d in [
            {"doc_id": 1, "text": "a b c", "lang": "en", "source": "s1"},
            {"doc_id": 2, "text": "a b c", "lang": "en", "source": "s2"},
        ]))
    stream = spark.readStream.schema(
        "doc_id long, text string, lang string, source string"
    ).json(str(src))
    q = (
        streaming_data_card(stream)
        .writeStream.format("memory")
        .queryName("card")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        r1 = spark.sql("select * from card").collect()[0]
        assert r1.n_docs == 2 and r1.total_tokens == 6
        assert r1.n_distinct_texts_approx == 1
        # second batch arrives: totals are cumulative
        (src / "b2.json").write_text(_json.dumps(
            {"doc_id": 3, "text": "d e", "lang": "fr", "source": "s1"}))
        q.processAllAvailable()
        r2 = spark.sql("select * from card").collect()[0]
        assert r2.n_docs == 3 and r2.total_tokens == 8
        assert r2.total_chars == 13
        assert r2.n_langs_approx == 2
    finally:
        q.stop()


def test_url_front_door_gate(spark, catalog):
    """r12: url_screen=True screens every batch by the SAME
    pass_url_filters verdict as the batch battery — blocked URLs
    quarantine as blocked_url BEFORE any text gate runs (a blocked
    doc with spam text must report blocked_url, not low_quality),
    and accepted rows carry their URL into the corpus."""
    pipe = DocIngestPipeline(spark, catalog, "corpus", url_screen=True)
    rows = [
        dict(doc(1, GOOD), url="https://ok.example.org/a"),
        dict(doc(2, GOOD2), url="https://ads.badsite.example/x"),
        dict(doc(3, SPAM), url="https://spam.example.org/ads/banner"),
        dict(doc(4, SPAM), url="https://ok.example.org/b"),
    ]
    pipe.apply_batch(
        spark.createDataFrame(
            [
                (r["doc_id"], r["text"], r["lang"], r["source"],
                 r["n_chars"], r["url"])
                for r in rows
            ],
            "doc_id long, text string, lang string, source string,"
            " n_chars long, url string",
        )
    )
    kept = {r.doc_id: r.url for r in catalog.read("corpus").collect()}
    assert kept == {1: "https://ok.example.org/a"}
    reasons = {
        r.doc_id: r.reason
        for r in catalog.read("corpus__rejects").collect()
    }
    assert reasons == {
        2: "blocked_url",
        3: "blocked_url",
        4: "low_quality",
    }


def test_url_screen_replay_rejects(spark, catalog):
    """r12 review fix: replay_rejects must carry the url column back
    through the front door for url-screened pipelines."""
    pipe = DocIngestPipeline(
        spark, catalog, "corpus", url_screen=True, quality_min=0.9
    )
    soso = "word another thing item point value detail note case fact"
    rows = [dict(doc(1, soso), url="https://ok.example.org/a")]
    df = spark.createDataFrame(
        [(r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"],
          r["url"]) for r in rows],
        "doc_id long, text string, lang string, source string,"
        " n_chars long, url string",
    )
    pipe.apply_batch(df)
    # rejected on quality at 0.9; loosen and replay through the gates
    assert catalog.read("corpus__rejects").count() == 1
    pipe.quality_min = 0.2
    assert pipe.replay_rejects() == 1
    kept = {r.doc_id: r.url for r in catalog.read("corpus").collect()}
    assert kept == {1: "https://ok.example.org/a"}


def test_url_screen_streaming_end_to_end(spark, catalog, tmp_path):
    """r12 review fix: start_stream with url_screen=True reads the
    url-extended schema; blocked URLs quarantine from a real stream."""
    import json as _json

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        dict(doc(1, GOOD), url="https://ok.example.org/a"),
        dict(doc(2, GOOD2), url="https://badsite.example/x"),
    ]
    (src / "b0.json").write_text(
        "\n".join(_json.dumps(r) for r in rows) + "\n"
    )
    pipe = DocIngestPipeline(spark, catalog, "corpus", url_screen=True)
    q = pipe.start_stream(str(src), str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    kept = {r.doc_id for r in catalog.read("corpus").collect()}
    assert kept == {1}
    reasons = {r.doc_id: r.reason
               for r in catalog.read("corpus__rejects").collect()}
    assert reasons == {2: "blocked_url"}
