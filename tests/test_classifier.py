"""Batch-perceptron quality classifier (operators/classifier.py):
exactness vs a Python replay, separability, bias handling, and the
plan shapes the metadata-sized training loop depends on."""

from __future__ import annotations

from collections import Counter
from hashlib import md5

import pytest
from pyspark.sql import functions as F

from konohadataplatform_spark.operators.classifier import (
    BIAS_DIM,
    hashed_features,
    perceptron_scores,
    train_perceptron,
)


def _dim(term: str, dims: int = 64) -> int:
    return int(md5(term.encode()).hexdigest()[:4], 16) % dims


def _py_train(rows, dims, iters, n=2):
    """Full Python replay: features, 3 batch updates, final margins."""
    feats = Counter()
    labels = {}
    for doc_id, is_t, text in rows:
        labels[doc_id] = 1 if is_t else -1
        w = text.strip().split(" ")
        for i in range(len(w) - n + 1):
            feats[(doc_id, _dim(" ".join(w[i : i + n]), dims))] += 1
        feats[(doc_id, BIAS_DIM)] += 1
    wts: dict[int, int] = {}
    for _ in range(iters):
        margins = Counter()
        for (d, dim), x in feats.items():
            margins[d] += x * wts.get(dim, 0)
        mis = {d for d in labels if labels[d] * margins[d] <= 0}
        for (d, dim), x in feats.items():
            if d in mis:
                wts[dim] = wts.get(dim, 0) + labels[d] * x
    margins = Counter()
    for (d, dim), x in feats.items():
        margins[d] += x * wts.get(dim, 0)
    return wts, {d: margins[d] for d in labels}, labels


def _fixture(spark):
    rows = [
        (1, True, "good clean data here"),
        (2, True, "good clean data again and again"),
        (3, True, "clean data good data"),
        (4, False, "spam junk noise here"),
        (5, False, "junk noise spam noise"),
        (6, False, "noise spam junk words"),
        (7, True, "x"),  # < n words: bias-only doc
    ]
    return rows, spark.createDataFrame(
        rows, "doc_id: long, is_t: boolean, text: string"
    )


def test_perceptron_matches_python_replay(spark):
    rows, docs = _fixture(spark)
    exp_w, exp_m, labels = _py_train(rows, dims=64, iters=3)
    feats = hashed_features(docs, F.col("is_t"), dims=64, n=2)
    got_w = train_perceptron(spark, feats, iters=3)
    assert {k: v for k, v in got_w.items() if v} == {
        k: v for k, v in exp_w.items() if v
    }
    got = {
        r.doc_id: (r.margin, r.pred_pos, r.is_target)
        for r in perceptron_scores(docs, F.col("is_t"), 64, 3, 2).collect()
    }
    assert got == {
        d: (exp_m[d], exp_m[d] > 0, labels[d] == 1) for d in exp_m
    }


def test_perceptron_separates_separable_corpus(spark):
    """Disjoint vocabularies must classify perfectly within 3 batch
    iterations (the token-mass init already separates them)."""
    rows = [(i, True, "alpha beta gamma delta " * 3) for i in range(10)] + [
        (i, False, "omega psi chi phi " * 3) for i in range(10, 20)
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, is_t: boolean, text: string")
    out = perceptron_scores(docs, F.col("is_t"), dims=64, iters=3, n=2).collect()
    assert len(out) == 20
    assert all(r.pred_pos == r.is_target for r in out)


def test_bias_only_doc_gets_margin(spark):
    _rows, docs = _fixture(spark)
    out = {r.doc_id: r for r in perceptron_scores(docs, F.col("is_t")).collect()}
    assert 7 in out  # the 1-word doc still scores (bias feature)


def test_train_rejects_bad_iters(spark):
    _rows, docs = _fixture(spark)
    feats = hashed_features(docs, F.col("is_t"))
    with pytest.raises(ValueError):
        train_perceptron(spark, feats, iters=0)


def test_scoring_plan_shape(spark):
    """Scoring is a pure map (margin_column inlines the weights as an
    array literal): ZERO exchanges of any kind, no window, no
    cartesian; and the feature cache is released after training (no
    leak)."""
    _rows, docs = _fixture(spark)
    before = len(
        [r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()]
    )
    scored = perceptron_scores(docs, F.col("is_t"), dims=64, iters=2)
    scored.count()
    after = len(
        [r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()]
    )
    plan = scored._sc._jvm.PythonSQLUtils.explainString(
        scored._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "Exchange" not in plan  # served stage shuffles nothing
    assert after <= before  # feats cache released


def test_score_with_weights_matches_trained_margins(spark):
    """The stateless per-row scorer must reproduce perceptron_scores'
    margins bit-for-bit from the same weights (no explode/join/agg)."""
    from konohadataplatform_spark.operators.classifier import (
        score_with_weights,
    )

    _rows, docs = _fixture(spark)
    feats = hashed_features(docs, F.col("is_t"), dims=64, n=2)
    w = train_perceptron(spark, feats, iters=3)
    batch = {
        r.doc_id: (r.margin, r.pred_pos)
        for r in perceptron_scores(docs, F.col("is_t"), 64, 3, 2).collect()
    }
    fast = {
        r.doc_id: (r.margin, r.pred_pos)
        for r in score_with_weights(docs, w, dims=64, n=2).collect()
    }
    assert fast == batch
    plan = score_with_weights(docs, w)._sc._jvm.PythonSQLUtils.explainString(
        score_with_weights(docs, w)._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan  # pure projection: zero shuffles


def test_score_with_weights_streams(spark, tmp_path):
    """Train in batch, score a Structured Streaming source with the
    same weights: the stream's margins must equal the batch margins
    (the quality-gate-in-front-of-ingest serving path)."""
    import json as _json
    import os as _os

    from konohadataplatform_spark.operators.classifier import (
        score_with_weights,
    )

    rows, docs = _fixture(spark)
    w = train_perceptron(
        spark, hashed_features(docs, F.col("is_t"), dims=64, n=2), iters=3
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    _os.makedirs(src)
    with open(_os.path.join(src, "b0.jsonl"), "w") as fh:
        for doc_id, _is_t, text in rows:
            fh.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    stream = spark.readStream.schema("doc_id long, text string").json(src)
    q = (
        score_with_weights(stream, w, dims=64, n=2)
        .writeStream.foreachBatch(
            lambda df, _i: df.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)  # False = timeout, fail loudly
    streamed = {
        r.doc_id: (r.margin, r.pred_pos)
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        r.doc_id: (r.margin, r.pred_pos)
        for r in score_with_weights(docs, w).collect()
    }
    assert streamed == batch and len(streamed) == len(rows)
