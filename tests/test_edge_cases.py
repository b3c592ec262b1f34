"""Degenerate-input hardening for the dedup/similarity operators:
empty corpora, single documents, texts shorter than the shingle width."""

from __future__ import annotations

from pyspark.sql import Row

from konohadataplatform_spark.operators import dedup as D
from konohadataplatform_spark.operators import similarity as S


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_jaccard_join_empty_corpus(spark):
    empty = docs_df(spark, [])
    assert D.jaccard_similarity_join(empty).count() == 0


def test_jaccard_join_single_doc(spark):
    one = docs_df(spark, [(1, "a b c d e")])
    assert D.jaccard_similarity_join(one).count() == 0


def test_short_texts_excluded_but_kept_in_clusters(spark):
    docs = docs_df(
        spark,
        [
            (1, "xy"),                      # < 3 tokens: no shingles
            (2, "one two"),                 # < 3 tokens
            (3, "a b c d e f g h"),
            (4, "a b c d e f g h"),         # exact near-dup of 3
        ],
    )
    pairs = D.jaccard_similarity_join(docs, threshold=0.8)
    assert {(r.a_id, r.b_id) for r in pairs.collect()} == {(3, 4)}
    clusters = {r.doc_id: r.cluster_rep for r in D.dedup_clusters(docs).collect()}
    assert clusters == {1: 1, 2: 2, 3: 3, 4: 3}


def test_minhash_single_and_short(spark):
    docs = docs_df(spark, [(1, "only"), (2, "a b c d e")])
    assert D.minhash_dedup(docs).count() == 0


def test_exact_dedup_duplicate_and_null_text(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="same"), Row(doc_id=2, text="same"), Row(doc_id=3, text=None)],
        "doc_id long, text string",
    )
    out = {r.kept_doc_id: r.n_copies for r in D.exact_dedup(docs).collect()}
    assert out[1] == 2  # duplicates collapse to min id
    assert out[3] == 1  # null text forms its own (null-hash) group


def test_cosine_topk_fewer_neighbors_than_k(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1])],
        "vec_id long, embedding array<double>",
    )
    out = S.cosine_topk(emb, emb.filter("vec_id = 0"), k=5).collect()
    assert len(out) == 1 and out[0].neighbor_id == 1


def test_simhash_empty_text(spark):
    docs = docs_df(spark, [(1, ""), (2, "hello world")])
    hashes = D.simhash(docs)
    # empty text still yields a row (single empty token)
    assert hashes.count() == 2


def test_connected_components_chain_exceeding_max_iter_raises(spark):
    # a path graph 0-1-2-...-9 has diameter 9: min-label propagation
    # needs 9 rounds, so max_iter=3 must fail LOUDLY, not return
    # silently-split components
    import pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "a_id long, b_id long"
    )
    # driver_solve_max_edges=0 pins the DISTRIBUTED path (the default
    # counted gate would solve a 9-edge graph driver-side)
    with pytest.raises(RuntimeError, match="still changing"):
        D.connected_components(pairs, max_iter=3, driver_solve_max_edges=0)
    # with enough rounds the same chain converges to one component
    out = {
        r.node: r.component
        for r in D.connected_components(
            pairs, max_iter=15, driver_solve_max_edges=0
        ).collect()
    }
    assert set(out.values()) == {0} and len(out) == 10
    # the driver union-find path must agree exactly
    out_drv = {
        r.node: r.component
        for r in D.connected_components(pairs).collect()
    }
    assert out_drv == out
    # max_iter=0 is a clear ValueError up front, not a NameError from
    # the for/else raise path referencing a never-assigned loop var
    with pytest.raises(ValueError, match="max_iter"):
        D.connected_components(pairs, max_iter=0)


def test_chunk_dedup_rewrite_negative_doc_id_raises(spark):
    # the packed winner key (doc_id * 1e6 + i) would attribute a
    # negative id's chunks to another doc — must fail loudly scan-side
    import pytest

    docs = docs_df(spark, [(-1, "a b c"), (2, "a b c")])
    with pytest.raises(Exception, match="packed-key bound"):
        D.chunk_dedup_rewrite(docs).collect()
