"""Round-11 operator tier: ranking metrics, script profile, tokenizer
fertility, cross-source overlap — hand-computed fixtures so every
integer the operators emit is checked against arithmetic done in the
test, not against another engine."""

from __future__ import annotations

from pyspark.sql import functions as F

from konohadataplatform_spark.operators import dedup as D
from konohadataplatform_spark.operators import evaluation as EV
from konohadataplatform_spark.operators import text as TX
from konohadataplatform_spark.operators.bpe import (
    bpe_encode_docs,
    bpe_train,
    tokenizer_fertility,
)

SCALE = EV.RANK_SCALE


# --------------------------------------------------------------------------
# ranking_metrics
# --------------------------------------------------------------------------
def test_dcg_weight_tables():
    w = EV.dcg_weight_table(10)
    assert w[0] == SCALE  # rank 1: 1/log2(2) == 1
    assert w[2] == SCALE // 2  # rank 3: 1/log2(4) == 0.5
    assert all(a > b for a, b in zip(w, w[1:])), "weights must decrease"
    p = EV.idcg_prefix_table(10)
    assert p[0] == w[0]
    assert all(p[i] == p[i - 1] + w[i] for i in range(1, 10))


def test_ranking_metrics_hand_computed(spark):
    # query 1: relevant {10, 11, 12}; hits at ranks 2 and 5.
    # query 2: relevant {20} but no hit in the ranked list.
    # query 3: ranked but has NO relevant set at all.
    ranked = spark.createDataFrame(
        [(1, 10, 2), (1, 99, 1), (1, 12, 5), (1, 98, 3), (1, 97, 4),
         (2, 96, 1), (2, 95, 2),
         (3, 94, 1)],
        "query_id long, neighbor_id long, knn_rank int",
    )
    relevant = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20)],
        "query_id long, neighbor_id long",
    )
    out = {
        r["query_id"]: r.asDict()
        for r in EV.ranking_metrics(ranked, relevant, k=10).collect()
    }
    w = EV.dcg_weight_table(10)
    p = EV.idcg_prefix_table(10)

    q1 = out[1]
    assert q1["n_relevant"] == 3
    assert q1["hits_at_k"] == 2
    assert q1["first_rel_rank"] == 2
    assert q1["recall_micro"] == 2 * SCALE // 3
    assert q1["mrr_micro"] == SCALE // 2
    assert q1["dcg_micro"] == w[1] + w[4]
    assert q1["idcg_micro"] == p[2]  # min(n_rel=3, k)=3 -> prefix[3]
    assert q1["ndcg_micro"] == (w[1] + w[4]) * SCALE // p[2]

    q2 = out[2]
    assert q2["n_relevant"] == 1
    assert q2["hits_at_k"] == 0
    assert q2["first_rel_rank"] == 0
    assert q2["recall_micro"] == 0
    assert q2["mrr_micro"] == 0
    assert q2["dcg_micro"] == 0
    assert q2["idcg_micro"] == p[0]  # IDCG is defined by n_relevant
    assert q2["ndcg_micro"] == 0

    q3 = out[3]
    assert q3["n_relevant"] == 0
    assert q3["idcg_micro"] == 0
    assert q3["ndcg_micro"] == 0


def test_ranking_metrics_k_truncates(spark):
    # a relevant hit at rank 4 is invisible when k=3
    ranked = spark.createDataFrame(
        [(1, 10, 4), (1, 99, 1), (1, 98, 2), (1, 97, 3)],
        "query_id long, neighbor_id long, knn_rank int",
    )
    relevant = spark.createDataFrame(
        [(1, 10)], "query_id long, neighbor_id long"
    )
    row = EV.ranking_metrics(ranked, relevant, k=3).collect()[0]
    assert row["hits_at_k"] == 0 and row["mrr_micro"] == 0
    row = EV.ranking_metrics(ranked, relevant, k=10).collect()[0]
    assert row["hits_at_k"] == 1
    assert row["mrr_micro"] == SCALE // 4


def test_ranking_metrics_duplicate_qrels_collapse(spark):
    ranked = spark.createDataFrame(
        [(1, 10, 1)], "query_id long, neighbor_id long, knn_rank int"
    )
    relevant = spark.createDataFrame(
        [(1, 10), (1, 10)], "query_id long, neighbor_id long"
    )
    row = EV.ranking_metrics(ranked, relevant, k=5).collect()[0]
    assert row["n_relevant"] == 1 and row["hits_at_k"] == 1
    assert row["ndcg_micro"] == SCALE  # perfect ranking


# --------------------------------------------------------------------------
# script_profile
# --------------------------------------------------------------------------
def test_script_profile_planted_scripts(spark):
    docs = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "привет мир"),  # cyrillic
            (3, "你好世界"),  # cjk
            (4, "abc привет"),  # latin 3 vs cyrillic 6 -> cyrillic
            (5, "ab пр"),  # tie 2 vs 2 -> latin (declared order)
            (6, "1234 !!"),  # digits only -> none
            (7, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in TX.script_profile(docs).collect()}
    assert out[1]["dominant_script"] == "latin"
    assert out[1]["n_latin"] == 10
    assert out[1]["n_space"] == 1
    assert out[1]["n_chars_total"] == 11
    assert out[2]["dominant_script"] == "cyrillic"
    assert out[2]["n_cyrillic"] == 9
    assert out[3]["dominant_script"] == "cjk"
    assert out[3]["n_cjk"] == 4
    assert out[4]["dominant_script"] == "cyrillic"
    assert out[5]["dominant_script"] == "latin"  # tie-break precedence
    assert out[6]["dominant_script"] == "none"
    assert out[6]["n_digit"] == 4
    assert out[6]["n_other"] == 2  # the two '!'
    assert out[7]["dominant_script"] == "none"
    assert out[7]["n_chars_total"] == 0


def test_script_profile_counts_are_exhaustive(spark):
    # every char lands in exactly one bucket: scripts+digit+space+other
    docs = spark.createDataFrame(
        [(1, "mix of текст, 漢字 & 123 ア")], "doc_id long, text string"
    )
    r = TX.script_profile(docs).collect()[0].asDict()
    script_sum = sum(
        r[f"n_{name}"] for name, _ in TX.SCRIPT_BLOCKS
    )
    assert (
        script_sum + r["n_digit"] + r["n_space"] + r["n_other"]
        == r["n_chars_total"]
    )
    assert r["n_kana"] == 1 and r["n_cjk"] == 2 and r["n_cyrillic"] == 5


# --------------------------------------------------------------------------
# tokenizer_fertility
# --------------------------------------------------------------------------
def test_tokenizer_fertility_matches_encode_sums(spark):
    docs = spark.createDataFrame(
        [
            (1, "aa bb aa", "x"),
            (2, "aa aa aa aa", "x"),
            (3, "ccc ddd", "y"),
        ],
        "doc_id long, text string, lang string",
    )
    _, words = bpe_train(docs, 2)
    out = {
        r["lang"]: r.asDict()
        for r in tokenizer_fertility(docs, words, group_col="lang").collect()
    }
    # cross-check totals against the encode relation itself
    enc = {
        r["doc_id"]: r.asDict()
        for r in bpe_encode_docs(docs, words).collect()
    }
    x_tokens = enc[1]["n_bpe_tokens"] + enc[2]["n_bpe_tokens"]
    x_words = enc[1]["n_words"] + enc[2]["n_words"]
    assert out["x"]["n_docs"] == 2
    assert out["x"]["total_words"] == x_words == 7
    assert out["x"]["total_bpe_tokens"] == x_tokens
    assert out["x"]["total_chars"] == len("aa bb aa") + len("aa aa aa aa")
    assert (
        out["x"]["bpe_per_word_micro"] == x_tokens * SCALE // x_words
    )
    assert (
        out["x"]["chars_per_token_micro"]
        == out["x"]["total_chars"] * SCALE // x_tokens
    )
    assert out["y"]["n_docs"] == 1


def test_tokenizer_fertility_fragmented_slice_scores_higher(spark):
    # vocab trained ONLY on x-lang text: the y slice must show higher
    # fertility (more tokens per word) — the signal the audit exists for
    docs = spark.createDataFrame(
        [(i, "aa bb aa bb", "x") for i in range(1, 9)]
        + [(9, "qrstuv wxyzab", "y")],
        "doc_id long, text string, lang string",
    )
    _, words = bpe_train(docs.filter(F.col("lang") == "x"), 3)
    out = {
        r["lang"]: r.asDict()
        for r in tokenizer_fertility(docs, words, group_col="lang").collect()
    }
    assert out["y"]["bpe_per_word_micro"] > out["x"]["bpe_per_word_micro"]


# --------------------------------------------------------------------------
# cross_source_overlap
# --------------------------------------------------------------------------
def test_cross_source_overlap_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d", "X"),  # shingles {abc, bcd}
            (2, "a b c", "Y"),  # {abc}
            (3, "a b c", "Y"),  # duplicate doc: distinct set unchanged
            (4, "p q r s", "Z"),  # {pqr, qrs} — disjoint from X and Y
        ],
        "doc_id long, text string, source string",
    )
    rows = {
        (r["source_a"], r["source_b"]): r.asDict()
        for r in D.cross_source_overlap(docs, n=3).collect()
    }
    assert set(rows) == {("X", "Y")}  # zero-overlap pairs are absent
    xy = rows[("X", "Y")]
    assert xy["shared_shingles"] == 1
    assert xy["n_a"] == 2 and xy["n_b"] == 1
    assert xy["containment_micro"] == SCALE  # Y fully contained in X
    assert xy["jaccard_micro"] == SCALE // 2  # 1 shared of 2 total


def test_cross_source_overlap_short_docs_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "a b", "X"), (2, "a b c", "Y")],
        "doc_id long, text string, source string",
    )
    # X has no 3-gram at all -> no pair rows
    assert D.cross_source_overlap(docs, n=3).count() == 0


# --------------------------------------------------------------------------
# contrastive_pairs
# --------------------------------------------------------------------------
def test_contrastive_pairs_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),  # 8 words, window=4 -> chunks 2
            (2, "x y z"),  # single chunk -> no pair
            (3, "p q r s t"),  # chunks: 4 + tail 1 -> one pair
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["pair_idx"]): r.asDict()
        for r in TX.contrastive_pairs(docs, window=4).collect()
    }
    assert set(rows) == {(1, 0), (3, 0)}
    p1 = rows[(1, 0)]
    assert p1["anchor_text"] == "a b c d"
    assert p1["positive_text"] == "e f g h"
    assert p1["n_anchor_tokens"] == 4 and p1["n_positive_tokens"] == 4
    p3 = rows[(3, 0)]
    assert p3["anchor_text"] == "p q r s"
    assert p3["positive_text"] == "t"
    assert p3["n_positive_tokens"] == 1


def test_contrastive_pairs_three_chunks_chain(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l")], "doc_id long, text string"
    )
    rows = sorted(
        (r["pair_idx"], r["anchor_text"], r["positive_text"])
        for r in TX.contrastive_pairs(docs, window=4).collect()
    )
    assert rows == [
        (0, "a b c d", "e f g h"),
        (1, "e f g h", "i j k l"),
    ]


# --------------------------------------------------------------------------
# ANN-graded metrics: partial probe degrades gracefully
# --------------------------------------------------------------------------
def test_ann_ranked_metrics_partial_probe_bounded(spark):
    from konohadataplatform_spark.operators import similarity as S
    from konohadataplatform_spark.sources.star_schema import load_table
    from tests.conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    qs = emb.filter(F.col("vec_id") % 23 == 0)
    lab_q = qs.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("_ql")
    )
    lab_c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("_cl")
    )
    relevant = (
        lab_c.join(F.broadcast(lab_q), F.col("_cl") == F.col("_ql"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )

    def total_hits(nprobe):
        ranked = S.ann_ivf_topk_portable(
            emb, qs, k=10, n_cells=8, nprobe=nprobe
        )
        rows = EV.ranking_metrics(ranked, relevant, k=10).collect()
        assert all(
            0 <= r["ndcg_micro"] <= SCALE and 0 <= r["recall_micro"] <= SCALE
            for r in rows
        )
        return sum(r["hits_at_k"] for r in rows)

    # fewer probed cells can only lose candidates, never invent them
    assert total_hits(1) <= total_hits(8)


# --------------------------------------------------------------------------
# script_profile is stateless -> runs unchanged on a stream
# --------------------------------------------------------------------------
def test_script_profile_streaming_parity(spark, tmp_path):
    batch = spark.createDataFrame(
        [(1, "hello мир"), (2, "漢字 123"), (3, "")],
        "doc_id long, text string",
    )
    src = tmp_path / "docs_stream"
    batch.write.parquet(str(src))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src)
    )
    q = (
        TX.script_profile(stream)
        .writeStream.format("memory")
        .queryName("script_profile_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        r["doc_id"]: r.asDict()
        for r in spark.sql("select * from script_profile_stream").collect()
    }
    want = {
        r["doc_id"]: r.asDict() for r in TX.script_profile(batch).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# vocab_divergence
# --------------------------------------------------------------------------
def test_vocab_divergence_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "x", "A"), (2, "y", "B"), (3, "x", "C"), (4, "x", "C")],
        "doc_id long, text string, source string",
    )
    out = {
        r["source"]: r.asDict()
        for r in TX.vocab_divergence(docs).collect()
    }
    # A={x}, rest={x:2,y:1}: TVD = (|1-2/3| + 1/3)/2 = 1/3
    assert out["A"]["tvd_micro"] == 333333
    # B={y}, rest={x:3}: disjoint -> TVD = 1
    assert out["B"]["tvd_micro"] == 1_000_000
    # C={x}, rest={x:1,y:1}: TVD = 1/2
    assert out["C"]["tvd_micro"] == 500_000
    assert out["C"]["n_tokens_slice"] == 2
    assert out["C"]["n_tokens_rest"] == 2


def test_vocab_divergence_identical_slices_zero(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", "A"), (2, "a b c", "B")],
        "doc_id long, text string, source string",
    )
    out = {
        r["source"]: r["tvd_micro"]
        for r in TX.vocab_divergence(docs).collect()
    }
    assert out == {"A": 0, "B": 0}


def test_vocab_divergence_single_group_null(spark):
    docs = spark.createDataFrame(
        [(1, "a b", "A")], "doc_id long, text string, source string"
    )
    row = TX.vocab_divergence(docs).collect()[0]
    assert row["tvd_micro"] is None and row["n_tokens_rest"] == 0


# --------------------------------------------------------------------------
# calibration_table
# --------------------------------------------------------------------------
def test_calibration_table_separable_scores(spark):
    from konohadataplatform_spark.operators.classifier import (
        calibration_table,
    )

    scored = spark.createDataFrame(
        [(i, i, i > 10) for i in range(1, 21)],
        "doc_id long, margin long, is_target boolean",
    )
    rows = {
        r["bucket"]: r.asDict()
        for r in calibration_table(scored, n_buckets=10).collect()
    }
    assert set(rows) == set(range(10))
    assert all(r["n_docs"] == 2 for r in rows.values())
    # margins 1..10 are negatives, 11..20 targets: perfect separation
    for b in range(5):
        assert rows[b]["target_rate_micro"] == 0
    for b in range(5, 10):
        assert rows[b]["target_rate_micro"] == 1_000_000
    assert rows[0]["min_margin"] == 1 and rows[9]["max_margin"] == 20


def test_calibration_table_remainder_tiles(spark):
    from konohadataplatform_spark.operators.classifier import (
        calibration_table,
    )

    scored = spark.createDataFrame(
        [(i, i, False) for i in range(7)],
        "doc_id long, margin long, is_target boolean",
    )
    rows = {
        r["bucket"]: r["n_docs"]
        for r in calibration_table(scored, n_buckets=3).collect()
    }
    # (rank-1)*3 div 7 -> tile sizes 3, 2, 2 (explicit arithmetic,
    # engine-independent unlike NTILE)
    assert rows == {0: 3, 1: 2, 2: 2}


# --------------------------------------------------------------------------
# connected_components driver gate parity
# --------------------------------------------------------------------------
def test_cc_driver_and_distributed_paths_agree(spark):
    # two triangles + an isolated pair + shared-node star
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (20, 21), (20, 22), (20, 23)],
        "a_id long, b_id long",
    )
    drv = {
        (r.node, r.component)
        for r in D.connected_components(pairs).collect()
    }
    dist = {
        (r.node, r.component)
        for r in D.connected_components(
            pairs, driver_solve_max_edges=0
        ).collect()
    }
    assert drv == dist
    comp = dict(drv)
    assert comp[3] == 1 and comp[11] == 10 and comp[23] == 20


def test_cc_empty_pairs(spark):
    pairs = spark.createDataFrame([], "a_id long, b_id long")
    assert D.connected_components(pairs).count() == 0
    assert (
        D.connected_components(pairs, driver_solve_max_edges=0).count()
        == 0
    )


# --------------------------------------------------------------------------
# semantic_decontaminate
# --------------------------------------------------------------------------
def test_semantic_decontaminate_planted_leak(spark):
    from konohadataplatform_spark.operators.similarity import (
        semantic_decontaminate,
    )

    emb = spark.createDataFrame(
        [
            (17, [1.0, 0.0, 0.0], True),  # eval vector
            (1, [0.99, 0.1, 0.0], False),  # near-copy -> flagged
            (2, [0.0, 1.0, 0.0], False),  # orthogonal -> clean
            (3, [-1.0, 0.0, 0.0], False),  # opposite -> clean
        ],
        "vec_id long, embedding array<double>, is_eval boolean",
    )
    out = semantic_decontaminate(
        emb, F.col("is_eval"), threshold=0.9
    ).collect()
    assert [(r["vec_id"], r["closest_eval_id"]) for r in out] == [(1, 17)]
    assert out[0]["cos_sim"] > 0.99


def test_semantic_decontaminate_rank1_ties_lowest_eval_id(spark):
    from konohadataplatform_spark.operators.similarity import (
        semantic_decontaminate,
    )

    emb = spark.createDataFrame(
        [
            (20, [1.0, 0.0], True),
            (21, [1.0, 0.0], True),  # identical eval twin
            (1, [1.0, 0.0], False),
        ],
        "vec_id long, embedding array<double>, is_eval boolean",
    )
    out = semantic_decontaminate(emb, F.col("is_eval"), 0.5).collect()
    assert len(out) == 1 and out[0]["closest_eval_id"] == 20


# --------------------------------------------------------------------------
# epoch_schedule
# --------------------------------------------------------------------------
def test_epoch_schedule_hand_computed(spark):
    import math

    from konohadataplatform_spark.operators.curation import epoch_schedule

    docs = spark.createDataFrame(
        [(1, "a b c d", "big")] * 0
        + [(i, "a b c d", "big") for i in range(16)]  # 64 tokens
        + [(100, "a b c d", "small")],  # 4 tokens
        "doc_id long, text string, source string",
    )
    out = {
        r["source"]: r.asDict()
        for r in epoch_schedule(docs, token_budget=1000).collect()
    }
    w_big = math.floor(math.sqrt(64 * 1_000_000))
    w_small = math.floor(math.sqrt(4 * 1_000_000))
    tw = w_big + w_small
    assert out["big"]["n_tokens"] == 64
    assert out["big"]["weight"] == w_big
    assert out["big"]["target_tokens"] == 1000 * w_big // tw
    assert out["small"]["target_tokens"] == 1000 * w_small // tw
    # temperature flattening: the small slice gets MORE epochs
    assert out["small"]["epochs_micro"] > out["big"]["epochs_micro"]
    # and more than its proportional share of tokens
    assert out["small"]["target_tokens"] * 68 > 1000 * 4


def test_epoch_schedule_epochs_identity(spark):
    from konohadataplatform_spark.operators.curation import epoch_schedule

    docs = spark.createDataFrame(
        [(1, "a b", "only")], "doc_id long, text string, source string"
    )
    row = epoch_schedule(docs, token_budget=10).collect()[0]
    # single slice takes the whole budget: epochs = budget / n_tokens
    assert row["target_tokens"] == 10
    assert row["epochs_micro"] == 10 * 1_000_000 // 2


def test_semantic_decontaminate_over_bound_ann_parity(spark):
    """The r12 counted gate: above eval_broadcast_rows the operator
    must route through the IVF machinery at full probe and return
    bit-identical rows to the broadcast path (strategy changes, the
    answer never does)."""
    from konohadataplatform_spark.operators.similarity import (
        semantic_decontaminate,
    )

    emb = spark.createDataFrame(
        [
            (i, [float((i * 7) % 13), float((i * 5) % 11),
                 float((i * 3) % 7 + 1)])
            for i in range(1, 61)
        ],
        "vec_id long, embedding array<double>",
    )
    pred = F.col("vec_id") % 5 == 0
    via_broadcast = sorted(
        (r["vec_id"], r["closest_eval_id"], r["cos_sim"])
        for r in semantic_decontaminate(emb, pred, 0.5).collect()
    )
    via_ann = sorted(
        (r["vec_id"], r["closest_eval_id"], r["cos_sim"])
        for r in semantic_decontaminate(
            emb, pred, 0.5, eval_broadcast_rows=0, ann_n_cells=4
        ).collect()
    )
    assert via_broadcast and via_broadcast == via_ann


def test_epoch_schedule_overflow_guard_no_int64_wrap(spark):
    """The r11 ADVICE fix: with the old multiply-then-compare guard a
    product that wraps int64 negative silently passed the 2^52 check;
    the division-form guard must raise loudly instead."""
    import pytest

    from konohadataplatform_spark.operators.curation import epoch_schedule

    # 20 tokens x 2^59 wraps int64 (1.15e19 > 2^63-1)
    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 20), "s")],
        "doc_id long, text string, source string",
    )
    with pytest.raises(Exception, match="epoch_schedule"):
        epoch_schedule(docs, token_budget=10, scale=1 << 59).collect()


def test_ngram_decontaminate_gate_parity(spark):
    """r12 counted gate: forcing the over-bound (no-hint) path must
    return identical rows to the broadcast path."""
    import konohadataplatform_spark.operators.dedup as D2

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{(i * 3 + j) % 9}" for j in range(8)))
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    pred = F.col("doc_id") % 4 == 0
    a = sorted(
        (r["doc_id"], r["n_eval_grams"])
        for r in D2.ngram_decontaminate(docs, pred, n=3).collect()
    )
    b = sorted(
        (r["doc_id"], r["n_eval_grams"])
        for r in D2.ngram_decontaminate(
            docs, pred, n=3, eval_broadcast_docs=0
        ).collect()
    )
    assert a and a == b


def test_cross_corpus_contamination_gate_parity(spark):
    import konohadataplatform_spark.operators.dedup as D2

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"t{(i % 3) * 7 + j}" for j in range(10)))
            for i in range(15)
        ],
        "doc_id long, text string",
    )
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    bench = docs.filter(F.col("doc_id") % 5 == 0)
    a = sorted(
        (r["doc_id"], r["bench_id"], r["jaccard"])
        for r in D2.cross_corpus_contamination(
            corpus, bench, threshold=0.8
        ).collect()
    )
    b = sorted(
        (r["doc_id"], r["bench_id"], r["jaccard"])
        for r in D2.cross_corpus_contamination(
            corpus, bench, threshold=0.8, bench_broadcast_rows=0
        ).collect()
    )
    assert a and a == b


def test_cosine_topk_salted_path_parity(spark):
    """r12: above query_broadcast_rows cosine_topk must run the salted
    equi spelling — identical results, no CartesianProduct."""
    from konohadataplatform_spark.operators import similarity as S2

    emb = spark.createDataFrame(
        [
            (i, [float((i * 7) % 13), float((i * 5) % 11), 1.0 + i % 3])
            for i in range(30)
        ],
        "vec_id long, embedding array<double>",
    )
    qs = emb.filter(F.col("vec_id") % 3 == 0)
    a = sorted(
        tuple(r) for r in S2.cosine_topk(emb, qs, k=4).collect()
    )
    forced = S2.cosine_topk(emb, qs, k=4, query_broadcast_rows=0, salt=4)
    plan = forced._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "CartesianProduct" not in plan
    b = sorted(tuple(r) for r in forced.collect())
    assert a and a == b


def test_cosine_pairs_exact_salted_path_parity(spark):
    from konohadataplatform_spark.operators import similarity as S2

    emb = spark.createDataFrame(
        [
            (i, [float((i * 3) % 7), float((i * 2) % 5), 1.0])
            for i in range(20)
        ],
        "vec_id long, embedding array<double>",
    )
    a = sorted(
        tuple(r) for r in S2.cosine_pairs_exact(emb, 0.5).collect()
    )
    forced = S2.cosine_pairs_exact(emb, 0.5, broadcast_rows=0, salt=4)
    plan = forced._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "CartesianProduct" not in plan
    b = sorted(tuple(r) for r in forced.collect())
    assert a and a == b


def test_ann_rankers_gate_parity(spark):
    """Hint-drop paths of the LSH/IVF rankers return identical rows."""
    from konohadataplatform_spark.operators import similarity as S2

    emb = spark.createDataFrame(
        [
            (i, [float((i * 7) % 13), float((i * 5) % 11),
                 float(i % 4) + 1.0] + [0.0] * 61)
            for i in range(40)
        ],
        "vec_id long, embedding array<double>",
    )
    qs = emb.filter(F.col("vec_id") % 4 == 0)
    for fn, kw in (
        (S2.ann_lsh_topk, {}),
        (S2.ann_ivf_topk, {"n_cells": 4, "nprobe": 4}),
    ):
        a = sorted(
            tuple(r) for r in fn(emb, qs, k=3, **kw).collect()
        )
        b = sorted(
            tuple(r)
            for r in fn(
                emb, qs, k=3, query_broadcast_rows=0, **kw
            ).collect()
        )
        assert a and a == b
