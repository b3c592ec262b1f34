"""sf1 scale smoke: do the headline plans SURVIVE a 10x scale-up?

The per-round bench runs at sf0.1, where AQE broadcasts almost
everything and scale-killers hide. This tool materializes an sf1-scale
dataset (10x facts, dims unchanged — the shape a real warehouse scales
in), times the headline queries at both scale factors, and reports the
wall-time ratio: sub-linear (< 10x on 10x data) means the plan's
shuffles and windows spread the extra data across tasks instead of
serializing it.

Construction (derived from the driver's sf0.1 parquet, never
synthesized from scratch):
- lineitem/orders: 10 copies with l_orderkey/o_orderkey offset per
  copy (keeps per-order groups and the orders<->lineitem FK intact;
  10x orders per customer, like any growing business).
- documents: 10 copies, doc_id offset (texts repeat — which is
  exactly what corpus dedup workloads look like).
- embeddings: 10 copies, vec_id offset.
- dims (region/nation/customer/supplier/part) + events: unchanged.

Also measures `semantic_dedup` at sf1 across its `bits` knob, showing
the documented scale contract (per-bucket pair count O((n/2^bits)^2))
with real numbers.

Run: python tools/scale_smoke.py [--rebuild]   (~2-4 min)
Output: one JSON line + a markdown table to paste into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from konohadataplatform_spark.queries import all_queries  # noqa: E402
from konohadataplatform_spark.session import get_spark  # noqa: E402
from konohadataplatform_spark.sources.star_schema import load_table  # noqa: E402

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sparkgraft_sf1")
COPIES = 10

SMOKE_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q_token_budget_pack",
    "q_sequence_packing",
    # r7 additions: the bigram LM joins token streams with two
    # gram-keyed count tables; the sketch agg must stay one exchange
    "q_bigram_surprisal",
    "q_quantile_sketch",
    # r7b additions: linear media/sketch/graph ops — decode cost must
    # scale with rows, the bloom anti-join must not shuffle the corpus,
    # 3-round pagerank's per-iteration joins must stay bounded
    "q_image_dhash_groups",
    "q_audio_fingerprint",
    "q_gif_scene_cuts",
    "q_bloom_decontaminate",
    "q_event_pagerank",
    # r7c additions: CMS heavy hitters must keep the vocabulary out of
    # the exchange (broadcast prefilter), the HLL sketch must stay one
    # exchange constant-size, retrieval's term join must not blow up
    "q_cms_heavy_hitters",
    "q_hll_cardinality",
    "q_lexical_topk",
    # r8 additions: BPE training must stay vocab-bounded after the one
    # corpus-scale word count (10x docs but ~same vocab => ~flat merge
    # cost); the encode join and the two-phase source cap must stay
    # one-exchange; IVF-PQ/MMR are query-side ops over 10x corpus
    "q_bpe_train_merges",
    "q_bpe_encode_docs",
    "q_source_caps",
    "q_centroid_classify",
    "q_ann_ivfpq",
    "q_mmr_rerank",
    "q_exact_substring_spans",
    # r8c additions: the rewrite's winner aggregate must collapse
    # repeated chunks map-side (10x docs = 10x copies of every chunk);
    # BM25's dl/totals joins must stay broadcast; DSIR weights and the
    # perceptron loop are vocab/dims-bounded after the token count
    "q_chunk_dedup_rewrite",
    "q_bm25_topk",
    "q_importance_weights",
    "q_quality_classifier",
    # the shard layout's range-offset prefix must beat a global window
    "q_shard_plan",
    # r9 additions: span removal must stay ~flat like its chunk-level
    # sibling; pii/gopher are scan-speed projections (linear is the
    # contract); fuzzy decontamination's corpus side must stay a
    # broadcast probe (pair count grows with real cross-split dups —
    # that's result growth, not a plan defect)
    "q_exact_substring_rewrite",
    "q_pii_redact",
    "q_gopher_rules",
    "q_fuzzy_decontaminate",
    # r10 additions: cluster-best-quality runs the exact clustering
    # (prefix-filter join + CC) — must stay collision-bounded on 10x
    # duplicated docs; quota is metadata-sized; the PII-v2 / repetition
    # flag batteries are scan-speed projections like their siblings
    "q_cluster_best_quality",
    "q_lang_temperature_quota",
    "q_pii_redact_v2",
    "q_gopher_repetition",
    # r10 additions: dup-ngram coverage explodes per-position shingles
    # (like exact-substring) but reduces per-doc — must stay linear;
    # mixture sampling is a hash-gate projection; the window/span
    # slicers re-slice each doc's own token array (zero joins) so
    # cost tracks total token mass, not doc count
    "q_gopher_dup_ngrams",
    "q_mixture_sample",
    "q_context_windows",
    "q_span_corrupt",
    # r10 second tier: the perplexity partition joins five gram-keyed
    # count tables (vocab-sized — must stay ~flat); margin mining is
    # quadratic-by-contract at bench scale (ANN swap documented);
    # boilerplate strip is a rewrite (one text-carrying exchange);
    # the rest are scan-speed or cap-bounded
    "q_perplexity_partition",
    "q_margin_mining",
    "q_normalized_dedup",
    "q_doc_keywords",
    "q_stratified_quota_sample",
    "q_boilerplate_strip",
    "q_code_quality_flags",
    "q_data_card",
    # r11 additions: C4 battery / script profile are scan-speed
    # projections (linear is the contract); token shards and fertility
    # ride the memoized BPE encode join (vocab-bounded after the word
    # count); cross-source overlap's distinct (source, gram) mass is
    # UNCHANGED under 10x duplicated docs, so only the explode+distinct
    # scan should grow; contrastive pairs is one posexplode + a
    # per-document window
    "q_c4_filters",
    "q_token_shards",
    "q_script_profile",
    "q_tokenizer_fertility",
    "q_cross_source_overlap",
    "q_contrastive_pairs",
    # vocab divergence: one vocab-mass word-keyed join — 10x duplicated
    # docs keep the vocab fixed, so only counts grow (explode-bound)
    "q_vocab_divergence",
    # mixing table: one metadata-sized aggregate over the token scan
    "q_epoch_schedule",
    # duplication histogram: the smoked dedup_clusters pass + two
    # metadata-sized aggregates
    "q_dup_cluster_histogram",
    # curation funnel: three scan-speed flag batteries + the digest
    # groupBy, joined on the doc key; one per-source aggregate
    # (r12: also sums per-stage token mass — same join shape)
    "q_filter_funnel",
    # r12 additions: the URL battery is a zero-exchange projection
    # (c4_filters plan class); domain cap is the two-phase cap over
    # the filtered crawl; URL dedup is one min-agg + key join; the
    # unigram trainer must stay vocab-bounded after the one
    # corpus-scale word count (10x duplicated docs keep the word
    # vocab FIXED, so candidates/segmentation/prune are ~flat and
    # only the word-frequency scan grows); the compare row runs both
    # tokenizers' encode joins
    "q_url_filters",
    "q_domain_cap",
    "q_url_dedup",
    "q_unigram_tokenizer",
    "q_tokenizer_compare",
    # r12 second tier: the blocklist-table variant adds one AQE-sized
    # equi join to the screen battery; domain quality is one
    # domain-keyed conditional aggregate over the Gopher battery;
    # unigram encode rides the memoized word join (vocab-bounded)
    "q_url_filters_table",
    "q_domain_quality",
    "q_unigram_encode_docs",
    # r12 third tier: compression compare = both vocab-bounded encode
    # stats; TLD profile = the screen projection + one tiny aggregate
    "q_tokenizer_compression",
    "q_url_tld_profile",
    # r13: EM expectation prune — the DP folds run on the vocab-sized
    # lattice (10x duplicated docs keep the word vocab FIXED), so only
    # the word-frequency scan should grow
    "q_unigram_em_usage",
    # r13: JL projection is a narrow map (linear is the contract);
    # jl_neighbors' registered % 29 query split is corpus-proportional
    # so pair count is quadratic-by-contract like q_knn_bruteforce
    # (the reduced width is the win, not the asymptotics); covariance
    # is one scan + metadata aggregates
    "q_jl_project",
    "q_embedding_covariance",
    # NOT smoked: q_semantic_decontaminate — exact cosine of every
    # train vector against a broadcast eval split whose registered
    # form (vec_id % 17) grows WITH the corpus, so replicated-fixture
    # ratios measure the quadratic contract, not the plan; real eval
    # suites are fixed-size (the broadcast side stays constant) and
    # the documented ANN swap covers a large one.
    # NOT smoked: q_retrieval_metrics / q_retrieval_metrics_ann (the
    # latter is the full-probe parity config) — the ranked input is the
    # brute-force cosine ranker over a 1/23 query split (pair count
    # n^2/23, quadratic by the same contract as q_knn_bruteforce's
    # row); at corpus scale the harness scores a fixed eval SAMPLE and
    # the ranked input comes from the ANN path (the metrics stage
    # itself is |queries| x k — metadata-sized).
    # q_retrieval_metrics_partial_probe: the registered query split
    # (vec_id % 23) is corpus-proportional, so its raw sf1 ratio would
    # measure the split contract, not the plan — the smoked form is
    # q_partial_probe_fixed_queries below (EXTRA_SMOKES), which holds
    # the query side at the FIXED eval sample the metrics harness
    # contract prescribes and smokes the actual scale path (IVF probe
    # + scorer at constant |queries|).
    # NOT smoked: q_margin_mining_ann — the registered query is the
    # FULL-PROBE parity config (scores every pair by construction, so
    # its sf1 ratio is the same quadratic contract the brute-force row
    # already records). The partial-probe scale path is measured
    # directly in SCALING.md (n_cells=256, nprobe=4: 54.9 s vs 76.0 s
    # brute at sf1).
]

DIMS = ["region", "nation", "customer", "supplier", "part", "events"]


# --------------------------------------------------------------------------
# Smoke-only variants (r13): shapes the registered queries don't pin —
# the gated retrieval family's SHUFFLED fallback (the 100 TB path, where
# the query-term relation exceeds the broadcast bound), and the
# partial-probe metrics run at a FIXED query sample (the harness
# contract at corpus scale). Same callable signature as registry
# queries: (spark, sf_dir) -> DataFrame.
# --------------------------------------------------------------------------
def _smoke_lexical_topk_shuffled(spark, sf_dir):
    from konohadataplatform_spark.operators.retrieval import lexical_topk

    return lexical_topk(
        load_table(spark, sf_dir, "documents"),
        F.col("doc_id") % 101 == 0,
        k=3, n=3, df_cap_frac=10, query_broadcast=False,
    )


def _smoke_bm25_topk_shuffled(spark, sf_dir):
    from konohadataplatform_spark.operators.retrieval import bm25_topk

    return bm25_topk(
        load_table(spark, sf_dir, "documents"),
        F.col("doc_id") % 101 == 0,
        k=3, n=3, df_cap_frac=10, query_broadcast=False,
    )


def _smoke_partial_probe_fixed_queries(spark, sf_dir):
    """q_retrieval_metrics_partial_probe with the query side held at a
    FIXED sample (vec_id % 23 == 0 AND vec_id < 1150 — constant ~50
    queries at every scale factor, since sf1 replicas offset ids
    upward): the probed pair count is |queries| x (corpus/n_cells) x
    nprobe, linear in the corpus, and the scorer stays |queries| x k."""
    from konohadataplatform_spark.operators import evaluation as EV
    from konohadataplatform_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter((F.col("vec_id") % 23 == 0) & (F.col("vec_id") < 1150))
    ranked = S.ann_ivf_topk_portable(
        emb, qs, k=10, n_cells=8, nprobe=2, iters=2
    )
    lab_q = qs.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("_ql")
    )
    lab_c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("_cl")
    )
    relevant = (
        lab_c.join(lab_q, F.col("_cl") == F.col("_ql"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    return EV.ranking_metrics(ranked, relevant, k=10)


def _smoke_domain_cap_shuffled(spark, sf_dir):
    """q_domain_cap's over-bound path: the kept-keys semi-join forced
    SHUFFLED (crawl-scale domain counts exceed broadcast budgets)."""
    from konohadataplatform_spark.operators import curation as CU
    from konohadataplatform_spark.queries.llmdata import _with_url

    passed = (
        CU.url_filters(_with_url(spark, sf_dir))
        .where(F.col("pass_url_filters"))
        .select("doc_id", "url")
    )
    return CU.apply_domain_cap(passed, cap=7, kept_broadcast=False)


def _smoke_stratified_quota_shuffled(spark, sf_dir):
    from konohadataplatform_spark.operators import curation as CU

    return CU.stratified_sample(
        load_table(spark, sf_dir, "documents"), "lang", quota=20,
        kept_broadcast=False,
    )


def _smoke_jl_rerank_fixed_queries(spark, sf_dir):
    """jl_rerank at a FIXED query sample (vec_id < 58 — constant ~2
    queries at every sf, since sf1 replicas offset ids upward): the
    candidate scan is |queries| x corpus (linear in the corpus at
    fixed queries) and the cosine rerank stays |queries| x k_cand."""
    from konohadataplatform_spark.operators.projection import (
        jl_rerank_topk,
    )

    return jl_rerank_topk(
        load_table(spark, sf_dir, "embeddings"),
        F.col("vec_id") < 58,
        k=5, k_cand=20,
    )


SMOKE_QUERIES += [
    # r14: scalable two-phase global ranks (range exchange + offsets)
    # and the probability-weighted EM (vocab-bounded after word freqs)
    "q_customer_order_summary",
    "q_customer_pareto",
    "q_balance_deciles",
    "q_unigram_em_prob",
]

EXTRA_SMOKES = {
    "q_lexical_topk_shuffled": _smoke_lexical_topk_shuffled,
    "q_bm25_topk_shuffled": _smoke_bm25_topk_shuffled,
    "q_partial_probe_fixed_queries": _smoke_partial_probe_fixed_queries,
    # r13 second wave: the group-cap shuffled fallbacks + the JL
    # pipeline at fixed queries (the registered % 29 split is
    # quadratic-by-contract like q_knn_bruteforce)
    "q_domain_cap_shuffled": _smoke_domain_cap_shuffled,
    "q_stratified_quota_shuffled": _smoke_stratified_quota_shuffled,
    "q_jl_rerank_fixed_queries": _smoke_jl_rerank_fixed_queries,
}
SMOKE_QUERIES += list(EXTRA_SMOKES)


def _replicate(
    spark, table: str, key_cols: list[str], out: str,
    offset: int | None = None,
) -> None:
    """10 copies with per-copy key offsets (one job, no driver loop
    over rows — the copy index comes from an explode). ``offset`` must
    be SHARED across tables related by the key (orders<->lineitem): an
    independently-computed max would silently break the FK whenever one
    side's max key exceeds the other's."""
    df = load_table(spark, SF01, table)
    if offset is None:
        offset = df.agg(F.max(key_cols[0])).collect()[0][0] + 1
    copies = df.withColumn(
        "_copy", F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1)))
    )
    for k in key_cols:
        copies = copies.withColumn(k, F.col(k) + F.col("_copy") * F.lit(offset))
    copies.drop("_copy").write.mode("overwrite").parquet(
        os.path.join(out, f"{table}.parquet")
    )


def build_sf1(spark) -> None:
    os.makedirs(SF1, exist_ok=True)
    for t in DIMS:
        load_table(spark, SF01, t).write.mode("overwrite").parquet(
            os.path.join(SF1, f"{t}.parquet")
        )
    okey = (
        load_table(spark, SF01, "orders").agg(F.max("o_orderkey")).collect()[0][0]
    )
    lkey = (
        load_table(spark, SF01, "lineitem").agg(F.max("l_orderkey")).collect()[0][0]
    )
    shared = max(okey, lkey) + 1
    _replicate(spark, "orders", ["o_orderkey"], SF1, offset=shared)
    _replicate(spark, "lineitem", ["l_orderkey"], SF1, offset=shared)
    _replicate(spark, "documents", ["doc_id"], SF1)
    _replicate(spark, "embeddings", ["vec_id"], SF1)


def _run_full(df) -> None:
    """Force FULL computation of every output column via the noop
    sink. ``count()`` (the pre-r10 method) understates rewrite-shaped
    queries badly: Catalyst prunes unreferenced projections AND
    eliminates the profile's left outer join entirely when the right
    side is a unique-keyed aggregate — so a count() of
    q_exact_substring_rewrite times little more than the base scan."""
    df.write.format("noop").mode("overwrite").save()


def _time(fn, warmup: bool = True) -> float:
    if warmup:
        fn()
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> int:
    spark = get_spark(app_name="konoha-scale-smoke")
    if "--rebuild" in sys.argv or not os.path.isdir(
        os.path.join(SF1, "lineitem.parquet")
    ):
        print("building sf1 dataset at", SF1, file=sys.stderr)
        build_sf1(spark)

    qs = {**all_queries(), **EXTRA_SMOKES}
    # --only <substr>: time just the matching queries (skip the
    # semantic/dHash extras) — for re-measuring one operator after a
    # targeted change without the ~15 min full rotation
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    names = [n for n in SMOKE_QUERIES if only is None or only in n]
    rows = []
    for name in names:
        # identical protocol at BOTH scale factors: one untimed warmup
        # pass (codegen/IO), one timed pass — r6 advice: mixing
        # methodologies (sf1 unwarmed) overstated the sf1 ratios
        t01 = _time(lambda: _run_full(qs[name](spark, SF01)))
        t1 = _time(lambda: _run_full(qs[name](spark, SF1)))
        plan = spark._jvm.PythonSQLUtils.explainString(
            qs[name](spark, SF1)._jdf.queryExecution(), "formatted"
        )
        assert "CartesianProduct" not in plan, name
        rows.append(
            {
                "query": name,
                "sf0.1_sec": round(t01, 3),
                "sf1_sec": round(t1, 3),
                "ratio_vs_10x_data": round(t1 / t01, 2),
                "sublinear": t1 / t01 < COPIES,
            }
        )

    if only is not None:
        print(json.dumps({"queries": rows, "copies": COPIES}))
        for r in rows:
            print(
                f"| {r['query']} | {r['sf0.1_sec']} | {r['sf1_sec']} |"
                f" {r['ratio_vs_10x_data']}x |",
                file=sys.stderr,
            )
        spark.stop()
        return 0

    # semantic dedup: the bits knob at sf1 (the shipped sf0.1 config is
    # bits=4; the SCALING.md contract says raise bits with corpus size)
    from konohadataplatform_spark.operators.similarity import semantic_dedup

    sem = {}
    for bits in (4, 8, 12):
        emb = load_table(spark, SF1, "embeddings")
        sem[f"bits={bits}"] = round(
            _time(lambda: semantic_dedup(emb, bits=bits).count(), warmup=False),
            3,
        )

    # dHash near-dup at sf1 REQUIRES the production geometry: the
    # 28-bit fixture hash (7-bit bands, 128 buckets) is quadratic
    # death at 600k docs; resize_to=(9,8) gives 64-bit hashes and
    # 16-bit bands (65k buckets). Measure with and without the
    # max_bucket skew cap (sf1 texts repeat 10x, so every bucket
    # carries identical-hash clumps — exactly the hotspot the cap is
    # for).
    from konohadataplatform_spark.operators import fingerprint as FP
    from konohadataplatform_spark.operators import multimodal as M

    def _neardup(cap):
        docs = load_table(spark, SF1, "documents")
        feats = FP.dhash_features(
            M.documents_as_bmp(docs), resize_to=(9, 8)
        )
        return FP.dhash_neardup_pairs(
            feats, nbits=64, bands=4, max_hamming=3, max_bucket=cap
        ).count()

    dh = {
        "uncapped": round(_time(lambda: _neardup(None), warmup=False), 3),
        "max_bucket=200": round(
            _time(lambda: _neardup(200), warmup=False), 3
        ),
    }

    out = {
        "queries": rows,
        "semantic_dedup_sf1": sem,
        "dhash_neardup_sf1_64bit": dh,
        "copies": COPIES,
    }
    print(json.dumps(out))
    print("\n| query | sf0.1 s | sf1 s | ratio (10x data) |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(
            f"| {r['query']} | {r['sf0.1_sec']} | {r['sf1_sec']} |"
            f" {r['ratio_vs_10x_data']}x |",
            file=sys.stderr,
        )
    print(f"semantic_dedup at sf1: {sem}", file=sys.stderr)
    print(f"dhash_neardup (64-bit) at sf1: {dh}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
