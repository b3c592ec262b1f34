"""Generate PLANS.md: the physical plan for every headline query, with
the scale-relevant plan features called out (pushed filters, read
schemas, broadcast joins, partial aggregation, codegen spans).

Run: python tools/explain_report.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from konohadataplatform_spark.queries import all_queries  # noqa: E402
from konohadataplatform_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q_customer_order_summary",
    "q_daily_order_metrics",
    "q_events_sessionize",
    "q_doc_exact_dedup",
    "q_minhash_dedup",
    "q_knn_bruteforce",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_stock",
    "q16_supplier_part_counts",
    "q20_potential_promotion",
    "q_asof_purchase_view",
    "q_pivot_status_year",
    "q_cube_revenue",
    "q_rolling_90d_orders",
    "q_lateral_top2",
    "q_events_sliding_distinct",
    "q_embedding_neardup",
    "q_sequence_packing",
    "q_embedding_quantize",
    "q_corpus_mixture",
    "q_merge_sql_nation_balances",
    "q_simhash_clusters",
    "q_ann_lsh",
    "q_png_decode",
    "q_semantic_dedup",
    "q_chunk_dedup",
    "q_curation_pipeline",
    "q_temperature_mixture",
    "q_token_budget_pack",
    "q_decontaminate",
    "q_boilerplate_coverage",
    "q_repetition_stats",
    "q_doc_entropy",
    "q_jpeg_decode",
    "q_unigram_surprisal",
    "q_gif_frame_sample",
    "q_wav_windows",
    "q_events_transitions",
    "q_image_dhash_groups",
    "q_image_dhash_neardup",
    "q_audio_fingerprint",
    "q_gif_scene_cuts",
    "q_bloom_filter_words",
    "q_bloom_decontaminate",
    "q_cms_sketch_bigrams",
    "q_cms_heavy_hitters",
    "q_hll_register_sketch",
    "q_hll_cardinality",
    "q_inverted_index",
    "q_lexical_topk",
    "q_pq_quantize",
    "q_ann_pq",
    # r8: tokenizer training/encode, curation caps, diversity rerank
    "q_ann_ivfpq",
    "q_source_caps",
    "q_centroid_classify",
    "q_bpe_train_merges",
    "q_bpe_encode_docs",
    "q_mmr_rerank",
    # r8c: corpus rewrite, BM25, DSIR selection, perceptron classifier
    "q_chunk_dedup_rewrite",
    "q_bm25_topk",
    "q_importance_weights",
    "q_quality_classifier",
    # r8d: hybrid fusion, passage store, shard layout, quality gates
    "q_hybrid_rrf",
    "q_passage_bm25",
    "q_shard_plan",
    "q_embedding_outliers",
    "q_wav_utterances",
    # r9: span removal, decontamination, scrub/filter/balance tier
    "q_exact_substring_rewrite",
    "q_mmr_rerank_ann",
    "q_pii_redact",
    "q_gopher_rules",
    "q_lang_temperature_quota",
    "q_fuzzy_decontaminate",
    "q_cluster_best_quality",
    # r10: repetition/dup-ngram batteries, PII v2, training-example
    # slicers, normalize-dedup, LM perplexity partition, bitext mining
    "q_gopher_repetition",
    "q_gopher_dup_ngrams",
    "q_pii_redact_v2",
    "q_mixture_sample",
    "q_context_windows",
    "q_span_corrupt",
    "q_normalized_dedup",
    "q_doc_keywords",
    "q_perplexity_partition",
    "q_margin_mining",
    "q_stratified_quota_sample",
    "q_data_card",
    # r11: C4 battery, IR metrics, script profile, fertility, overlap
    # matrix, contrastive pairs, vocab divergence, calibration
    "q_c4_filters",
    "q_token_shards",
    "q_retrieval_metrics",
    "q_script_profile",
    "q_tokenizer_fertility",
    "q_cross_source_overlap",
    "q_contrastive_pairs",
    "q_vocab_divergence",
    "q_classifier_calibration",
    # r12: URL/domain front door, unigram tokenizer, token-mass
    # funnel, partial-probe metrics, domain quality
    "q_url_filters",
    "q_url_filters_table",
    "q_domain_cap",
    "q_url_dedup",
    "q_domain_quality",
    "q_unigram_tokenizer",
    "q_unigram_encode_docs",
    "q_tokenizer_compare",
    "q_filter_funnel",
    "q_retrieval_metrics_partial_probe",
    "q_semantic_decontaminate",
    # r13: EM expectation prune, dimensionality-reduction tier
    "q_unigram_em_usage",
    "q_jl_project",
    "q_jl_neighbors",
    "q_jl_rerank",
    "q_embedding_covariance",
    "q_dimension_correlation",
]


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def features(plan: str) -> list[str]:
    out = []
    n_bhj = plan.count("BroadcastHashJoin")
    n_smj = plan.count("SortMergeJoin")
    n_ex = len(re.findall(r"\bExchange\b", plan.split("\n\n(")[0]))
    n_agg_pairs = plan.count("HashAggregate") // 2
    if n_bhj:
        out.append(f"{n_bhj} broadcast hash join(s) — no fact-side shuffle")
    if n_smj:
        out.append(f"{n_smj} sort-merge join(s)")
    out.append(f"{n_ex} exchange(s) in the tree")
    if n_agg_pairs:
        out.append(f"{n_agg_pairs} partial+final agg pair(s) (map-side combine)")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    nonempty = [p for p in pushed if p.strip()]
    if nonempty:
        out.append(f"pushed filters: {'; '.join(nonempty[:3])}")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if schemas:
        widths = [len(s.split(",")) for s in schemas]
        out.append(
            f"column pruning: scans read {widths} column(s) per table"
        )
    if "WholeStageCodegen" in plan:
        out.append("whole-stage codegen on the hot path")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="explain-report")
    qs = all_queries()
    # r14: the FULL registry — the curated HEADLINE order first (the
    # plans reviewers read most), then every remaining registered
    # query alphabetically, so no operator's plan goes unrecorded.
    ordered = [n for n in HEADLINE if n in qs] + sorted(
        n for n in qs if n not in HEADLINE
    )
    lines = [
        "# PLANS — physical plans for every registered query",
        "",
        f"Generated by `tools/explain_report.py` at `{sf_dir}` over the",
        f"full registry ({len(ordered)} queries). The feature summary",
        "above each plan is what matters at 100 TB:",
        "filters reaching the scan, pruned read schemas, broadcasts",
        "instead of fact-table shuffles, map-side partial aggregation,",
        "and wide whole-stage-codegen spans.",
        "",
    ]
    for name in ordered:
        df = qs[name](spark, sf_dir)
        plan = plan_of(df)
        tree = plan.split("\n\n(")[0].rstrip()
        # iterative operators (connected components, Lloyd loops) nest a
        # join tree per round — the rendered plan can reach megabytes.
        # The feature summary already carries the scale story; cap the
        # printed tree so PLANS.md stays reviewable.
        tlines = tree.split("\n")
        if len(tlines) > 150:
            tree = "\n".join(
                tlines[:150]
                + [f"... truncated ({len(tlines) - 150} more tree lines)"]
            )
        lines.append(f"## {name}")
        lines.append("")
        for f in features(plan):
            lines.append(f"- {f}")
        lines.append("")
        lines.append("```")
        lines.append(tree)
        lines.append("```")
        lines.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"wrote PLANS.md ({len(lines)} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
