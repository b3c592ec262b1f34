"""Repo-wide broadcast audit (r13, closing VERDICT r12 #4).

Rounds 10-12 each found ONE more ungated corpus-proportional
``F.broadcast`` (r10 cosine, r11 decontamination, r12 retrieval +
group caps). This test closes the class: every ``broadcast(`` call
site in the package must be WHITELISTED below with its justification
category, and the whitelist pins the per-function site COUNT — adding
a broadcast anywhere (even inside an already-audited function) fails
the test until the new site is audited and recorded.

Categories:

- ``scalar``   — a 1-row (or fixed-few-row) aggregate: COUNT/SUM
                 totals, thresholds. Size is constant by construction.
- ``metadata`` — bounded by a model/sketch/config size that does not
                 grow with the corpus: centroids, PQ codebooks, LM
                 tables capped by vocab caps, range offsets (one row
                 per partition), Bloom/CMS bitmaps, trained weights.
- ``dim``      — a TPC-H dimension or dimension subset (region,
                 nation, small filtered part/supplier sides): the
                 star-schema contract is that dims are broadcastable.
- ``gated``    — behind the r12/r13 counted gate (an explicit
                 True/False override or a bounded count/LIMIT probe
                 deciding broadcast vs shuffled join).
- ``batch``    — bounded by a streaming micro-batch (per-batch probe
                 relations in the ingest path), not by the corpus.
"""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parents[1] / "konohadataplatform_spark"

# (module, enclosing-function) -> (expected site count, category)
WHITELIST: dict[tuple[str, str], tuple[int, str]] = {
    # classifier: trained weight vector (hashed dims, fixed width)
    ("operators/bpe.py", "unigram_train_em_prob"): (1, "scalar"),
    ("operators/classifier.py", "train_perceptron"): (1, "metadata"),
    # curation (apply_group_cap routes through gating.gated_broadcast)
    ("operators/curation.py", "importance_weights"): (1, "scalar"),
    ("operators/curation.py", "shard_plan"): (1, "metadata"),
    ("operators/curation.py", "lang_temperature_quota"): (1, "scalar"),
    ("operators/curation.py", "epoch_schedule"): (1, "scalar"),
    # dedup
    ("operators/dedup.py", "ngram_decontaminate"): (1, "gated"),
    ("operators/dedup.py", "prebucketed_candidates._maybe_bcast"): (
        1, "gated",
    ),
    ("operators/dedup.py", "prebucketed_candidates"): (2, "gated"),
    ("operators/dedup.py", "cross_corpus_contamination"): (1, "gated"),
    # cross_source_overlap: per-source set sizes (bounded by #sources)
    ("operators/dedup.py", "cross_source_overlap"): (2, "metadata"),
    # ranking: one offset row per range partition
    ("operators/ranking.py", "scalable_rank_stats"): (1, "metadata"),
    # projection (r13): JL query side behind the counted gate
    ("operators/projection.py", "jl_neighbors"): (1, "gated"),
    # gating (r13): THE shared counted-gate helper — the one
    # broadcast site every equi-join gate routes through
    ("operators/gating.py", "gated_broadcast"): (1, "gated"),
    # retrieval: 1-row totals (gates route through gating.py)
    ("operators/retrieval.py", "lexical_topk"): (1, "scalar"),
    ("operators/retrieval.py", "doc_keywords"): (1, "scalar"),
    ("operators/retrieval.py", "bm25_topk"): (2, "scalar"),
    # similarity: counted gates + centroid/codebook metadata
    ("operators/similarity.py", "cosine_topk"): (1, "gated"),
    ("operators/similarity.py", "ann_lsh_topk"): (1, "gated"),
    ("operators/similarity.py", "ann_ivf_topk"): (1, "gated"),
    ("operators/similarity.py", "ivf_index_search"): (1, "gated"),
    ("operators/similarity.py", "cosine_pairs_exact"): (1, "gated"),
    ("operators/similarity.py", "ann_ivf_topk_portable"): (1, "gated"),
    ("operators/similarity.py", "semantic_index_add"): (4, "metadata"),
    ("operators/similarity.py", "pq_quantize_portable"): (1, "metadata"),
    ("operators/similarity.py", "ann_pq_topk_portable"): (2, "metadata"),
    ("operators/similarity.py", "ann_ivfpq_topk_portable"): (3, "metadata"),
    ("operators/similarity.py", "mmr_candidates_grid"): (1, "metadata"),
    ("operators/similarity.py", "mmr_candidates_ivf"): (1, "metadata"),
    ("operators/similarity.py", "hard_negatives_grid"): (1, "metadata"),
    ("operators/similarity.py", "centroid_outliers"): (1, "metadata"),
    ("operators/similarity.py", "semantic_decontaminate"): (1, "gated"),
    # sketches: fixed-size bitmaps / CMS tables
    ("operators/sketches.py", "bloom_probe"): (1, "metadata"),
    ("operators/sketches.py", "cms_heavy_hitters"): (1, "scalar"),
    # temporal: bucket bounds (one row per range bucket)
    ("operators/temporal.py", "range_join_buckets"): (1, "metadata"),
    # text: 1-row corpus totals (the LM joins themselves are shuffled)
    ("operators/text.py", "unigram_surprisal"): (1, "scalar"),
    ("operators/text.py", "bigram_surprisal"): (1, "scalar"),
    ("operators/text.py", "trigram_backoff_surprisal"): (1, "scalar"),
    # vocab_divergence: per-group totals (bounded by #sources) + 1 row
    ("operators/text.py", "vocab_divergence"): (2, "metadata"),
    # registered queries: 1-row totals / fixture-bounded sides
    ("queries/analytics.py", "q_events_anomaly"): (1, "scalar"),
    ("queries/analytics.py", "q_merge_sql_nation_balances"): (1, "dim"),
    ("queries/events.py", "q_events_sliding_distinct"): (1, "scalar"),
    ("queries/llmdata.py", "q_knn_label_purity"): (2, "scalar"),
    ("queries/llmdata.py", "q_corpus_mixture"): (1, "scalar"),
    ("queries/llmdata.py", "q_embedding_quantize"): (1, "metadata"),
    ("queries/llmdata.py", "q_temperature_mixture"): (1, "scalar"),
    ("queries/llmdata.py", "q_token_budget_pack"): (1, "scalar"),
    ("queries/llmdata.py", "q_dup_cluster_histogram"): (1, "scalar"),
    # TPC-H: dimension-side broadcasts (the star-schema contract)
    ("queries/tpch.py", "q3_shipping_priority"): (1, "dim"),
    ("queries/tpch.py", "q5_local_supplier"): (3, "dim"),
    ("queries/tpch.py", "q10_returned_items"): (1, "dim"),
    ("queries/tpch.py", "q14_promo_revenue"): (1, "dim"),
    ("queries/tpch.py", "q19_disjunctive_filter"): (1, "dim"),
    ("queries/tpch.py", "q7_nation_volume"): (3, "dim"),
    ("queries/tpch.py", "q8_market_share"): (4, "dim"),
    ("queries/tpch.py", "q22_global_sales"): (1, "scalar"),
    ("queries/tpch.py", "q17_small_quantity"): (1, "dim"),
    ("queries/tpch.py", "q_supplier_scorecard"): (2, "dim"),
    ("queries/tpch.py", "q21_waiting_supplier"): (1, "dim"),
    ("queries/tpch.py", "q2_min_cost_supplier"): (4, "dim"),
    ("queries/tpch.py", "q9_product_type_profit"): (3, "dim"),
    ("queries/tpch.py", "q11_important_stock"): (3, "dim"),
    ("queries/tpch.py", "q16_supplier_part_counts"): (2, "dim"),
    ("queries/tpch.py", "q20_potential_promotion"): (3, "dim"),
    # streaming ingest: per-micro-batch probe relations
    ("streaming/ingest.py", "DocIngestPipeline.apply_batch"): (4, "batch"),
}

CATEGORIES = {"scalar", "metadata", "dim", "gated", "batch"}


def _broadcast_sites() -> dict[tuple[str, str], int]:
    """(module, enclosing-function) -> count of broadcast( call sites,
    AST-walked over the whole package (tests excluded)."""
    found: dict[tuple[str, str], int] = {}

    for p in sorted(PKG.rglob("*.py")):
        src = p.read_text()
        if "broadcast(" not in src:
            continue
        rel = str(p.relative_to(PKG))
        tree = ast.parse(src)

        def walk(node, stack):
            for child in ast.iter_child_nodes(node):
                ns = stack
                if isinstance(
                    child,
                    (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef),
                ):
                    ns = stack + [child.name]
                if isinstance(child, ast.Call):
                    fn = child.func
                    is_b = (
                        isinstance(fn, ast.Attribute)
                        and fn.attr == "broadcast"
                    ) or (isinstance(fn, ast.Name) and fn.id == "broadcast")
                    if is_b:
                        key = (rel, ".".join(ns) or "<module>")
                        found[key] = found.get(key, 0) + 1
                walk(child, ns)

        walk(tree, [])
    return found


def test_every_broadcast_site_is_audited():
    """Any broadcast( call site not in the whitelist — or a count
    change inside an audited function — fails until re-audited."""
    found = _broadcast_sites()
    extra = {
        k: n for k, n in found.items()
        if k not in WHITELIST or WHITELIST[k][0] != n
    }
    assert not extra, (
        "unaudited broadcast sites (module, function) -> count — audit "
        f"the size contract and add to WHITELIST: {sorted(extra.items())}"
    )


def test_whitelist_has_no_stale_entries():
    """Entries whose function no longer broadcasts must be pruned, so
    the whitelist stays an exact census."""
    found = _broadcast_sites()
    stale = [k for k in WHITELIST if k not in found]
    assert not stale, f"stale whitelist entries: {sorted(stale)}"


def test_whitelist_categories_valid():
    assert all(cat in CATEGORIES for _, cat in WHITELIST.values())
