"""Physical-plan assertions — the 100 TB design gates.

Correctness says what a query returns; these tests pin down *how*:
filters reach the parquet scan (PushedFilters), column pruning holds
(ReadSchema), small dims broadcast instead of shuffling the fact table,
and whole-stage codegen covers the hot path. A regression here is a
scale regression even when results stay right.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from konohadataplatform_spark.queries import all_queries
from konohadataplatform_spark.sources.star_schema import load_table
from tests.conftest import SF_DIR

QUERIES = all_queries()


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def tree_of(df) -> str:
    """Just the operator tree (the part before the node details)."""
    return plan_of(df).split("\n\n(")[0]


def codegen_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen"
    )


def test_filter_pushdown_reaches_scan(spark):
    df = QUERIES["q6_forecast_revenue"](spark, SF_DIR)
    plan = plan_of(df)
    assert "PushedFilters" in plan
    # discount/quantity predicates must reach the parquet reader
    assert "l_discount" in plan.split("PushedFilters")[1][:400]


def test_column_pruning(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    plan = plan_of(li)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema, "scan reads unneeded columns"


def test_dim_joins_broadcast(spark):
    """q5's nation/region/supplier joins must be broadcasts, not
    shuffled sort-merge joins of the fact table."""
    df = QUERIES["q5_local_supplier"](spark, SF_DIR)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastHashJoin") >= 3


def test_wholestage_codegen_on_hot_path(spark):
    # AQE defers codegen planning, so inspect with AQE off — the
    # subtrees it reports are exactly what AQE generates at runtime.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = QUERIES["q1_pricing_summary"](spark, SF_DIR)
        plan = codegen_plan(df)
        assert "WholeStageCodegen subtrees" in plan
        assert "Found 0 WholeStageCodegen" not in plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_q1_is_two_stage_hash_agg(spark):
    """q1 must be scan -> partial agg -> exchange -> final agg: exactly
    one shuffle, map-side combine before it."""
    df = QUERIES["q1_pricing_summary"](spark, SF_DIR)
    tree = tree_of(df)
    assert tree.count("HashAggregate") == 2
    assert tree.count("Exchange") == 1
    assert "partial_sum" in plan_of(df)


def test_no_python_udfs_in_relational_queries(spark):
    """The §2 relational surface must stay fully JVM-side."""
    for name in [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier",
        "q_customer_order_summary",
        "q_events_sessionize",
        "q_doc_token_stats",
        "q_knn_bruteforce",
    ]:
        plan = plan_of(QUERIES[name](spark, SF_DIR))
        assert "BatchEvalPython" not in plan, f"{name} fell back to Python UDF"
        assert "ArrowEvalPython" not in plan, f"{name} uses pandas UDF needlessly"


def test_sessionize_single_shuffle_for_windows(spark):
    """Both window functions partition by user_id — Catalyst must reuse
    one exchange, and the final agg on (user_id, session_id) must not
    introduce an extra shuffle either (it's a superset key)."""
    df = QUERIES["q_events_sessionize"](spark, SF_DIR)
    plan = plan_of(df)
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, f"sessionize shuffles {n_exchanges}x, expected <=2"


def test_knn_broadcasts_queries_not_corpus(spark):
    df = QUERIES["q_knn_bruteforce"](spark, SF_DIR)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_exact_dedup_shuffles_digest_only(spark):
    df = QUERIES["q_doc_exact_dedup"](spark, SF_DIR)
    plan = plan_of(df)
    assert "md5" in plan
    # the Exchange node's Input column list must not carry the text body
    exch = [
        s for s in plan.split("\n\n") if s.startswith("(") and ") Exchange" in s
    ]
    assert exch, "expected an Exchange node"
    assert "text#" not in exch[0], "document bodies cross the shuffle"


def test_aqe_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_pivot_two_phase_agg(spark):
    """Explicit-values pivot: Spark pre-aggregates by (groupBy, pivot)
    keys then pivots — two hash-agg phases, two exchanges of
    decreasing cardinality, and crucially NO values-discovery job
    (explicit values) and no more exchanges than that."""
    df = QUERIES["q_pivot_status_year"](spark, SF_DIR)
    tree = tree_of(df)
    assert tree.count("Exchange") <= 2, tree
    assert "HashAggregate" in tree


def test_cube_is_expand_plus_one_shuffle(spark):
    """CUBE plans as Expand feeding one partial+final agg — grouping
    sets don't multiply shuffles."""
    df = QUERIES["q_cube_revenue"](spark, SF_DIR)
    tree = tree_of(df)
    assert "Expand" in tree
    assert tree.count("Exchange") == 1, tree


def test_gapfill_spine_join_is_broadcast(spark):
    """The calendar spine is O(days) rows — its join against the daily
    agg must broadcast, never shuffle the fact side."""
    df = QUERIES["q_date_spine_gapfill"](spark, SF_DIR)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_rolling_window_single_partition_shuffle(spark):
    """The 90-day RANGE frame shuffles once on the partition key and
    computes both window aggs in one Window node."""
    df = QUERIES["q_rolling_90d_orders"](spark, SF_DIR)
    tree = tree_of(df)
    assert tree.count("Window") == 1, tree
    # one exchange for the window partitioning (plus AQE reads)
    assert tree.count("Exchange") <= 2, tree


def test_exact_dedup_never_shuffles_text(spark):
    """exact_dedup's exchange carries digests + ids, not document
    bodies."""
    from konohadataplatform_spark.operators.dedup import exact_dedup

    docs = load_table(spark, SF_DIR, "documents")
    plan = plan_of(exact_dedup(docs))
    exchange_part = plan[plan.index("Exchange"):]
    assert "text_hash" in plan
    # the post-exchange aggregate works on the hash, not raw text
    assert "md5" in plan


def test_decontaminate_broadcasts_eval_grams(spark):
    """The eval gram set must reach the training side as a broadcast
    hash join — training grams never shuffle for the match."""
    df = QUERIES["q_decontaminate"](spark, SF_DIR)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan


def test_boilerplate_reuses_gram_exchange(spark):
    """df-agg and join-back both hash on gram; with the final doc agg
    that is at most 3 exchanges (gram, gram-reuse-or-AQE, doc_id)."""
    df = QUERIES["q_boilerplate_coverage"](spark, SF_DIR)
    plan = plan_of(df)
    assert plan.count("Exchange hashpartitioning") <= 3


def test_adapted_tpch_plans_broadcast_dims(spark):
    """The five adapted TPC-H queries must never cartesian-join and
    must broadcast their dimension sides — the lineitem-derived supply
    relation is the only side allowed to shuffle."""
    for name, min_bcast in [
        ("q2_min_cost_supplier", 3),
        ("q9_product_type_profit", 3),
        ("q11_important_stock", 2),
        ("q16_supplier_part_counts", 2),
        ("q20_potential_promotion", 2),
    ]:
        plan = plan_of(QUERIES[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, name
        assert plan.count("BroadcastHashJoin") + plan.count(
            "BroadcastNestedLoopJoin"
        ) >= min_bcast, (name, plan.count("BroadcastHashJoin"))


def test_packing_windows_are_shard_partitioned(spark):
    """The running-total windows in sequence packing and the curation
    pipeline must partition on (lang, shard_id) — a lang-only window
    means one task sorts a whole language's corpus at 100 TB
    (SCALING.md 'Training-pipeline queries')."""
    import re

    for name in ("q_sequence_packing", "q_curation_pipeline"):
        plan = plan_of(QUERIES[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, name
        m = re.search(r"windowspecdefinition\(([^)]*)\)", plan)
        assert m, (name, "no window in plan")
        spec = m.group(1)
        assert "lang" in spec and "shard_id" in spec, (name, spec)
        # and the exchange feeding it hashes on the shard key too
        assert re.search(r"hashpartitioning\([^)]*shard_id", plan), name


def test_token_budget_pack_two_phase(spark):
    """r5-verdict fix: the running-total window must key on
    (lang, shard) — the lang-only form sorts each language's entire
    corpus in a single task. The lang-only offsets window is fine: it
    runs over the metadata-sized (lang, shard) aggregate."""
    import re

    plan = plan_of(QUERIES["q_token_budget_pack"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert any("lang" in s and "shard" in s for s in specs), specs
    assert re.search(r"hashpartitioning\([^)]*shard", plan), "no shard exchange"


def test_semantic_dedup_no_forced_broadcast(spark):
    """r5-verdict fix: the keep-join must NOT force-broadcast the
    duplicate-id set (it grows with the corpus — at 100 TB that's a
    driver OOM). AQE may still CHOOSE broadcast at small SF; the gate
    is that no hint appears in the declared plan."""
    df = QUERIES["q_semantic_dedup"](spark, SF_DIR)
    logical = df._jdf.queryExecution().logical().toString()
    assert "UnresolvedHint" not in logical
    assert "ResolvedHint" not in logical
    plan = plan_of(df)
    assert "CartesianProduct" not in plan


def test_ingest_candidate_join_no_corpus_exchange(spark, tmp_path):
    """r6-verdict fix (the last shipped scale-killer): the streaming
    ingest near-dup probe must read the PRE-EXPLODED bucket store and
    probe it with a broadcast of the batch's keys — per micro-batch
    there is no corpus-side explode (banding happened at append time)
    and no corpus-side shuffle. Gates: no SortMergeJoin, no shuffle
    Exchange whose input carries the bucket key, and the bucket-store
    scan reads only (sid, bkey)."""
    from konohadataplatform_spark.catalog import SnapshotCatalog
    from konohadataplatform_spark.operators import dedup as D
    from konohadataplatform_spark.streaming.ingest import DocIngestPipeline

    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    pipe = DocIngestPipeline(spark, cat, "corpus")
    pipe.apply_batch(
        spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog and then "
                 "keeps on running through the quiet green field today",
              "en", "a", None)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ),
        batch_id=0,
    )
    batch2 = spark.createDataFrame(
        [(2, "an entirely different document about spark physical plans "
             "and broadcast joins in distributed query execution engines",
          "en", "a", None)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    new_index = D.minhash_index(batch2, "text", "doc_id",
                                pipe.ngram, pipe.num_perm)
    cands = D.prebucketed_candidates(
        cat.read(pipe.buckets_table), new_index,
        bands=pipe.bands, num_perm=pipe.num_perm,
    )
    plan = plan_of(cands)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan
    # no shuffle Exchange may carry the bucket key: the corpus store
    # flows scan -> broadcast probe; only candidate PAIRS (a_id, b_id)
    # ever shuffle (the distinct)
    for section in plan.split("\n\n"):
        if section.startswith("(") and ") Exchange" in section:
            assert "bkey" not in section, section
    # column pruning: the bucket-store scan reads two longs, nothing
    # else (no sig/shingles resurrection)
    scans = [s for s in plan.split("\n\n")
             if ") Scan parquet" in s and "bkey" in s]
    assert scans, "bucket-store scan missing from plan"
    assert all("shingles" not in s and "sig" not in s for s in scans), scans


def test_ingest_digest_probe_no_corpus_shuffle(spark, tmp_path):
    """The exact-dedup gate's corpus side (the persisted digest table)
    must be probed by broadcast, never sort-merge-joined: the only
    shuffle allowed is the partial/final agg over the (tiny) match
    set."""
    from konohadataplatform_spark.catalog import SnapshotCatalog
    from konohadataplatform_spark.operators import text as TX
    from konohadataplatform_spark.streaming.ingest import DocIngestPipeline

    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    pipe = DocIngestPipeline(spark, cat, "corpus")
    pipe.apply_batch(
        spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog and then "
                 "keeps on running through the quiet green field today",
              "en", "a", None)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ),
        batch_id=0,
    )
    batch = spark.createDataFrame(
        [(2, "some new candidate document text for the digest gate",)],
        "doc_id long, text string",
    ).withColumn("text_hash", TX.fingerprint(F.col("text")))
    matches = (
        cat.read(pipe.digests_table)
        .join(F.broadcast(batch.select("text_hash").distinct()), "text_hash")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("_owner"))
    )
    probed = batch.join(F.broadcast(matches), "text_hash", "left_outer")
    plan = plan_of(probed)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_ingest_verification_prunes_index_scan(spark, tmp_path):
    """Verification must read the (sid, shingles) index sid-pruned —
    the IN-list reaches the parquet scan as a pushed filter so row-
    group stats can prune; the index is never joined wholesale."""
    from konohadataplatform_spark.catalog import SnapshotCatalog
    from konohadataplatform_spark.streaming.ingest import DocIngestPipeline

    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    pipe = DocIngestPipeline(spark, cat, "corpus")
    pipe.apply_batch(
        spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog and then "
                 "keeps on running through the quiet green field today",
              "en", "a", None)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ),
        batch_id=0,
    )
    pruned = cat.read(pipe.index_table).filter(F.col("sid").isin([1, 7]))
    plan = plan_of(pruned)
    assert "PushedFilters: [In(sid" in plan or "In(sid," in plan, plan


def test_semantic_index_add_partition_prunes(spark, tmp_path):
    """r7: the vs-index read inside semantic_index_add must be a
    PARTITION-PRUNED scan of the bucket-partitioned index (the
    touched-bucket IN list reaches PartitionFilters), not a full scan
    filtered downstream."""
    from pyspark.sql import Row

    from konohadataplatform_spark.catalog import SnapshotCatalog
    from konohadataplatform_spark.operators import similarity as S

    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i % 3 - 1) or 1.0] * 8)
         for i in range(12)]
    )
    S.build_semantic_index(cat, "c", base, bits=4, threshold=0.9)
    # the pruned read the add performs: index filtered to batch buckets
    idx = cat.read("c__semidx").filter(F.col("bucket").isin([3, 7]))
    plan = idx._sc._jvm.PythonSQLUtils.explainString(
        idx._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "bucket" in pf.group(1), plan


def test_jl_project_zero_exchange(spark):
    """r13 tier regression gate: jl_project is one straight-line
    codegen projection — any exchange appearing in its plan is a
    scale regression (the ±1 dot products must stay unrolled)."""
    import re

    tree = tree_of(QUERIES["q_jl_project"](spark, SF_DIR))
    assert not re.search(r"\bExchange\b", tree), tree


def test_jl_neighbors_spread_and_group_limit(spark):
    """r13 bench fixes pinned: the corpus side of the JL pair scan is
    _spread across partitions (a small parquet is ONE input split —
    without the repartition the whole scan runs single-task), and the
    per-query top-k goes through WindowGroupLimit (rank pushdown), not
    a full sort of every candidate pair."""
    df = QUERIES["q_jl_neighbors"](spark, SF_DIR)
    plan = plan_of(df)
    assert "WindowGroupLimit" in plan, "rank-limit pushdown lost"
    assert "Exchange" in tree_of(df)  # the deliberate spread exchange


def test_filter_funnel_three_exchanges_no_gram_shuffle(spark):
    """r14 funnel restructure pinned: one documents scan feeding the
    composed flag projections + exact_dedup's narrow digest shuffle +
    the per-source agg — at most 3 distinct exchanges, and NO exchange
    keyed on a gram/text column (the r13 shape shuffled (doc_id, gram)
    pairs at corpus token mass)."""
    import re

    plan = plan_of(QUERIES["q_filter_funnel"](spark, SF_DIR))
    tree = plan.split("\n\n(")[0]
    n_ex = len(re.findall(r"\b(?:Broadcast)?Exchange\b", tree))
    assert n_ex <= 3, tree
    assert "gram" not in plan.lower().replace("program", "")


def test_customer_order_summary_gated_two_phase_rank(spark):
    """r14 optimization round: the W1/W3 global rank is COUNTED-GATED
    (operators/ranking.py) — at the test SF the customer probe is
    under the bound, so the plan is the lazy single-window spelling
    (no checkpoint job chain); forcing ``small=False`` must produce
    the two-phase range plan with the mid-arithmetic rank and NO
    data-side rank WindowExec. Parity across the flip is pinned by
    tests/test_ranking.py::test_gate_flip_parity."""
    import re

    from konohadataplatform_spark.operators.ranking import (
        scalable_rank_stats,
    )

    # gated small path at test scale: fully lazy, no checkpoint scan
    plan = plan_of(QUERIES["q_customer_order_summary"](spark, SF_DIR))
    assert "localcheckpoint" not in plan.lower(), (
        "small-relation rank should stay one lazy window under the gate"
    )
    # forced two-phase path: checkpointed _mid arithmetic, and no
    # window PARTITIONED by _pid (the offsets window merely ORDERS by
    # _pid over the one-row-per-partition counts relation)
    cust = load_table(spark, SF_DIR, "customer")
    forced = scalable_rank_stats(
        cust,
        [F.col("c_acctbal").asc(), F.col("c_custkey").asc()],
        rn_col="_rn",
        small=False,
    )
    fplan = plan_of(forced)
    assert "localcheckpoint" in fplan.lower(), "two-phase rank lost"
    assert "_mid" in fplan and "_m0" in fplan, "mid-arithmetic rank lost"
    assert not re.search(r"windowspecdefinition\(_pid#\d+,", fplan), (
        "data-side rank window reappeared"
    )


def test_balance_deciles_and_pareto_gated(spark):
    """Under the counted gate the mart-scale plans are lazy single
    windows; the two-phase fallback is exercised by the forced-path
    plan test above and the parity test in test_ranking.py."""
    for q in ("q_balance_deciles", "q_customer_pareto"):
        plan = plan_of(QUERIES[q](spark, SF_DIR))
        assert "localcheckpoint" not in plan.lower(), q
        assert "row_number()" in plan, q
