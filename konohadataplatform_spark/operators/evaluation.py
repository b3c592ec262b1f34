"""Ranking-quality evaluation: recall@k, MRR, nDCG over a ranked list.

The missing piece next to the retrieval stack (lexical/BM25/ANN/MMR):
once a pipeline ships a ranker, it needs a scorer — the standard IR
triple (recall@k, MRR, nDCG@k; Järvelin & Kekäläinen 2002 for DCG) over
a (query, hit, rank) relation and a (query, relevant_hit) ground-truth
relation (TREC qrels shape).

Exactness contract: every metric is integer-scaled (micro = 1e6) and
computed with integer division only —

- recall  = hits_at_k * SCALE div n_relevant
- MRR     = SCALE div first_relevant_rank
- DCG     = sum of a PRECOMPUTED integer weight per rank
            (weight[r] = floor(SCALE / log2(r + 1)), baked as literals
            into both the Spark plan and any SQL oracle, so no float
            log/sum ordering can diverge between engines)
- IDCG    = prefix-sum of the same weights at min(n_relevant, k)
- nDCG    = DCG * SCALE div IDCG

Scale: `ranked` is |queries| x k and `relevant` is qrels-sized — both
evaluation relations, orders of magnitude below corpus scale. The two
joins shuffle on query_id only; nothing here touches document/vector
payloads. The expensive part of evaluation is producing `ranked`
(cosine_topk / ann_ivf_topk_portable / bm25_topk), not scoring it.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RANK_SCALE = 1_000_000


def dcg_weight_table(k: int) -> list[int]:
    """Integer DCG weight per rank 1..k: floor(SCALE / log2(rank+1)).

    Computed once on the driver so Spark and the SQL oracle share the
    exact same literals — the only floating-point op (log2) happens
    here, never inside either engine.
    """
    return [int(RANK_SCALE / math.log2(r + 1)) for r in range(1, k + 1)]


def idcg_prefix_table(k: int) -> list[int]:
    """Prefix sums of `dcg_weight_table` — IDCG for n relevant docs
    (n <= k) is simply the n-th entry."""
    w = dcg_weight_table(k)
    out, acc = [], 0
    for x in w:
        acc += x
        out.append(acc)
    return out


def ranking_metrics(
    ranked: DataFrame,
    relevant: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    hit_col: str = "neighbor_id",
    rank_col: str = "knn_rank",
) -> DataFrame:
    """Per-query IR metrics for a ranked candidate list.

    ranked:   (query_col, hit_col, rank_col) — rank 1-based, from any
              of the rankers (cosine_topk's output fits directly).
    relevant: (query_col, hit_col) distinct ground-truth pairs.

    Returns one row per query present in `ranked`:
    (query_id, n_relevant, hits_at_k, first_rel_rank, recall_micro,
    mrr_micro, dcg_micro, idcg_micro, ndcg_micro) — all integers
    (first_rel_rank = 0 when no relevant hit lands in the top k).
    """
    w_arr = F.array(*[F.lit(x) for x in dcg_weight_table(k)])
    p_arr = F.array(*[F.lit(x) for x in idcg_prefix_table(k)])

    q = F.col(query_col).alias("query_id")
    rel = relevant.select(
        q, F.col(hit_col).alias("_hit")
    ).dropDuplicates(["query_id", "_hit"])
    n_rel = rel.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_relevant")
    )

    top = ranked.filter(F.col(rank_col) <= k).select(
        q, F.col(hit_col).alias("_hit"), F.col(rank_col).alias("_rk")
    )
    hits = (
        top.join(rel, ["query_id", "_hit"])
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("hits_at_k"),
            F.min("_rk").alias("_best"),
            F.sum(F.element_at(w_arr, F.col("_rk"))).alias("_dcg"),
        )
    )

    # n_rel and hits are per-QUERY aggregates (<= one row per query),
    # but the query set itself can be corpus-proportional (the
    # registered q_retrieval_metrics splits by vec_id % 23), so NO
    # explicit broadcast hint (r11 ADVICE): a hint bypasses Spark's
    # size threshold and OOMs on a corpus-scale query set. AQE
    # measures the aggregate outputs at runtime and broadcasts
    # exactly when they are actually small.
    base = ranked.select(q).distinct()
    out = (
        base.join(n_rel, "query_id", "left")
        .join(hits, "query_id", "left")
        .withColumn("n_relevant", F.coalesce("n_relevant", F.lit(0)))
        .withColumn("hits_at_k", F.coalesce("hits_at_k", F.lit(0)))
    )
    scale = F.lit(RANK_SCALE)
    idcg = F.when(
        F.col("n_relevant") > 0,
        F.element_at(
            p_arr, F.least(F.col("n_relevant"), F.lit(k)).cast("int")
        ),
    ).otherwise(F.lit(0))
    return out.select(
        "query_id",
        F.col("n_relevant").cast("bigint").alias("n_relevant"),
        F.col("hits_at_k").cast("bigint").alias("hits_at_k"),
        F.coalesce("_best", F.lit(0)).cast("int").alias("first_rel_rank"),
        F.when(
            F.col("n_relevant") > 0,
            F.expr(f"hits_at_k * {RANK_SCALE} DIV n_relevant"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("recall_micro"),
        F.when(
            F.col("_best").isNotNull(),
            F.expr(f"{RANK_SCALE} DIV _best"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("mrr_micro"),
        F.coalesce("_dcg", F.lit(0)).cast("bigint").alias("dcg_micro"),
        idcg.cast("bigint").alias("idcg_micro"),
        F.when(
            (idcg > 0) & F.col("_dcg").isNotNull(),
            F.col("_dcg") * scale,
        ).alias("_num"),
    ).select(
        "query_id",
        "n_relevant",
        "hits_at_k",
        "first_rel_rank",
        "recall_micro",
        "mrr_micro",
        "dcg_micro",
        "idcg_micro",
        F.when(
            F.col("_num").isNotNull(),
            F.expr("_num DIV idcg_micro"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("ndcg_micro"),
    )
