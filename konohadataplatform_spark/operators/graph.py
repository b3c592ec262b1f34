"""Iterative graph algorithms, DataFrame-native (beyond-reference).

Spark has no built-in PageRank short of GraphFrames (not in this
environment); the DataFrame-native form is power iteration — each
round one equi-join of the rank vector with the edge list plus one
aggregation on the destination. That IS the scalable shape: ranks and
edges co-partition on ``src``, so iteration k reuses iteration k-1's
partitioning, and the per-round cost is one shuffle of the (node,
rank) vector — never of the (much larger) edge list once it's
hash-partitioned.

The arithmetic is FIXED-POINT INTEGER, not float: ranks are scaled
longs and every division is an explicit floor ``div``, applied in a
fixed order. Floating-point power iteration cannot be replayed
bit-for-bit across engines (summation order changes the last ulp);
integer fixed-point can — which is what lets a plain-SQL oracle
verify an *iterative* algorithm exactly (the same trick as the IVF
k-means Lloyd replay in ``operators/similarity.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_SCALE = 10**12
DAMPING_NUM, DAMPING_DEN = 17, 20  # d = 0.85 as an exact rational


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    scale: int = PAGERANK_SCALE,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Deterministic fixed-point PageRank over a directed edge list.

    Semantics (the simple no-redistribution variant — dangling nodes'
    mass decays, documented rather than hidden):

        R_0(v)     = scale div N
        R_{t+1}(v) = (3*scale) div (20*N)
                     + (17 * sum_{u->v} (R_t(u) div outdeg(u))) div 20

    with N = |nodes|, every ``div`` an integer floor division in the
    order written. Edges are de-duplicated (unweighted graph). Returns
    (node, rank_scaled, out_degree) after ``iterations`` rounds.

    Scale notes: each round is rank⋈edges (both hash-partitioned on
    ``src`` — the edge side's shuffle happens once and is reused) +
    one agg on ``dst`` + a left join back to nodes. For deep
    iteration counts pass ``checkpoint_every`` to truncate the plan
    lineage (requires ``spark.sparkContext.setCheckpointDir``);
    3-hop rank needs no checkpoint. The one driver-side action is
    ``N = nodes.count()`` — a scalar, not a collect."""
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node",
            F.lit(None).cast("long").alias("rank_scaled"),
            F.lit(None).cast("long").alias("out_degree"),
        )
    teleport = (3 * scale) // (DAMPING_DEN * n)
    ranks = nodes.withColumn("r", F.lit(scale // n).cast("long"))
    for i in range(iterations):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("r div outdeg").alias("q"),
            )
            .groupBy("node")
            .agg(F.sum("q").alias("s"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.expr(
                    f"({DAMPING_NUM} * coalesce(s, 0L)) div {DAMPING_DEN}"
                )
            ).cast("long").alias("r"),
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.checkpoint(eager=False)
    return (
        ranks.join(deg, ranks["node"] == deg["src"], "left")
        .select(
            "node",
            F.col("r").alias("rank_scaled"),
            F.coalesce("outdeg", F.lit(0)).cast("long").alias("out_degree"),
        )
    )
