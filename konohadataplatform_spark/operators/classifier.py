"""In-engine quality-classifier training: an integer-exact batch
perceptron over hashed bag-of-n-gram features (beyond-reference
surface — the fastText-style "train a quality/domain classifier on the
corpus, then score every document with it" step of an LLM data
pipeline, e.g. CCNet/GPT-3-style quality filtering).

Engine-portability contract (same as the rest of the repo): features
hash through md5 (identical hex in Spark and DuckDB), weights update
with learning rate 1 in pure int64 arithmetic, and the batch update is
deterministic — so the trained weights, every margin, and every
prediction are bit-for-bit reproducible by an unrolled-CTE SQL oracle.

Batch perceptron (lr=1), T iterations from w = 0:

    margin(d) = sum_dim w[dim] * x[d, dim]
    mis       = { d : y_d * margin(d) <= 0 }
    w        += sum_{d in mis} y_d * x[d]

The first iteration (w = 0 -> everything misclassified) makes w_1 the
class-mass difference — a Rocchio-style init — and later iterations
correct the boundary.

Scale shapes (100 TB contract):
- The feature relation is one explode + partial+final count per
  (doc, dim); dims is small (default 64 + bias), so every per-dim
  aggregate is metadata-sized.
- The weight vector is collected to the driver each iteration
  (dims+1 longs — same metadata-size collect contract as the IVF
  KMeans loop in operators/similarity.py) and rejoined as a broadcast
  literal, keeping lineage flat across iterations.
- Margins group by unique doc_id (unskewed); the misclassified-doc
  filter is a semi-join on doc_id. No windows, no Python UDFs.
- Overflow bound: |w| grows at most by the corpus token mass per
  iteration; sum(w * x) must fit int64 (token mass * per-doc tokens
  < 9e18 — beyond that widen to decimal(38,0)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BIAS_DIM = -1

# THE feature-hash definition (md5 nibbles -> dim), shared by the
# exploded training path and the per-row scorer so they cannot drift.
DIM_SQL = "cast(conv(substring(md5({g}), 1, 4), 16, 10) as bigint) % {dims}"


def hashed_features(
    docs: DataFrame,
    label_pred,
    dims: int = 64,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, y, dim, x): hashed bag-of-n-grams plus a constant bias
    feature (dim = -1, x = 1) for EVERY doc — so zero-token docs still
    get a margin. dim = int(first 4 hex chars of md5(term)) % dims
    (portable: DuckDB reassembles the same nibbles); y in {+1, -1}
    from ``label_pred``."""
    from konohadataplatform_spark.operators.retrieval import ngram_tokens

    ids = docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(label_pred, 1).otherwise(-1).alias("y"),
    )
    grams = (
        ngram_tokens(docs, n, text_col, id_col)
        .select(
            "doc_id",
            F.expr(DIM_SQL.format(g="term", dims=int(dims))).alias("dim"),
        )
        .groupBy("doc_id", "dim")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    bias = ids.select("doc_id", F.lit(BIAS_DIM).alias("dim"), F.lit(1).cast("long").alias("x"))
    return (
        grams.unionByName(bias.select("doc_id", "dim", "x"))
        .join(ids, "doc_id")
        .select("doc_id", "y", "dim", "x")
    )


def train_perceptron(
    spark: SparkSession, feats: DataFrame, iters: int = 3
) -> dict[int, int]:
    """dim -> weight after ``iters`` exact batch-perceptron updates.
    ``feats`` is re-scanned once per iteration — cache it upstream if
    it isn't a cheap re-read. The collect is dims+1 longs (metadata).

    This is the exploded-feature-relation spelling (kept for callers
    that already hold a feats relation); :func:`train_perceptron_docs`
    trains bit-identical weights straight from the doc relation with
    zero corpus-scale shuffles — prefer it when you have the docs."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    w: dict[int, int] = {}
    for _ in range(iters):
        if w:
            wdf = F.broadcast(
                spark.createDataFrame(list(w.items()), "dim: long, w: long")
            )
            margins = (
                feats.join(wdf, "dim")
                .groupBy("doc_id", "y")
                .agg(F.sum(F.col("x") * F.col("w")).alias("m"))
            )
            mis = margins.where(F.col("y") * F.col("m") <= 0).select("doc_id")
        else:
            mis = None  # w = 0: every margin is 0 -> all misclassified
        src = feats if mis is None else feats.join(mis, "doc_id", "left_semi")
        delta = src.groupBy("dim").agg(
            F.sum(F.col("y") * F.col("x")).alias("d")
        )
        for r in delta.collect():
            w[r["dim"]] = w.get(r["dim"], 0) + r["d"]
    return w


def train_perceptron_docs(
    docs: DataFrame,
    label_pred,
    dims: int = 64,
    iters: int = 3,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[int, int]:
    """Bit-identical weights to :func:`train_perceptron` over
    ``hashed_features(docs, ...)``, computed WITHOUT the exploded
    (doc, dim, x) relation — the r14 optimization-round spelling.

    Per iteration (guide §2.3/§2.4 — aggregate before you shuffle,
    remove shuffles outright):

    - the per-doc margin is the stateless :func:`margin_column`
      projection (the batch/stream parity contract already proves it
      equals ``sum(x * w) + bias`` bit-for-bit in int64), so the
      misclassified filter is a pure map over the corpus scan — no
      feats join, no (doc, y) aggregation, no semi-join;
    - the weight delta ``sum_{mis} y * x[d, dim]`` telescopes to a sum
      of ``y`` over every gram INSTANCE of the misclassified docs
      (x is the per-(doc, dim) gram count, so grouping instances by
      dim is the same sum), plus ``y`` once per misclassified doc for
      the bias dim — one explode feeding a partial+final aggregate
      whose key space is dims+1, i.e. the shuffle carries at most
      (dims+1) x n_partitions rows regardless of corpus size.

    The old path materialized (and persisted) the corpus-scale feats
    relation and re-shuffled it 2-3x per iteration; this one re-scans
    the source per iteration with map-only compute — the right trade
    at any scale where the scan is cheaper than a corpus-wide shuffle
    (and it holds no cache). The collect stays dims+1 longs.
    """
    from konohadataplatform_spark.operators.retrieval import gram_array_sql

    if iters < 1:
        raise ValueError("iters must be >= 1")
    dim_hash = DIM_SQL.format(g="g", dims=int(dims))
    dims_of = (
        f"transform({gram_array_sql('_w', int(n))}, g -> {dim_hash})"
    )
    # (y, dims): gram hashing stays a JVM codegen projection (md5 +
    # conv measured cheap); what moved to the Arrow kernel is the
    # MARGIN FOLD — `aggregate(...)` higher-order lambdas evaluate
    # interpreted per ELEMENT (~2.5 s per iteration over the sf0.1
    # gram mass, measured r14), while the same fold is a numpy
    # segment-sum per batch (guide §4.2). No cache: each iteration
    # re-scans the source exactly as before.
    # r15: the (y, gram-dims) projection is persisted across the
    # ``iters`` epochs — the gram hashing (md5 + conv per gram) was
    # re-executed per epoch before, tripling the dominant map-side CPU
    # for a 3-epoch train. Epoch 1's pass fills the cache (no extra
    # job); the finally releases it deterministically, so nothing
    # lingers in the CacheManager after return (the r7 leak class —
    # and unlike lexical_topk's tf, THIS relation never outlives the
    # function, so an owned persist/unpersist is the right tool).
    # Values are deterministic, so weights stay bit-identical
    # (test_perceptron_matches_python_replay pins them); at 100 TB
    # the cache stores the narrow (y, int-array) relation — the
    # smaller of (re-hash the text) vs (store the dims) for every
    # epoch after the first — and spills to disk if needed.
    dims_rel = docs.select(
        F.when(label_pred, F.lit(1)).otherwise(F.lit(-1)).alias("y"),
        F.split(F.trim(F.col(text_col)), " ").alias("_w"),
    ).select("y", F.expr(dims_of).alias("dims"))
    if iters > 1:
        dims_rel = dims_rel.persist()
    w: dict[int, int] = {}
    try:
        for _ in range(iters):
            acc: dict[int, int] = {}
            for r in _perceptron_delta_partials(dims_rel, w, int(dims)):
                acc[r["dim"]] = acc.get(r["dim"], 0) + r["d"]
            for dim, d in acc.items():
                w[dim] = w.get(dim, 0) + d
    finally:
        if iters > 1:
            dims_rel.unpersist()
    return w


def _perceptron_delta_partials(dims_rel: DataFrame, w: dict, dims: int):
    """ONE map-only pass of a batch-perceptron iteration (guide §4.2):
    per Arrow batch, compute every doc's margin
    ``bias + sum(w[dim] for dim in dims)`` as an exact int64 numpy
    segment sum, keep the misclassified docs (``y * margin <= 0`` —
    identical to :func:`margin_column`'s fold), and fold their weight
    delta ``sum(y)`` per dim (bias dim included: once per mis doc)
    task-side. Emits at most dims+1 partial rows per batch; the
    caller reduces the metadata-sized collect. Bit-identical to the
    explode + groupBy('dim') aggregate it replaces: same int64 sums,
    order-independent."""
    import numpy as np
    import pyarrow as pa

    warr = np.zeros(dims, dtype=np.int64)
    for dim, wt in w.items():
        if dim != BIAS_DIM:
            warr[dim] = wt
    bias = int(w.get(BIAS_DIM, 0))

    def _kernel(batches):
        for batch in batches:
            y = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            if len(y) == 0:
                continue
            dcol = batch.column(1)
            lens = dcol.value_lengths().to_numpy(zero_copy_only=False)
            flat = dcol.flatten().to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            ends = np.cumsum(lens)
            starts = ends - lens
            cs = np.concatenate(([0], np.cumsum(warr[flat])))
            margins = bias + cs[ends] - cs[starts]
            mis = (y * margins) <= 0
            if not mis.any():
                continue
            y_mis = y[mis]
            flat_mis = flat[np.repeat(mis, lens)]
            y_expanded = np.repeat(y_mis, lens[mis])
            pos = np.bincount(
                flat_mis[y_expanded > 0], minlength=dims
            ).astype(np.int64)
            neg = np.bincount(
                flat_mis[y_expanded < 0], minlength=dims
            ).astype(np.int64)
            delta = pos - neg
            nz = np.nonzero(delta)[0]
            out_dim = np.concatenate(
                (nz, [BIAS_DIM])
            ).astype(np.int64)
            out_d = np.concatenate(
                (delta[nz], [int(y_mis.sum())])
            ).astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_dim, type=pa.int64()),
                    pa.array(out_d, type=pa.int64()),
                ],
                ["dim", "d"],
            )

    return (
        dims_rel.mapInArrow(_kernel, "dim long, d long").collect()
    )


def perceptron_scores(
    docs: DataFrame,
    label_pred,
    dims: int = 64,
    iters: int = 3,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train on the corpus, then score every doc with the final
    weights: (doc_id, margin, pred_pos, is_target). ``pred_pos`` is
    margin > 0; training labels come from ``label_pred`` (e.g. a
    known-good source or language slice), and the margins transfer to
    unlabeled corpora as a quality score.

    Scoring uses :func:`margin_column` — the stateless per-row
    projection (bit-identical to summing feats * w by construction;
    guarded by the batch/stream parity test) — so the served stage is
    a pure map over the corpus scan: zero exchanges, no re-join of the
    exploded feature relation. Training (``train_perceptron_docs``)
    shuffles only dims+1 partial sums per partition per iteration —
    map-only over the corpus otherwise."""
    w = train_perceptron_docs(
        docs, label_pred, dims, iters, n, text_col, id_col
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.col(text_col)), " ").alias("_w"),
        F.when(label_pred, True).otherwise(False).alias("is_target"),
    )
    return base.select(
        "doc_id",
        margin_column(w, dims, n, words_col="_w").alias("margin"),
        "is_target",
    ).select(
        "doc_id",
        "margin",
        (F.col("margin") > 0).alias("pred_pos"),
        "is_target",
    )


def score_with_weights(
    df: DataFrame,
    weights: dict[int, int],
    dims: int = 64,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score rows with PRE-TRAINED weights as a pure per-row
    projection: (doc_id, margin, pred_pos). Bit-identical to
    ``perceptron_scores``'s margins on the same weights, but with no
    explode, no join, no aggregate — the gram loop runs inside one
    higher-order ``aggregate`` expression over the row's own word
    array, and the weight vector is a dims-element array literal.

    Because it is STATELESS, the same call works unchanged on a
    Structured Streaming relation — the train-in-batch /
    score-in-stream serving path (a quality gate in front of
    streaming ingest). At 100 TB batch scoring it is also the cheaper
    shape: zero exchanges vs perceptron_scores' feature shuffle."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.trim(F.col(text_col)), " ").alias("_w"),
        )
        .select(
            "doc_id",
            margin_column(weights, dims, n, words_col="_w").alias("margin"),
        )
        .withColumn("pred_pos", F.col("margin") > 0)
    )


def margin_column(
    weights: dict[int, int],
    dims: int = 64,
    n: int = 2,
    words_col: str = "_w",
):
    """The perceptron margin over a word-array column as ONE
    codegen'd expression column — the single margin definition
    :func:`score_with_weights` and the streaming ingest quality gate
    (``streaming/ingest.py``) both expand, so the batch/stream
    bit-parity contract can't drift. The weight vector is inlined as
    a dims-element array literal (one codegen'd object)."""
    from konohadataplatform_spark.operators.retrieval import gram_array_sql

    bias = int(weights.get(BIAS_DIM, 0))
    warr_sql = "array(" + ", ".join(
        f"{int(weights.get(d, 0))}L" for d in range(dims)
    ) + ")"
    dim_hash = DIM_SQL.format(g="g", dims=int(dims))
    dim_of = f"transform({gram_array_sql(words_col, n)}, g -> {dim_hash})"
    return F.expr(
        f"aggregate({dim_of}, cast({bias} as bigint), "
        f"(acc, d) -> acc + element_at({warr_sql}, cast(d + 1 as int)))"
    )


def calibration_table(
    scored: DataFrame,
    n_buckets: int = 10,
    score_col: str = "margin",
    label_col: str = "is_target",
    id_col: str = "doc_id",
) -> DataFrame:
    """Calibration curve for a trained scorer: rank every row by its
    score, cut the ranking into ``n_buckets`` equal-count tiles, and
    report the ACTUAL positive rate per tile —

    (bucket, n_docs, n_target, target_rate_micro, min_margin,
     max_margin)

    A well-behaved quality classifier shows target_rate_micro rising
    monotonically with the bucket; a flat curve means the margins
    carry no signal and any threshold-based corpus filter built on
    them is noise. All-integer outputs (rate = n_target * 1e6 div n).

    Tiles are EXPLICIT integer arithmetic over a global rank —
    ``(rank - 1) * n_buckets div N`` — the same remainder-proof cut
    as perplexity_partition (NTILE's leftover-distribution trivia
    differs across engines). The rank comes from
    ``scalable_row_number`` (range-partitioned, per-partition offsets
    broadcast back): no single-partition global sort at corpus scale;
    (score, id) must total-order, which ``id_col`` guarantees. N
    rides along from the SAME per-partition counts relation that
    produced the ranks (``total_col``, the r11 ADVICE fix) — no
    second scan of the scored lineage, and the bucket cut can never
    disagree with the ranking about cardinality.
    """
    from konohadataplatform_spark.operators.ranking import (
        scalable_row_number,
    )

    # counted gate (ranking.py): `scored` is a pure per-row projection
    # over the corpus scan, so probing it is a short-circuiting LIMIT
    # count — under the bound the rank is one lazy window instead of
    # the two-phase job chain, bit-identical either way
    ranked = scalable_row_number(
        scored, [F.col(score_col), F.col(id_col)], out_col="_rn",
        total_col="_n",
        probe_side=scored,
    )
    return (
        ranked
        .withColumn(
            "bucket",
            F.expr(f"CAST((_rn - 1) * {int(n_buckets)} DIV _n AS INT)"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col(label_col), 1).otherwise(0))
            .cast("bigint")
            .alias("n_target"),
            F.min(score_col).cast("bigint").alias("min_margin"),
            F.max(score_col).cast("bigint").alias("max_margin"),
        )
        .select(
            "bucket",
            "n_docs",
            "n_target",
            F.expr("n_target * 1000000 DIV n_docs")
            .cast("bigint")
            .alias("target_rate_micro"),
            "min_margin",
            "max_margin",
        )
    )
