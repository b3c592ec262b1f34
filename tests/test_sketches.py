"""Sketch aggregations: accuracy contracts and plan shapes.

HLL++ estimates are engine-specific (not oracle-expressible), so the
driver gate for sketches is `q_quantile_sketch` (exact below the
accuracy knob = quantile_disc) and THESE accuracy/plan gates.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from konohadataplatform_spark.operators.sketches import (
    approx_distinct,
    hll_estimate,
    hll_register_sketch,
    quantile_sketch,
)
from konohadataplatform_spark.sources.star_schema import load_table
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_hll_relative_error_within_contract(spark):
    """approx_count_distinct(rsd=0.02): every group's estimate within
    3 standard deviations of the exact distinct count."""
    orders = load_table(spark, SF_DIR, "orders")
    est = {
        r.o_orderpriority: r.approx_n
        for r in approx_distinct(
            orders, ["o_orderpriority"], "o_custkey", rsd=0.02
        ).collect()
    }
    exact = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert est.keys() == exact.keys()
    for k in exact:
        rel = abs(est[k] - exact[k]) / exact[k]
        assert rel <= 3 * 0.02, (k, est[k], exact[k], rel)


def test_hll_single_exchange_plan(spark):
    """The point of the sketch: ONE partial+final agg pair (sketches
    merge associatively), where exact COUNT(DISTINCT) needs the
    two-shuffle distinct-aggregate rewrite."""
    orders = load_table(spark, SF_DIR, "orders")
    sk = approx_distinct(orders, ["o_orderpriority"], "o_custkey")
    plan = _plan(sk)
    tree = plan.split("\n\n(")[0]
    assert tree.count("Exchange") == 1, tree
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n")
    )
    exact_tree = _plan(exact).split("\n\n(")[0]
    assert exact_tree.count("Exchange") == 2, exact_tree


def test_quantile_sketch_exact_below_accuracy(spark):
    """GK with accuracy >= group size stores every value: the result
    is the exact discrete percentile (an element of the group)."""
    orders = load_table(spark, SF_DIR, "orders")
    out = {
        r.o_orderpriority: (r.p50, r.p90, r.p99)
        for r in quantile_sketch(
            orders, ["o_orderpriority"], "o_totalprice",
            probs=[0.5, 0.9, 0.99],
        ).collect()
    }
    rows = orders.select("o_orderpriority", "o_totalprice").collect()
    groups: dict[str, list[float]] = {}
    for r in rows:
        groups.setdefault(r.o_orderpriority, []).append(r.o_totalprice)
    for k, vals in groups.items():
        vals.sort()
        n = len(vals)
        for p, got in zip([0.5, 0.9, 0.99], out[k]):
            # discrete percentile: the smallest element whose rank
            # covers p (quantile_disc / approx_percentile semantics)
            idx = max(0, math.ceil(p * n) - 1)
            assert got == vals[idx], (k, p, got, vals[idx])


def test_quantile_sketch_rank_error_above_accuracy(spark):
    """Past the accuracy knob the GK summary degrades to bounded RANK
    error (n/accuracy), never garbage: the returned value's true rank
    stays within the bound of the target rank."""
    n, acc = 5000, 100
    df = load_table(spark, SF_DIR, "orders").limit(n).select(
        F.col("o_totalprice").alias("v")
    )
    vals = sorted(r.v for r in df.collect())
    n = len(vals)
    got = df.agg(
        F.expr(f"approx_percentile(v, 0.5, {acc})").alias("m")
    ).collect()[0].m
    true_rank = vals.index(got)
    assert abs(true_rank - 0.5 * n) <= n / acc + 1, (true_rank, n)


# ---- Bloom filter membership sketch ---------------------------------------

def _bloom_python_words(texts, m_bits=1 << 16, k=4):
    import hashlib

    words = {}
    for t in texts:
        h = hashlib.md5(t.encode()).hexdigest()
        for j in range(k):
            pos = int(h[4 * j : 4 * j + 4], 16) & (m_bits - 1)
            words[pos >> 5] = words.get(pos >> 5, 0) | (1 << (pos & 31))
    return words


def test_bloom_build_matches_python_replay(spark):
    from konohadataplatform_spark.operators.sketches import bloom_build

    docs = load_table(spark, SF_DIR, "documents").limit(80)
    texts = [r.text for r in docs.select("text").collect()]
    got = {r.word_idx: r.word for r in bloom_build(docs, "text").collect()}
    assert got == _bloom_python_words(texts)


def test_bloom_probe_no_false_negatives_and_bounded_fp(spark):
    from konohadataplatform_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    docs = load_table(spark, SF_DIR, "documents")
    members = docs.where(F.col("doc_id") % 5 == 0)
    bloom = bloom_build(members, "text")
    probed = bloom_probe(docs, "text", bloom)
    member_texts = {r.text for r in members.select("text").collect()}
    rows = probed.select("text", "maybe_member").collect()
    fp = 0
    for r in rows:
        if r.text in member_texts:
            assert r.maybe_member, "Bloom false negative — must never happen"
        elif r.maybe_member:
            fp += 1
    non_members = sum(1 for r in rows if r.text not in member_texts)
    # n ~ docs/5 into 2^16 bits, k=4: theoretical fp << 1%; allow 2%
    assert fp <= max(2, non_members * 0.02)


def test_bloom_prefilter_anti_join_exact(spark):
    from konohadataplatform_spark.operators.sketches import (
        bloom_prefilter_anti_join,
    )

    docs = load_table(spark, SF_DIR, "documents")
    eval_set = docs.where(F.col("doc_id") % 7 == 0).select(
        F.col("text").alias("eval_text")
    )
    got = {
        r.doc_id
        for r in bloom_prefilter_anti_join(
            docs, "text", eval_set, "eval_text"
        ).collect()
    }
    plain = {
        r.doc_id
        for r in docs.join(
            eval_set, docs["text"] == eval_set["eval_text"], "left_anti"
        ).collect()
    }
    assert got == plain and plain  # exact, and non-trivial fixture


def test_bloom_param_guards(spark):
    import pytest

    from konohadataplatform_spark.operators.sketches import bloom_build

    docs = load_table(spark, SF_DIR, "documents").limit(1)
    with pytest.raises(ValueError, match="power of two"):
        bloom_build(docs, "text", m_bits=1000)
    with pytest.raises(ValueError, match="md5"):
        bloom_build(docs, "text", k=9)


def test_bloom_probe_plan_is_broadcast_only(spark):
    """The probe side must stay a projection: the only join is the
    single-row broadcast of the word map — no sort-merge join, no
    shuffle of the probe side's rows."""
    from konohadataplatform_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    docs = load_table(spark, SF_DIR, "documents")
    bloom = bloom_build(docs.limit(50), "text")
    plan = _plan(bloom_probe(docs, "text", bloom))
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# ---- Count-Min sketch (frequent-items prefilter) --------------------------

def _bigram_rows(spark):
    from konohadataplatform_spark.operators.retrieval import ngram_tokens

    docs = load_table(spark, SF_DIR, "documents")
    return ngram_tokens(docs, n=2).select(F.col("term").alias("gram"))


def _cms_python(values, width=4096, depth=4):
    import hashlib
    from collections import Counter

    c = Counter()
    for v in values:
        h = hashlib.md5(str(v).encode()).hexdigest()
        for j in range(depth):
            c[(j, int(h[4 * j : 4 * j + 4], 16) & (width - 1))] += 1
    return dict(c)


def test_cms_build_matches_python_replay(spark):
    from konohadataplatform_spark.operators.sketches import cms_build

    grams = _bigram_rows(spark).limit(500)
    vals = [r.gram for r in grams.collect()]
    got = {
        (r.row_idx, r.col_idx): r.cnt
        for r in cms_build(grams, "gram").collect()
    }
    assert got == _cms_python(vals)


def test_cms_probe_overestimates_never_under(spark):
    """The CM guarantee everything else builds on: estimate >= true
    count for EVERY value (collisions only add)."""
    from konohadataplatform_spark.operators.sketches import (
        cms_build,
        cms_probe,
    )

    grams = _bigram_rows(spark)
    sketch = cms_build(grams, "gram")
    distinct = grams.distinct()
    est = {
        r.gram: r.cms_est
        for r in cms_probe(distinct, "gram", sketch).collect()
    }
    true = {
        r.gram: r.cnt
        for r in grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert est.keys() == true.keys()
    assert all(est[g] >= true[g] for g in true)


def test_cms_heavy_hitters_exact(spark):
    """Prefiltered result == plain GROUP BY/HAVING, bit-for-bit."""
    from konohadataplatform_spark.operators.sketches import cms_heavy_hitters

    grams = _bigram_rows(spark)
    thr_df = grams.groupBy().agg(F.expr("div(count(1), 800)").alias("thr"))
    thr = thr_df.collect()[0].thr
    got = {
        (r.gram, r.cnt)
        for r in cms_heavy_hitters(grams, "gram", thr_df).collect()
    }
    plain = {
        (r.gram, r.cnt)
        for r in grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= thr)
        .collect()
    }
    assert got == plain and plain  # exact, and non-trivial fixture


def test_cms_probe_plan_is_pure_projection(spark):
    """The sketch is driver-side metadata embedded as an array
    literal, so the probe plan must contain NO join and NO exchange —
    a pure projection over the probe side's scan."""
    from konohadataplatform_spark.operators.sketches import (
        cms_build,
        cms_probe,
    )

    grams = _bigram_rows(spark)
    sketch = cms_build(grams.limit(200), "gram")
    plan = _plan(cms_probe(grams, "gram", sketch))
    tree = plan.split("\n\n(")[0]
    assert "Join" not in tree, tree
    assert "Exchange" not in tree, tree


def test_cms_param_guards(spark):
    import pytest

    from konohadataplatform_spark.operators.sketches import cms_build

    grams = _bigram_rows(spark).limit(1)
    with pytest.raises(ValueError, match="power of two"):
        cms_build(grams, "gram", width=1000)
    with pytest.raises(ValueError, match="depth"):
        cms_build(grams, "gram", depth=9)


# ---- engine-portable HLL register sketches --------------------------------

def _hll_python(values, b=12):
    import hashlib

    regs = {}
    for v in values:
        h = hashlib.md5(str(v).encode()).hexdigest()
        idx = int(h[: b // 4], 16)
        tail = h[b // 4 : b // 4 + 12]
        stripped = tail.lstrip("0")
        zeros = len(tail) - len(stripped)
        if zeros == 12:
            rho = 49
        else:
            first = int(stripped[0], 16)
            lz4 = 0 if first >= 8 else 1 if first >= 4 else 2 if first >= 2 else 3
            rho = 4 * zeros + lz4 + 1
        regs[idx] = max(regs.get(idx, 0), rho)
    return regs


def test_hll_registers_match_python_replay(spark):
    from konohadataplatform_spark.operators.sketches import (
        hll_register_sketch,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(200)
    texts = [r.text for r in docs.select("text").collect()]
    got = {
        r.register_idx: r.rho
        for r in hll_register_sketch(docs, [], "text").collect()
    }
    assert got == _hll_python(texts)


def test_hll_merge_equals_sketch_of_union(spark):
    """Register-wise MAX is a semilattice: merging per-source sketches
    must equal sketching the union directly — the property that makes
    persisted per-partition sketches correct to roll up."""
    from konohadataplatform_spark.operators.sketches import (
        hll_merge,
        hll_register_sketch,
    )

    docs = load_table(spark, SF_DIR, "documents")
    per_source = hll_register_sketch(docs, ["source"], "text")
    merged = {
        r.register_idx: r.rho
        for r in hll_merge(per_source, []).collect()
    }
    direct = {
        r.register_idx: r.rho
        for r in hll_register_sketch(docs, [], "text").collect()
    }
    assert merged == direct


def test_hll_estimate_accuracy(spark):
    """Estimate within 3x the m=4096 standard error (~1.6%) of the
    exact distinct count (linear-counting regime at this scale)."""
    from konohadataplatform_spark.operators.sketches import (
        hll_estimate,
        hll_register_sketch,
    )

    orders = load_table(spark, SF_DIR, "orders")
    sk = hll_register_sketch(orders, [], "o_custkey")
    est = hll_estimate(sk, []).collect()[0].est
    exact = orders.select("o_custkey").distinct().count()
    assert abs(est - exact) / exact <= 3 * 1.04 / (4096 ** 0.5), (est, exact)


def test_hll_sketch_single_exchange_plan(spark):
    """Sketch build is one partial+final agg pair on the register key."""
    from konohadataplatform_spark.operators.sketches import (
        hll_register_sketch,
    )

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(hll_register_sketch(docs, ["source"], "text"))
    tree = plan.split("\n\n(")[0]
    assert tree.count("Exchange") == 1, tree


def test_hll_param_guard(spark):
    import pytest

    from konohadataplatform_spark.operators.sketches import (
        hll_register_sketch,
    )

    docs = load_table(spark, SF_DIR, "documents").limit(1)
    with pytest.raises(ValueError, match="multiple of 4"):
        hll_register_sketch(docs, [], "text", b=10)


def test_hll_estimate_rejects_overflowing_precision(spark):
    """b=16 would wrap the exact-int64 scaled indicator sum
    ((m-1)*2^49 ~ 2^65); build/merge stay legal at b=16 (pure MAX),
    only the estimate refuses."""
    import pytest as _pytest

    df = spark.range(10).selectExpr("cast(id as string) AS v")
    sk = hll_register_sketch(df, [], "v", b=16)  # build is fine
    assert sk.count() > 0
    with _pytest.raises(ValueError, match="b <= 14"):
        hll_estimate(sk, [], b=16)


def test_cms_heavy_hitters_total_div_matches_explicit_threshold(spark):
    """thr = total//800 read off the sketch's row-0 counters must give
    the identical result to the explicit COUNT(*)//800 threshold —
    every occurrence increments exactly one row-0 counter, so the
    counter sum IS the exact corpus count (one fewer corpus pass)."""
    import pytest as _pytest

    from konohadataplatform_spark.operators.sketches import cms_heavy_hitters

    grams = _bigram_rows(spark)
    thr = grams.count() // 800
    explicit = {
        (r.gram, r.cnt)
        for r in cms_heavy_hitters(grams, "gram", thr).collect()
    }
    derived = {
        (r.gram, r.cnt)
        for r in cms_heavy_hitters(grams, "gram", total_div=800).collect()
    }
    assert derived == explicit and explicit
    with _pytest.raises(ValueError, match="exactly one"):
        cms_heavy_hitters(grams, "gram")
    with _pytest.raises(ValueError, match="exactly one"):
        cms_heavy_hitters(grams, "gram", thr, total_div=800)


def test_update_hll_state_incremental_matches_one_shot(spark, tmp_path):
    """Catalog-persisted HLL state over two ingest batches must equal
    the one-shot sketch of the whole corpus (semilattice merge), and a
    REPLAYED batch (checkpoint redelivery) must leave the state
    bit-identical — the idempotence that makes the maintenance op
    bookkeeping-free."""
    from konohadataplatform_spark.catalog import SnapshotCatalog
    from konohadataplatform_spark.operators.sketches import (
        hll_estimate,
        hll_register_sketch,
        update_hll_state,
    )
    from konohadataplatform_spark.sources.star_schema import load_table
    from tests.conftest import SF_DIR

    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    docs = load_table(spark, SF_DIR, "documents")
    b1 = docs.where(F.col("doc_id") % 2 == 0)
    b2 = docs.where(F.col("doc_id") % 2 == 1)
    update_hll_state(cat, "stats_hll", b1, ["source"], "text")
    state = update_hll_state(cat, "stats_hll", b2, ["source"], "text")
    one_shot = hll_register_sketch(docs, ["source"], "text")
    assert {
        (r.source, r.register_idx, r.rho) for r in state.collect()
    } == {(r.source, r.register_idx, r.rho) for r in one_shot.collect()}
    # replay batch 2: state unchanged (register-wise MAX idempotence)
    replayed = update_hll_state(cat, "stats_hll", b2, ["source"], "text")
    assert {
        (r.source, r.register_idx, r.rho) for r in replayed.collect()
    } == {(r.source, r.register_idx, r.rho) for r in state.collect()}
    # and the estimate built from persisted state == one-shot estimate
    est_state = {
        (r.source, r.est) for r in hll_estimate(state, ["source"]).collect()
    }
    est_once = {
        (r.source, r.est)
        for r in hll_estimate(one_shot, ["source"]).collect()
    }
    assert est_state == est_once


def test_update_hll_state_rejects_register_width_mismatch(spark, tmp_path):
    """Merging sketches of different b would MAX disjoint register
    spaces and silently corrupt every later estimate — the op persists
    b with the state and refuses a mismatched batch."""
    import pytest as _pytest

    from konohadataplatform_spark.catalog import SnapshotCatalog
    from konohadataplatform_spark.operators.sketches import update_hll_state

    cat = SnapshotCatalog(spark, str(tmp_path / "wh"))
    df = spark.range(20).selectExpr("cast(id as string) AS v", "'s' AS src")
    update_hll_state(cat, "hb", df, ["src"], "v", b=12)
    with _pytest.raises(ValueError, match="b=12"):
        update_hll_state(cat, "hb", df, ["src"], "v", b=8)
