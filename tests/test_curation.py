"""Per-group cap operator: window-free selection, window-equivalent
output (operators/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from konohadataplatform_spark.operators.curation import (
    apply_group_cap,
    per_group_cap,
)


def _skewed(spark):
    # one hot group (80% of rows) + a tail, shuffled over 8 partitions
    rows = [("hot", i) for i in range(400)] + [
        (f"g{i % 7}", 1000 + i) for i in range(100)
    ]
    return spark.createDataFrame(rows, "grp: string, id: long").repartition(8)


def test_matches_window_spelling(spark):
    df = _skewed(spark)
    got = {
        r["grp"]: (r["n_total"], list(r["kept"]))
        for r in per_group_cap(df, "grp", "id", 5).collect()
    }
    w = Window.partitionBy("grp").orderBy("id")
    exp_rows = (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .groupBy("grp")
        .agg(F.sort_array(F.collect_list("id")).alias("kept"))
        .collect()
    )
    totals = {r["grp"]: r["cnt"] for r in df.groupBy("grp").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    exp = {r["grp"]: (totals[r["grp"]], list(r["kept"])) for r in exp_rows}
    assert got == exp


def test_apply_cap_keeps_rows_intact(spark):
    df = _skewed(spark).withColumn("payload", F.md5(F.col("id").cast("string")))
    out = apply_group_cap(df, "grp", "id", 3)
    assert out.columns == df.columns
    per_grp = out.groupBy("grp").count().collect()
    assert all(r["count"] <= 3 for r in per_grp)
    # kept rows are the 3 lowest ids of each group
    hot = sorted(r["id"] for r in out.where(F.col("grp") == "hot").collect())
    assert hot == [0, 1, 2]


def test_no_window_in_plan(spark):
    from tests.test_plans import plan_of

    df = _skewed(spark)
    plan = plan_of(apply_group_cap(df, "grp", "id", 3))
    assert "Window" not in plan
    # two-phase: partial/final aggregation pairs, no per-group sort
    assert "Sort" not in plan.split("\n\n(")[0] or "SortAggregate" in plan


def test_apply_group_cap_gate_parity_forced_shuffle(spark):
    """r13 counted gate (VERDICT #2): kept_broadcast_rows=0 forces the
    shuffled (group, key) semi-join — identical rows to the broadcast
    path, and the explicit True/False overrides skip the count."""
    df = _skewed(spark).withColumn(
        "payload", F.md5(F.col("id").cast("string"))
    )
    a = sorted(tuple(r) for r in apply_group_cap(df, "grp", "id", 3).collect())
    b = sorted(
        tuple(r)
        for r in apply_group_cap(
            df, "grp", "id", 3, kept_broadcast_rows=0
        ).collect()
    )
    c = sorted(
        tuple(r)
        for r in apply_group_cap(
            df, "grp", "id", 3, kept_broadcast=False
        ).collect()
    )
    assert a and a == b == c


def test_stratified_sample_and_domain_cap_gate_passthrough(spark):
    """The wrappers forward the gate kwargs: forcing the shuffled path
    leaves the selection bit-identical."""
    from konohadataplatform_spark.operators.curation import (
        apply_domain_cap,
        stratified_sample,
    )

    docs = spark.createDataFrame(
        [
            (i, f"l{i % 3}",
             f"https://sub{i % 5}.example{i % 4}.com/p/{i}")
            for i in range(60)
        ],
        "doc_id long, lang string, url string",
    )
    a = sorted(
        tuple(r) for r in stratified_sample(docs, "lang", quota=4).collect()
    )
    b = sorted(
        tuple(r)
        for r in stratified_sample(
            docs, "lang", quota=4, kept_broadcast_rows=0
        ).collect()
    )
    assert a and a == b
    c = sorted(
        tuple(r) for r in apply_domain_cap(docs, cap=2).collect()
    )
    d = sorted(
        tuple(r)
        for r in apply_domain_cap(docs, cap=2, kept_broadcast=False).collect()
    )
    assert c and c == d


def test_cap_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        per_group_cap(_skewed(spark), "grp", "id", 0)


def _imp_docs(spark):
    # target docs repeat "good data", raw docs repeat "bad noise";
    # doc 7 is a target-language doc full of the raw phrase, doc 8 a
    # raw doc full of the target phrase (scores must follow CONTENT,
    # not the target flag)
    rows = [
        (1, "en", "good data good data good data"),
        (2, "en", "good data is good data"),
        (3, "de", "bad noise bad noise bad noise"),
        (4, "de", "bad noise and more bad noise"),
        (5, "de", "bad noise bad noise"),
        (7, "en", "bad noise bad noise bad noise"),
        (8, "de", "good data good data good data"),
        (9, "de", "x"),  # < n words: must appear with score 0
    ]
    return spark.createDataFrame(rows, "doc_id: long, lang: string, text: string")


def test_importance_weights_python_replay(spark):
    """Bit-exact vs a Python replay of the smoothed-ratio formula."""
    from collections import Counter

    from konohadataplatform_spark.operators.curation import (
        IMP_SCALE,
        importance_weights,
    )

    docs = _imp_docs(spark)
    rows = [(r.doc_id, r.lang, r.text) for r in docs.collect()]
    tf = Counter()
    for d, lang, text in rows:
        w = text.strip().split(" ")
        for i in range(len(w) - 1):
            tf[(d, lang == "en", f"{w[i]} {w[i+1]}")] += 1
    ct, cr = Counter(), Counter()
    for (d, is_t, t), c in tf.items():
        cr[t] += c
        if is_t:
            ct[t] += c
    wt = {t: ((ct[t] + 1) * IMP_SCALE) // (cr[t] + 1) for t in cr}
    score = Counter()
    for (d, _is_t, t), c in tf.items():
        score[d] += c * wt[t]
    nd = len(rows)
    ts = sum(score[d] for d, _l, _t in rows)
    expect = {
        d: (score[d], score[d] * nd > ts) for d, _l, _t in rows
    }
    got = {
        r.doc_id: (r.imp_score, r.selected)
        for r in importance_weights(docs, F.col("lang") == "en", n=2).collect()
    }
    assert got == expect
    assert got[9] == (0, False)  # short doc present, zero score
    # content beats flag: the en-flagged noise doc scores like noise,
    # the de-flagged "good data" doc scores like the target docs
    assert got[7][0] < got[1][0]
    assert got[8][0] > got[3][0]


def test_importance_weights_plan_shape(spark):
    """No cartesian blow-up; the selection threshold rides a
    broadcast, and no per-term window exists anywhere."""
    from konohadataplatform_spark.operators.curation import importance_weights

    plan = importance_weights(
        _imp_docs(spark), F.col("lang") == "en", n=2
    )._sc._jvm.PythonSQLUtils.explainString(
        importance_weights(_imp_docs(spark), F.col("lang") == "en", n=2)
        ._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "BroadcastExchange" in plan


def test_shard_plan_matches_global_window(spark):
    """The range-offset prefix sum == a plain global window, and the
    operator is invariant to input partitioning."""
    from pyspark.sql.window import Window

    from konohadataplatform_spark.operators.curation import shard_plan
    from konohadataplatform_spark.sources.star_schema import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    w = Window.orderBy("pri", "doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    expect = {
        (r.doc_id, r.toks, r.shard)
        for r in docs.select(
            "doc_id",
            F.size(F.split(F.trim("text"), " ")).cast("bigint").alias("toks"),
            F.md5("text").alias("pri"),
        )
        .withColumn("bef", F.coalesce(F.sum("toks").over(w), F.lit(0)))
        .selectExpr("doc_id", "toks", "cast(bef div 2000 as int) AS shard")
        .collect()
    }
    for parts in (1, 7):
        got = {
            (r.doc_id, r.toks, r.shard)
            for r in shard_plan(
                docs.repartition(parts), tokens_per_shard=2000
            ).collect()
        }
        assert got == expect, f"parts={parts}"


def test_write_training_shards_roundtrip(spark, tmp_path):
    """Real write: every doc lands in exactly one shard directory,
    non-final shards are budget-balanced within one max-doc overflow,
    and a rerun reproduces the identical layout."""
    from konohadataplatform_spark.operators.curation import (
        write_training_shards,
    )
    from konohadataplatform_spark.sources.star_schema import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "shards")
    budget = 2000
    manifest = write_training_shards(docs, out, budget).collect()
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert set(r.doc_id for r in back.select("doc_id").collect()) == set(
        r.doc_id for r in docs.select("doc_id").collect()
    )
    max_doc = docs.select(
        F.max(F.size(F.split(F.trim("text"), " ")))
    ).first()[0]
    shards = sorted(r.shard for r in manifest)
    assert shards == list(range(len(shards)))  # contiguous ids
    for r in manifest:
        if r.shard != shards[-1]:
            assert abs(r.toks - budget) < max_doc, (r.shard, r.toks)
    manifest2 = write_training_shards(docs, str(tmp_path / "s2"), budget)
    assert {(r.shard, r.n_docs, r.toks) for r in manifest2.collect()} == {
        (r.shard, r.n_docs, r.toks) for r in manifest
    }


def test_shard_plan_custom_priority_orders_curriculum(spark):
    """A zero-padded custom priority (curriculum difficulty) must fill
    shard 0 with the lowest-priority docs, and match the global-window
    spelling on the same key."""
    from pyspark.sql.window import Window

    from konohadataplatform_spark.operators.curation import shard_plan

    rows = [(i, " ".join(["w"] * 10), f"{(i * 37) % 100:03d}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string, pri_key: string")
    got = {
        (r.doc_id, r.shard)
        for r in shard_plan(
            docs, tokens_per_shard=100, priority_col="pri_key"
        ).collect()
    }
    w = Window.orderBy("pri_key", "doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    expect = {
        (r.doc_id, r.shard)
        for r in docs.select("doc_id", F.lit(10).cast("bigint").alias("toks"), "pri_key")
        .withColumn("bef", F.coalesce(F.sum("toks").over(w), F.lit(0)))
        .selectExpr("doc_id", "cast(bef div 100 as int) AS shard")
        .collect()
    }
    assert got == expect
    # shard 0 holds the 10 lowest-priority docs (10 docs x 10 toks)
    lowest = {d for d, _s in got if _s == 0}
    by_pri = sorted(rows, key=lambda r: (r[2], r[0]))[:10]
    assert lowest == {r[0] for r in by_pri}


def test_leakage_free_split_never_splits_a_cluster(spark):
    """The whole point: every near-duplicate cluster lands in exactly
    one fold, including a planted pair whose PER-DOC hashes would land
    in different folds under the naive split."""
    from hashlib import md5 as _md5

    from konohadataplatform_spark.operators.curation import (
        leakage_free_split,
    )

    base = " ".join(f"w{i}" for i in range(30))
    # find two ids whose per-doc nibbles fall in different naive folds
    def nib(i):
        return int(_md5(str(i).encode()).hexdigest()[0], 16)

    a = next(i for i in range(1000) if nib(i) >= 14)          # naive: test
    b = next(i for i in range(1000) if i != a and nib(i) < 13)  # naive: train
    rows = [(a, base + " tail_a"), (b, base + " tail_b")] + [
        (10_000 + i, f"unique doc {i} " + " ".join(f"u{i}_{j}" for j in range(10)))
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = leakage_free_split(docs, threshold=0.8)
    got = {r.doc_id: (r.cluster_rep, r.split) for r in out.collect()}
    assert len(got) == len(rows)
    # the near-dup pair clustered and shares one fold
    assert got[a][0] == got[b][0] == min(a, b)
    assert got[a][1] == got[b][1]
    # per-cluster fold uniqueness corpus-wide
    folds = {}
    for _d, (rep, split) in got.items():
        folds.setdefault(rep, set()).add(split)
    assert all(len(s) == 1 for s in folds.values())


# ---------------------------------------------------------------------------
# r9: PII redaction
# ---------------------------------------------------------------------------


def test_pii_redact_counts_and_sentinels(spark):
    from konohadataplatform_spark.operators.curation import pii_redact

    docs = spark.createDataFrame(
        [
            (1, "mail me at a.b-c%d@sub.example.org thanks"),
            (2, "server 192.168.0.1 and backup 10.0.0.255 up"),
            (3, "call 555-0199 or 555-0200"),
            (4, "two mails x@y.io and z@w.co plus ip 1.2.3.4"),
            (5, "clean text with no pii at all"),
            (6, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pii_redact(docs).collect()}
    assert (out[1].n_emails, out[1].n_ips, out[1].n_phones) == (1, 0, 0)
    assert out[1].redacted == "mail me at <EMAIL> thanks"
    assert (out[2].n_emails, out[2].n_ips, out[2].n_phones) == (0, 2, 0)
    assert out[2].redacted == "server <IP> and backup <IP> up"
    assert (out[3].n_emails, out[3].n_ips, out[3].n_phones) == (0, 0, 2)
    assert out[3].redacted == "call <PHONE> or <PHONE>"
    assert (out[4].n_emails, out[4].n_ips, out[4].n_phones) == (2, 1, 0)
    assert out[4].redacted == "two mails <EMAIL> and <EMAIL> plus ip <IP>"
    assert out[5].redacted == "clean text with no pii at all"
    assert out[6].redacted is None  # NULL text stays NULL


def test_pii_redact_zero_exchange_plan(spark):
    from konohadataplatform_spark.operators.curation import pii_redact

    docs = spark.createDataFrame([(1, "a@b.co")], "doc_id long, text string")
    plan = pii_redact(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_pii_redact_v2_luhn_and_ipv6(spark):
    from konohadataplatform_spark.operators.curation import pii_redact_v2

    docs = spark.createDataFrame(
        [
            # Luhn-valid in three separator styles -> all redacted
            (1, "pay 4111 1111 1111 1111 now"),
            (2, "pay 4111-1111-1111-1111 now"),
            (3, "pay 4111111111111111 now"),
            # Luhn-FAILING 16-digit run -> must SURVIVE redaction
            (4, "ref 1234-5678-9012-3456 kept"),
            # full-form IPv6 -> redacted; compressed form out of scope
            (5, "via 2001:0db8:85a3:0000:0000:8a2e:0370:7334 end"),
            (6, "via 2001:db8::1 compressed stays"),
            # v1 classes still work through the v2 path
            (7, "mail a@b.co ip 1.2.3.4 call 555-0199"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pii_redact_v2(docs).collect()}
    for d in (1, 2, 3):
        assert out[d].n_ccs == 1 and out[d].redacted == "pay <CC> now", d
    assert out[4].n_ccs == 0
    assert out[4].redacted == "ref 1234-5678-9012-3456 kept"
    assert out[5].n_ip6s == 1 and out[5].redacted == "via <IP6> end"
    assert out[6].n_ip6s == 0 and "2001:db8::1" in out[6].redacted
    assert (out[7].n_emails, out[7].n_ips, out[7].n_phones) == (1, 1, 1)
    assert out[7].redacted == "mail <EMAIL> ip <IP> call <PHONE>"


def test_pii_redact_v2_zero_exchange_plan(spark):
    from konohadataplatform_spark.operators.curation import pii_redact_v2

    docs = spark.createDataFrame([(1, "a@b.co")], "doc_id long, text string")
    plan = pii_redact_v2(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# r9: Gopher quality rules
# ---------------------------------------------------------------------------


def test_gopher_rules_each_rule_fires(spark):
    from konohadataplatform_spark.operators.curation import (
        gopher_quality_flags,
    )

    prose = "the cat sat with the dog and that was that " * 6  # 60 words
    short = "the cat sat with a hat"  # < min_words
    # 60 single-char words: mean word length 1 -> fails mean-word-len
    tiny_words = "a " * 59 + "a"
    # 60 numeric tokens: fails alpha ratio AND stopwords
    numeric = " ".join(str(i) for i in range(60))
    flags = {
        r.doc_id: r
        for r in gopher_quality_flags(
            spark.createDataFrame(
                [(1, prose.strip()), (2, short), (3, tiny_words.strip()),
                 (4, numeric), (5, None), (6, "   ")],
                "doc_id long, text string",
            )
        ).collect()
    }
    assert flags[1].pass_gopher
    assert not flags[2].ok_word_count and not flags[2].pass_gopher
    assert flags[3].ok_word_count and not flags[3].ok_mean_word_len
    assert not flags[4].ok_alpha_ratio and not flags[4].ok_stopwords
    # NULL and whitespace-only text: zero words, every rule fails
    for d in (5, 6):
        assert flags[d].n_words == 0 and not flags[d].pass_gopher


def test_gopher_rules_integer_exact_boundaries(spark):
    from konohadataplatform_spark.operators.curation import (
        gopher_quality_flags,
    )

    # exactly 80% alphabetic words must PASS (>= contract):
    # 50 words, 40 alphabetic, 10 numeric
    text = " ".join(["word"] * 38 + ["the", "with"] + [str(i) for i in range(10)])
    r = gopher_quality_flags(
        spark.createDataFrame([(1, text)], "doc_id long, text string")
    ).collect()[0]
    assert r.n_words == 50 and r.n_alpha_words == 40
    assert r.ok_alpha_ratio  # 5*40 == 4*50


# ---------------------------------------------------------------------------
# r9: language-temperature sampling quotas
# ---------------------------------------------------------------------------


def test_lang_temperature_quota_flattens_head(spark):
    import math

    from konohadataplatform_spark.operators.curation import (
        lang_temperature_quota,
    )

    rows = [(i, "en") for i in range(900)] + [
        (1000 + i, "mi") for i in range(100)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = {r.lang: r for r in
           lang_temperature_quota(docs, budget=1000).collect()}
    # exact integer replay of the contract
    for lang, n in (("en", 900), ("mi", 100)):
        assert out[lang].weight == math.floor(math.sqrt(n * 1_000_000))
    tw = out["en"].weight + out["mi"].weight
    assert out["en"].quota == 1000 * out["en"].weight // tw
    # alpha=0.5 flattens: head gets < its raw 90% share, tail > 10%
    assert out["en"].quota < 900 and out["mi"].quota > 100
    # quotas never exceed budget
    assert out["en"].quota + out["mi"].quota <= 1000


def test_lang_temperature_quota_validation(spark):
    import pytest

    from konohadataplatform_spark.operators.curation import (
        lang_temperature_quota,
    )

    docs = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        lang_temperature_quota(docs, budget=0)
    # n_docs * scale >= 2^52 breaks the engine-exact floor(sqrt) claim
    # -> loud raise_error instead of a silent cross-engine divergence
    with pytest.raises(Exception, match="2\\^52"):
        lang_temperature_quota(docs, budget=10, scale=1 << 52).collect()


def test_lang_temperature_quota_guard_division_form_boundary(spark):
    """r12 VERDICT #3: the guard must use the overflow-free division
    form (n_docs <= (2^52-1) div scale), preserving the EXACT accepted
    domain of the old product check: with scale = 2^51 the bound is
    max_docs = 1, so 1 doc passes and 2 docs raise — and a wrapping
    product can never sneak past."""
    import pytest

    from konohadataplatform_spark.operators.curation import (
        lang_temperature_quota,
    )

    one = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    row = lang_temperature_quota(one, budget=10, scale=1 << 51).collect()[0]
    assert row.weight == int((1 << 51) ** 0.5)
    two = spark.createDataFrame(
        [(1, "en"), (2, "en")], "doc_id long, lang string"
    )
    with pytest.raises(Exception, match="2\\^52"):
        lang_temperature_quota(two, budget=10, scale=1 << 51).collect()


# ---------------------------------------------------------------------------
# r10: Gopher repetition rules (Rae et al. 2021 A1.1, second half)
# ---------------------------------------------------------------------------


def test_gopher_repetition_each_rule_fires(spark):
    from konohadataplatform_spark.operators.curation import (
        gopher_repetition_flags,
    )

    clean = ("alpha beta gamma delta epsilon zeta eta theta iota kappa\n"
             "one two three four five six seven eight nine ten\n\n"
             "red orange yellow green blue indigo violet gray pink teal")
    # 3 of 4 lines identical -> dup-line fraction 0.5 > 0.30
    dup_lines = "same line here\nsame line here\nsame line here\nunique one"
    # 2 of 2 paragraphs identical -> dup-para fraction 0.5 > 0.30
    dup_paras = "para text body\n\npara text body"
    # one 2-gram dominates the char mass
    top2 = "spam ham " * 30 + "tail"
    docs = spark.createDataFrame(
        [(1, clean), (2, dup_lines), (3, dup_paras), (4, top2.strip()),
         (5, None), (6, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_repetition_flags(docs).collect()}
    assert out[1].pass_repetition
    assert out[1].n_lines == 3 and out[1].n_paras == 2
    assert not out[2].ok_dup_lines and out[2].n_dup_lines == 2
    assert not out[3].ok_dup_paras and out[3].n_dup_paras == 1
    assert not out[4].ok_top2 and not out[4].pass_repetition
    # NULL/empty text vacuously passes (the word-form battery fails it)
    assert out[5].pass_repetition and out[5].n_lines == 0
    assert out[6].pass_repetition and out[6].nonspace_chars == 0


def test_gopher_repetition_top_gram_tie_is_deterministic(spark):
    from konohadataplatform_spark.operators.curation import (
        gopher_repetition_flags,
    )

    # "b c" and "a b" both occur once; lexicographically smallest wins,
    # so the mass is len("ab") * 1 = 2 regardless of engine/partitioning
    docs = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    r = gopher_repetition_flags(docs).collect()[0]
    assert r.top2_mass == 2 and r.top3_mass == 3 and r.top4_mass == 0


def test_gopher_dup_ngram_coverage_interval_union(spark):
    """r10: duplicated-5-gram coverage is an interval UNION — the two
    overlapping runs of 'a b c d e f' cover 12 of 15 words exactly
    once each (mass 12), not 4 runs x 5 words."""
    from konohadataplatform_spark.operators.curation import (
        gopher_dup_ngram_flags,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e f a b c d e f x y z"),
         (2, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),  # no dups
         (3, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_dup_ngram_flags(docs).collect()}
    # doc 1: dup 5-grams at word positions 0,1,6,7 -> islands
    # [0,5] and [6,11] -> 12 one-char words covered of 15 nonspace
    assert out[1].dup5_mass == 12 and out[1].nonspace_chars == 15
    assert not out[1].ok_dup5 and not out[1].pass_dup_ngrams
    # dup 6-gram 'a b c d e f' at 0 and 6 -> same 12-word coverage
    assert out[1].dup6_mass == 12
    # no 7-gram repeats (phrase only repeats twice)
    assert out[1].dup7_mass == 0 and out[1].ok_dup7
    assert out[2].pass_dup_ngrams and out[2].dup5_mass == 0
    assert out[3].pass_dup_ngrams and out[3].nonspace_chars == 0


def test_mixture_sample_deterministic_and_rate_accurate(spark):
    """r10: hash-gated mixing — rate 1.0 keeps all, 0.0 drops all,
    0.5 lands near half, and the draw is identical across calls."""
    from konohadataplatform_spark.operators.curation import mixture_sample

    import pytest

    docs = spark.createDataFrame(
        [(i, ["all", "half", "none"][i % 3]) for i in range(600)],
        "doc_id long, source string",
    )
    rates = {"all": 1.0, "half": 0.5, "none": 0.0}
    out = mixture_sample(docs, rates).collect()
    kept = {}
    for r in out:
        kept.setdefault(r.source, []).append(r.selected)
    assert all(kept["all"]) and not any(kept["none"])
    frac = sum(kept["half"]) / len(kept["half"])
    assert 0.35 <= frac <= 0.65  # 200 draws at p=0.5
    # deterministic: identical draw on a second invocation
    again = {(r.doc_id, r.selected) for r in
             mixture_sample(docs, rates).collect()}
    assert again == {(r.doc_id, r.selected) for r in out}
    # a different seed redraws (some verdicts must change)
    redraw = {(r.doc_id, r.selected) for r in
              mixture_sample(docs, rates, seed="other").collect()}
    assert redraw != again
    # unknown source -> default_rate
    extra = spark.createDataFrame([(1, "mystery")],
                                  "doc_id long, source string")
    assert not mixture_sample(extra, rates).collect()[0].selected
    assert mixture_sample(extra, rates,
                          default_rate=1.0).collect()[0].selected
    with pytest.raises(ValueError):
        mixture_sample(docs, {})
    with pytest.raises(ValueError):
        mixture_sample(docs, {"x": 1.5})


def test_mixture_sample_zero_exchange_plan(spark):
    from konohadataplatform_spark.operators.curation import mixture_sample

    docs = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    plan = mixture_sample(docs, {"a": 0.5})._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


# --------------------------------------------------------------------------
# Stupid-backoff trigram surprisal + CCNet perplexity partitioning
# --------------------------------------------------------------------------
def test_trigram_backoff_ladder_hand_computed(spark):
    import math

    from konohadataplatform_spark.operators.text import (
        trigram_backoff_surprisal,
    )

    # train doc (doc_id 0): counts c3("a b c")=1, c2: ab,bc -> 1 each,
    # uni: a,b,c -> 1 each, N=3, V=3.
    # score doc (doc_id 1) "a b c" -> trigram rung: c3/c(ab) = 1/1 = 1
    # score doc (doc_id 2) "x b c" -> xbc unseen, bc seen:
    #   0.5 * c(bc)/c(b) = 0.5
    # score doc (doc_id 3) "c a x" -> cax unseen, ax unseen, x OOV:
    #   0.25 * (0+1)/(3+3) = 1/24
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, "x b c"), (3, "c a x")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in trigram_backoff_surprisal(
            docs, F.col("doc_id") == 0, alpha=0.5
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1].surprisal == 0.0  # -log2(1)
    assert out[2].surprisal == 1.0  # -log2(0.5)
    assert out[3].surprisal == round(-math.log2(0.25 * (1 / 6)), 6)
    assert all(out[d].n_trigrams == 1 for d in out)


def test_trigram_backoff_short_docs_drop(spark):
    from konohadataplatform_spark.operators.text import (
        trigram_backoff_surprisal,
    )

    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "two words"), (2, None)],
        "doc_id long, text string",
    )
    assert (
        trigram_backoff_surprisal(docs, F.col("doc_id") == 0).count() == 0
    )


def test_perplexity_partition_tiles_and_labels(spark):
    import pytest

    from konohadataplatform_spark.operators.curation import (
        perplexity_partition,
    )

    # train on doc 0; six scored docs, increasingly OOV -> increasing
    # surprisal; 6 docs / 3 buckets = 2 per tile
    rows = [(0, "a b c d e f")]
    texts = [
        "a b c d e f",     # all trigram-rung
        "a b c d e x",     # one backoff position
        "a b c x e f",
        "x b c d q f",
        "x y c d q z",
        "x y z q r s",     # fully OOV
    ]
    rows += [(i + 1, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = perplexity_partition(docs, F.col("doc_id") == 0).collect()
    by_rank = sorted(out, key=lambda r: r.ppl_rank)
    assert [r.bucket for r in by_rank] == [
        "head", "head", "middle", "middle", "tail", "tail"
    ]
    # ranks ordered by (surprisal, doc_id)
    surp = [r.surprisal for r in by_rank]
    assert surp == sorted(surp)
    with pytest.raises(ValueError):
        perplexity_partition(docs, F.col("doc_id") == 0, buckets=1)


def test_stratified_sample_exact_quota_and_determinism(spark):
    from konohadataplatform_spark.operators.curation import (
        stratified_sample,
    )

    rows = [(i, f"text {i}", "en" if i % 3 else "de") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = stratified_sample(docs, "lang", quota=5)
    counts = {r.lang: r.n for r in
              out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"en": 5, "de": 5}
    # all original columns survive, and the pick is deterministic
    assert out.columns == docs.columns
    first = sorted(r.doc_id for r in out.collect())
    again = sorted(r.doc_id for r in
                   stratified_sample(docs, "lang", quota=5).collect())
    assert first == again
    # smaller-than-quota stratum returns whole stratum
    tiny = stratified_sample(docs.filter(F.col("doc_id") < 3), "lang", 99)
    assert tiny.count() == 3


def test_stratified_sample_long_ids_not_truncated(spark):
    """ADVICE r10: the old lpad(id, 20) suffix TRUNCATED ids longer
    than 20 chars, so the selection key stopped being total. The
    length-prefixed suffix never truncates."""
    from konohadataplatform_spark.operators.curation import (
        stratified_sample,
    )

    rows = [(f"document-id-{'x' * 30}-{i:04d}", "en") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id string, lang string")
    out = stratified_sample(docs, "lang", quota=7, id_col="doc_id")
    picked = sorted(r.doc_id for r in out.collect())
    assert len(picked) == 7 and len(set(picked)) == 7
    again = sorted(r.doc_id for r in stratified_sample(
        docs, "lang", quota=7, id_col="doc_id").collect())
    assert picked == again


def test_apply_group_cap_key_shared_across_groups(spark):
    """ADVICE r10: the semi-join keys on (group, key) — a key value
    kept in one group must not admit a same-keyed row past ANOTHER
    group's cap."""
    from konohadataplatform_spark.operators.curation import (
        apply_group_cap,
    )

    rows = [("a", 5), ("b", 1), ("b", 2), ("b", 5)]
    df = spark.createDataFrame(rows, "grp string, id long")
    out = {(r.grp, r.id) for r in apply_group_cap(df, "grp", "id", 2).collect()}
    # group b keeps its 2 smallest ids; b's id=5 is NOT rescued by
    # a's kept key 5
    assert out == {("a", 5), ("b", 1), ("b", 2)}


def test_code_quality_flags_each_rule_fires(spark):
    from konohadataplatform_spark.operators.curation import (
        code_quality_flags,
    )

    docs = spark.createDataFrame(
        [
            (1, "short line\nanother ok line"),          # all pass
            (2, "x" * 1500),                             # max + avg fail
            (3, "@@ ## $$ %% ^^ && ** (("),              # alnum fails
            (4, "auto-generated file\ndo not edit"),     # marker fails
            (5, None),                                   # empty: one line
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in code_quality_flags(docs).collect()}
    assert out[1].pass_code_filters
    assert not out[2].ok_max_line_len and not out[2].ok_avg_line_len
    assert out[2].max_line_len == 1500
    assert not out[3].ok_alnum_frac and out[3].ok_max_line_len
    assert not out[4].ok_not_autogen and out[4].ok_alnum_frac
    # empty text: one zero-length line; 4*0 >= 0 passes, avg passes
    assert out[5].n_lines == 1 and out[5].pass_code_filters
    # exact boundary: 100 chars/line passes, 101 fails
    b = spark.createDataFrame(
        [(1, "y" * 100), (2, "y" * 101)],
        "doc_id long, text string",
    )
    bo = {r.doc_id: r for r in code_quality_flags(b).collect()}
    assert bo[1].ok_avg_line_len and not bo[2].ok_avg_line_len


def test_curriculum_shards_easy_first(spark):
    """Composition: perplexity rank as shard priority — lower-rank
    (lower-surprisal) docs land in earlier shards."""
    from konohadataplatform_spark.operators.curation import (
        perplexity_partition,
        shard_plan,
    )

    rows = [(0, "a b c d e f g h")]
    rows += [(i, t) for i, t in enumerate(
        ["a b c d e f", "a b c x e f", "x y z q r s",
         "a b c d q f", "x y c q r z", "p q r s t u"], start=1)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ppl = perplexity_partition(docs, F.col("doc_id") == 0).select(
        "doc_id", "ppl_rank"
    )
    joined = docs.join(ppl, "doc_id").withColumn(
        "pri", F.lpad(F.col("ppl_rank").cast("string"), 12, "0")
    )
    out = shard_plan(joined, tokens_per_shard=12, priority_col="pri")
    j = {r.doc_id: r.shard for r in out.collect()}
    ranks = {r.doc_id: r.ppl_rank for r in ppl.collect()}
    # shard index is non-decreasing in ppl_rank order
    by_rank = sorted(ranks, key=lambda d: ranks[d])
    shards = [j[d] for d in by_rank]
    assert shards == sorted(shards)
    assert shards[0] == 0


def test_c4_quality_flags_each_rule_fires(spark):
    from konohadataplatform_spark.operators.curation import (
        c4_quality_flags,
    )

    docs = spark.createDataFrame(
        [
            (1, "this is a good sentence.\nhere is another fine one!"
                "\nand a third one?\nshort no."),
            (2, "no terminal punctuation here\nstill none"),
            (3, "please enable javascript to see this page."
                "\nreal sentence with enough words."),
            (4, "this site uses cookies to improve service."
                "\nreal sentence with enough words."),
            (5, "lorem ipsum dolor sit amet is here."
                "\nmore words ending properly."),
            (6, "object is { not prose }.\nclean line with words."),
            (7, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           c4_quality_flags(docs, min_sentences=2).collect()}
    # end-mark + min-words line rules: 2-word "short no." dropped
    assert out[1].n_lines == 4 and out[1].n_kept_lines == 3
    assert out[1].n_sentences == 3 and out[1].pass_c4
    assert out[1].cleaned_text.split("\n") == [
        "this is a good sentence.",
        "here is another fine one!",
        "and a third one?",
    ]
    # no terminal punctuation anywhere -> nothing kept, page fails
    assert out[2].n_kept_lines == 0 and not out[2].ok_min_sentences
    assert out[2].cleaned_text == ""
    # javascript / cookie-policy lines stripped
    assert out[3].n_kept_lines == 1
    assert "javascript" not in out[3].cleaned_text
    assert out[4].n_kept_lines == 1
    assert "cookies" not in out[4].cleaned_text
    # lorem ipsum / brace are PAGE screens
    assert not out[5].ok_no_lorem and not out[5].pass_c4
    assert out[5].ok_no_brace
    assert not out[6].ok_no_brace and not out[6].pass_c4
    # NULL text behaves as the empty page
    assert out[7].n_kept_lines == 0 and out[7].cleaned_text == ""


def test_c4_quality_flags_min_words_param(spark):
    from konohadataplatform_spark.operators.curation import (
        c4_quality_flags,
    )

    docs = spark.createDataFrame(
        [(1, "two words.\nthis line has five words.")],
        "doc_id long, text string",
    )
    strict = c4_quality_flags(docs, min_words_per_line=5).collect()[0]
    lax = c4_quality_flags(docs, min_words_per_line=2).collect()[0]
    assert strict.n_kept_lines == 1 and lax.n_kept_lines == 2


def test_shard_plan_token_count_col(spark):
    """Opt-in tokenizer-accurate budgets: the packer budgets on the
    provided per-doc counts (NULL -> 0), not the whitespace split."""
    from konohadataplatform_spark.operators.curation import shard_plan

    rows = [
        (1, "a b", "0a", 1500),
        (2, "c d", "0b", 1500),
        (3, "e f", "0c", 1500),
        (4, "g h", "0d", None),   # NULL count packs as 0 tokens
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, pri string, btoks long"
    )
    out = {r.doc_id: (r.toks, r.shard) for r in shard_plan(
        docs, tokens_per_shard=2000, priority_col="pri",
        token_count_col="btoks",
    ).collect()}
    # prefix sums: 0, 1500, 3000, 4500 -> shards 0, 0, 1, 2
    assert out == {1: (1500, 0), 2: (1500, 0), 3: (1500, 1), 4: (0, 2)}
    # whitespace default would put everything in shard 0 (2 words each)
    ws = {r.doc_id: r.shard for r in shard_plan(
        docs, tokens_per_shard=2000, priority_col="pri").collect()}
    assert set(ws.values()) == {0}
