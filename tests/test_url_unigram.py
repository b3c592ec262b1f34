"""Round-12 operators: URL/domain curation tier (curation.url_filters /
apply_domain_cap / url_dedup) and the unigram-LM tokenizer trainer
(bpe.unigram_train) — planted-row screens and a fully hand-computed
training run."""

from __future__ import annotations

from pyspark.sql import functions as F

from konohadataplatform_spark.operators import curation as CU


def _urls(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_url_filters_planted_rows(spark):
    flags = {
        r["doc_id"]: r.asDict()
        for r in CU.url_filters(
            _urls(
                spark,
                [
                    (1, "https://ok.example.org/page"),
                    (2, "ftp://ok.example.org/page"),
                    (3, "https://ads.badsite.example/page"),
                    (4, "https://badsite.example/page"),
                    (5, "https://10.0.0.1/page"),
                    (6, "https://localhost/page"),
                    (7, "https://ok.example.org/x?sessionid=1"),
                    (8, "https://ok.example.org/ads/banner"),
                    (9, "https://casino.example.org/page"),
                    (10, "https://ok.example.org/" + "x" * 3000),
                ],
            )
        ).collect()
    }
    assert flags[1]["pass_url_filters"]
    assert flags[1]["host"] == "ok.example.org"
    assert flags[1]["domain"] == "example.org"
    assert not flags[2]["ok_scheme"]
    assert not flags[3]["ok_domain"]  # subdomain of blocklisted
    assert not flags[4]["ok_domain"]  # exact blocklisted domain
    assert not flags[5]["ok_host_shape"]  # IPv4 literal
    assert not flags[6]["ok_host_shape"]  # dotless host
    assert not flags[7]["ok_pattern"]
    assert not flags[8]["ok_pattern"]
    assert not flags[9]["ok_soft"]
    assert not flags[10]["ok_len"]
    for i in range(2, 11):
        assert not flags[i]["pass_url_filters"]


def test_apply_domain_cap(spark):
    rows = [
        (i, f"https://a.one.org/{i}") for i in range(10)
    ] + [(100 + i, f"https://b.two.org/{i}") for i in range(3)]
    out = CU.apply_domain_cap(_urls(spark, rows), cap=2)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [0, 1, 100, 101]


def test_url_dedup(spark):
    out = {
        r["doc_id"]: (r["url_norm"], r["kept"])
        for r in CU.url_dedup(
            _urls(
                spark,
                [
                    (1, "https://a.org/x"),
                    (2, "https://a.org/x?utm=1"),
                    (3, "https://a.org/x/"),
                    (4, "https://a.org/y#frag"),
                ],
            )
        ).collect()
    }
    assert out[1] == ("https://a.org/x", True)
    assert out[2] == ("https://a.org/x", False)
    assert out[3] == ("https://a.org/x", False)
    assert out[4] == ("https://a.org/y", True)


def test_unigram_train_hand_computed(spark):
    from konohadataplatform_spark.operators.bpe import unigram_train

    docs = spark.createDataFrame(
        [(1, "abab abab"), (2, "abab cdcd")], "doc_id long, text string"
    )
    # word freqs: abab x3, cdcd x1. Candidate usage: ab=6, aba=3,
    # ba=3, bab=3, cd=2 (dc/cdc/dcd fall under min_usage). Seed keeps
    # all five. Segmentation under seed: abab -> [aba, b] (greedy
    # longest from pos 1), cdcd -> [cd, cd]. Usage: aba=3, cd=2 ->
    # pruned vocab [aba, cd]; final segmentation unchanged shapes.
    vocab, words = unigram_train(
        docs, vocab_size=3, max_piece_len=3, iters=1, min_usage=2
    )
    assert [
        (r["piece_rank"], r["piece"], r["usage"])
        for r in vocab.orderBy("piece_rank").collect()
    ] == [(1, "aba", 3), (2, "cd", 2)]
    segs = {r["word"]: list(r["toks"]) for r in words.collect()}
    assert segs == {"abab": ["aba", "b"], "cdcd": ["cd", "cd"]}


def test_unigram_words_state_feeds_fertility(spark):
    from konohadataplatform_spark.operators.bpe import (
        tokenizer_fertility,
        unigram_train,
    )

    docs = spark.createDataFrame(
        [(1, "abab abab", "en"), (2, "abab cdcd", "de")],
        "doc_id long, text string, lang string",
    )
    _, words = unigram_train(
        docs, vocab_size=3, max_piece_len=3, iters=1, min_usage=2
    )
    out = {
        r["lang"]: r.asDict()
        for r in tokenizer_fertility(docs, words).collect()
    }
    # en: 2 words ([aba,b] twice) -> 4 tokens; de: abab(2) + cdcd(2)
    assert out["en"]["total_words"] == 2
    assert out["en"]["total_bpe_tokens"] == 4
    assert out["de"]["total_words"] == 2
    assert out["de"]["total_bpe_tokens"] == 4


def test_url_filters_blocklist_table_parity(spark):
    """The equi-join blocklist-table path must reproduce the inline
    conjuncts bit-for-bit for registrable-domain blocklists."""
    rows = [
        (1, "https://ok.example.org/page"),
        (2, "https://ads.badsite.example/page"),
        (3, "https://badsite.example/page"),
        (4, "https://x.y.tracker.example/deep"),
        (5, "ftp://adfarm.example/x"),
    ]
    inline = sorted(
        tuple(r) for r in CU.url_filters(_urls(spark, rows)).collect()
    )
    blk = spark.createDataFrame(
        [(d,) for d in CU.URL_BLOCKED_DOMAINS], "domain string"
    )
    joined = sorted(
        tuple(r)
        for r in CU.url_filters(
            _urls(spark, rows), blocked_domains_df=blk
        ).collect()
    )
    assert inline == joined
    flags = {t[0]: t for t in joined}
    assert not flags[4][7]  # deep subdomain still blocked (ok_domain)


def test_domain_quality_screen(spark):
    flagged = spark.createDataFrame(
        [(i, "https://good.org/x", i % 4 != 0) for i in range(8)]
        + [(100 + i, "https://bad.org/x", False) for i in range(4)]
        + [(200, "https://tiny.org/x", False)],
        "doc_id long, url string, pass_quality boolean",
    )
    out = {
        r["domain"]: r.asDict()
        for r in CU.domain_quality_screen(flagged).collect()
    }
    assert out["good.org"]["n_docs"] == 8
    assert out["good.org"]["n_pass"] == 6
    assert out["good.org"]["domain_ok"]
    assert out["bad.org"]["pass_rate_micro"] == 0
    assert not out["bad.org"]["domain_ok"]
    # low-evidence domains pass by default (n_docs < min_docs)
    assert out["tiny.org"]["domain_ok"]


def test_url_filters_plan_is_exchange_free(spark):
    """The inline battery's scale claim, pinned: one codegen
    projection over the scan — no Exchange anywhere in the plan."""
    df = CU.url_filters(
        _urls(spark, [(1, "https://ok.example.org/page")])
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "Exchange" not in plan


def test_url_filters_trailing_dot_fqdn_blocked(spark):
    """r12 review fix: 'badsite.example.' (RFC FQDN spelling) must
    not bypass the blocklist — host normalization strips the dot in
    both the inline and table paths."""
    rows = [(1, "https://badsite.example./x"),
            (2, "https://ads.badsite.example./x")]
    inline = {r["doc_id"]: r for r in CU.url_filters(_urls(spark, rows)).collect()}
    assert inline[1]["host"] == "badsite.example"
    assert not inline[1]["ok_domain"] and not inline[2]["ok_domain"]
    blk = spark.createDataFrame(
        [(d,) for d in CU.URL_BLOCKED_DOMAINS], "domain string"
    )
    joined = {
        r["doc_id"]: r
        for r in CU.url_filters(
            _urls(spark, rows), blocked_domains_df=blk
        ).collect()
    }
    assert not joined[1]["ok_domain"] and not joined[2]["ok_domain"]


def test_unigram_em_usage_matches_bruteforce(spark):
    """r13 EM expectation pass: per-occurrence scaled expectations
    freq * ((A[i]*B[i+l]*1e6) div T) must equal a pure-Python
    enumeration of ALL segmentations (uniform-path forward-backward
    path counting)."""
    from collections import Counter

    from konohadataplatform_spark.operators.bpe import (
        _unigram_candidates,
        unigram_em_usage,
        word_frequencies,
    )

    docs = spark.createDataFrame(
        [(1, "banana bandana"), (2, "banana banal"), (3, "nabla ban")],
        "doc_id long, text string",
    )
    words = word_frequencies(docs)
    cand = _unigram_candidates(words, 3)
    vset = {"an", "ban", "na", "ana"}
    vocab = spark.createDataFrame([(p,) for p in vset], "piece string")
    got = {
        r.piece: r.usage_em
        for r in unigram_em_usage(words, cand, vocab).collect()
    }

    def segs(w):
        if not w:
            return [[]]
        out = []
        for ln in (1, 2, 3):
            if ln <= len(w) and (ln == 1 or w[:ln] in vset):
                out += [[w[:ln]] + rest for rest in segs(w[ln:])]
        return out

    exp: Counter = Counter()
    for r in words.collect():
        ss = segs(r.word)
        occ: Counter = Counter()
        for s in ss:
            pos = 1
            for p in s:
                if len(p) >= 2:
                    occ[(pos, p)] += 1
                pos += len(p)
        for (_, p), through in occ.items():
            exp[p] += r.freq * (through * 1_000_000 // len(ss))
    assert got == dict(exp) and got  # every piece expected, all exact


def test_unigram_em_word_len_guard_raises(spark):
    """Words past max_word_len overflow the path-count scale — loud
    raise_error, never a silent wrap (the quota-guard convention)."""
    import pytest

    from konohadataplatform_spark.operators.bpe import (
        _unigram_candidates,
        unigram_em_usage,
        word_frequencies,
    )

    docs = spark.createDataFrame(
        [(1, "a" * 20 + " ab")], "doc_id long, text string"
    )
    words = word_frequencies(docs)
    cand = _unigram_candidates(words, 3)
    vocab = spark.createDataFrame([("aa",)], "piece string")
    with pytest.raises(Exception, match="longer than"):
        unigram_em_usage(
            words, cand, vocab, max_word_len=10
        ).collect()
    # at/below the bound the same corpus passes
    assert unigram_em_usage(
        words, cand, vocab, max_word_len=20
    ).count() > 0


def test_unigram_train_em_shapes_and_decode(spark):
    """unigram_train_em returns the unigram_train shapes (vocab has
    piece_rank/piece/usage; words has word/freq/toks) and the decode
    is a total segmentation (tokens rejoin to the word)."""
    from konohadataplatform_spark.operators.bpe import unigram_train_em

    docs = spark.createDataFrame(
        [(i, "banana bandana banal nabla") for i in range(4)],
        "doc_id long, text string",
    )
    vocab, words = unigram_train_em(docs, vocab_size=5, min_usage=2)
    assert vocab.columns == ["piece_rank", "piece", "usage"]
    assert words.columns == ["word", "freq", "toks"]
    rows = words.collect()
    assert rows and all("".join(r.toks) == r.word for r in rows)
    ranks = [r.piece_rank for r in vocab.collect()]
    assert ranks == list(range(1, len(ranks) + 1))


def test_unigram_em_prob_usage_matches_python_replay(spark):
    """r14 weighted E-step: the probability-weighted forward-backward
    must equal a pure-Python replay of the SAME IEEE op sequence
    bit-for-bit (the engine-portability contract: only exactly-rounded
    +,*,/ in a pinned order), and stay within 2 micro-units of a
    brute-force enumeration of all weighted segmentations (the
    algorithmic contract — enumeration sums floats in a different
    order, so exact equality is not promised there)."""
    from collections import Counter
    from math import floor

    from konohadataplatform_spark.operators.bpe import (
        _unigram_candidates,
        unigram_em_prob_usage,
        word_frequencies,
    )

    docs = spark.createDataFrame(
        [(1, "banana bandana"), (2, "banana banal"), (3, "nabla ban")],
        "doc_id long, text string",
    )
    words = word_frequencies(docs)
    cand = _unigram_candidates(words, 3)
    probs = {"an": 0.375, "ban": 0.25, "na": 0.25, "ana": 0.125}
    vocab = spark.createDataFrame(
        list(probs.items()), "piece string, p double"
    )
    got = {
        r.piece: r.usage_emp
        for r in unigram_em_prob_usage(words, cand, vocab).collect()
    }

    FLOOR, L, SCALE = 1e-6, 3, 1_000_000

    def replay(word, freq, out):
        n = len(word)

        def w(i, m):  # 1-based position, piece length
            if m == 1:
                return FLOOR
            if i + m - 1 <= n and word[i - 1 : i - 1 + m] in probs:
                return probs[word[i - 1 : i - 1 + m]]
            return 0.0

        alpha = [1.0]
        for x in range(2, n + 2):
            t = None
            for ln in range(1, L + 1):
                term = (
                    alpha[x - ln - 1] * w(x - ln, ln)
                    if x - 1 >= ln
                    else 0.0
                )
                t = term if t is None else t + term
            alpha.append(t)
        beta = [1.0]
        for m in range(2, n + 2):
            t = None
            for ln in range(1, L + 1):
                term = (
                    w(n + 2 - m, ln) * beta[m - ln - 1]
                    if ln < m
                    else 0.0
                )
                t = term if t is None else t + term
            beta.append(t)
        z = alpha[n]
        for i in range(1, n + 1):
            for ln in range(2, L + 1):
                piece = word[i - 1 : i - 1 + ln]
                if i + ln - 1 <= n and piece in probs:
                    e = (
                        ((alpha[i - 1] * w(i, ln)) * beta[n + 2 - (i + ln) - 1])
                        / z
                    ) * float(SCALE)
                    out[piece] += freq * int(floor(e))

    exp: Counter = Counter()
    for r in words.collect():
        replay(r.word, r.freq, exp)
    assert got == dict(exp) and got

    # brute-force enumeration sanity (tolerance: float order differs)
    def segs(word):
        if not word:
            return [([], 1.0)]
        out = []
        for ln in (1, 2, 3):
            if ln <= len(word):
                piece = word[:ln]
                wgt = FLOOR if ln == 1 else probs.get(piece, 0.0)
                if wgt > 0:
                    for rest, rw in segs(word[ln:]):
                        out.append(([piece] + rest, wgt * rw))
        return out

    brute: Counter = Counter()
    for r in words.collect():
        ss = segs(r.word)
        z = sum(p for _, p in ss)
        occ: Counter = Counter()
        for s, p in ss:
            pos = 1
            for piece in s:
                if len(piece) >= 2:
                    occ[(pos, piece)] += p
                pos += len(piece)
        for (_, piece), mass in occ.items():
            brute[piece] += r.freq * int(floor(mass / z * SCALE))
    for piece, v in exp.items():
        assert abs(v - brute[piece]) <= 2 * max(
            1, exp and max(r.freq for r in words.collect())
        ), (piece, v, brute[piece])


def test_unigram_train_em_prob_shapes_and_decode(spark):
    """unigram_train_em_prob returns the unigram_train shapes and a
    total greedy decode; ranks are contiguous."""
    from konohadataplatform_spark.operators.bpe import unigram_train_em_prob

    docs = spark.createDataFrame(
        [(i, "banana bandana banal nabla") for i in range(4)],
        "doc_id long, text string",
    )
    vocab, words = unigram_train_em_prob(docs, vocab_size=5, min_usage=2)
    assert vocab.columns == ["piece_rank", "piece", "usage"]
    assert words.columns == ["word", "freq", "toks"]
    rows = words.collect()
    assert rows and all("".join(r.toks) == r.word for r in rows)
    ranks = [r.piece_rank for r in vocab.collect()]
    assert ranks == list(range(1, len(ranks) + 1))
