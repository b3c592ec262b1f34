"""Corpus-curation operators: per-group document caps and
group-proportional selection for LLM training-data pipelines
(beyond-reference surface; the RefinedWeb/C4-style "at most N documents
per domain" rule).

The naive spelling — ``ROW_NUMBER() OVER (PARTITION BY source ORDER BY
doc_id) <= cap`` — shuffles EVERY document of the hottest source into
one task and sorts its full list there: at 100 TB a head domain with
10^9 docs is a straggler sort + spill. These operators use the same
two-phase cap the inverted-index build uses (operators/retrieval.py):

1. local: groupBy (spark_partition_id, group) keeps each input
   partition's ``cap`` smallest keys plus a local count — keys are
   (partition, group) so no task ever aggregates more than one input
   partition's share of a hot group;
2. merge: groupBy group over the CAPPED locals — at most cap * P
   candidate keys per group (bounded metadata, not the group's rows) —
   slicing the merged sorted union back to ``cap``.

Each local top-``cap`` holds its partition's smallest keys, so the
global smallest ``cap`` of the union equals the true smallest ``cap``:
output is independent of partitioning, bit-identical to the window
spelling, with zero per-group windows/sorts anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def per_group_cap(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
) -> DataFrame:
    """(group_col, n_total, kept): per group, the total row count and
    the ``cap`` smallest ``key_col`` values (ascending array).

    ``key_col`` must be unique per row (a doc_id). Deterministic "keep
    the lowest ids" selection; swap the key for ``md5(id)`` upstream to
    get a stable pseudo-random cap instead of an age-biased one.
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    local = df.groupBy(
        F.spark_partition_id().alias("_pid"), group_col
    ).agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.slice(F.sort_array(F.collect_list(key_col)), 1, cap).alias("_loc"),
    )
    return local.groupBy(group_col).agg(
        F.sum("_cnt").alias("n_total"),
        F.slice(
            F.sort_array(F.flatten(F.collect_list("_loc"))), 1, cap
        ).alias("kept"),
    )


def apply_group_cap(
    df: DataFrame,
    group_col: str,
    key_col: str,
    cap: int,
    kept_broadcast: bool | None = None,
    kept_broadcast_rows: int = 500_000,
) -> DataFrame:
    """The capped rows themselves: ``df`` filtered to the per-group
    ``cap`` smallest keys, all original columns preserved.

    The kept-key relation is at most ``cap`` keys per group — with
    crawl-scale group counts (10^7-10^8 domains x cap) that is NOT
    metadata-sized, so the broadcast runs behind the r12 counted gate
    (r13, closing VERDICT #2): ``kept_broadcast`` True/False skips
    the count when the caller knows the size; None counts the kept
    relation and broadcasts only at or below ``kept_broadcast_rows``.
    Under the bound the data side neither shuffles nor sorts; above
    it the semi-join runs shuffled on (``group_col``, ``key_col``),
    AQE-sized — still no window. The gate count recomputes the
    per-group aggregate once (the kept relation is not cached — it
    is one partial+final agg over ``df`` and caching corpus-derived
    relations leaked in r7).

    The semi-join keys on (``group_col``, ``key_col``) — a key value
    kept in one group never admits a same-keyed row from ANOTHER
    group past that group's quota (the ADVICE r10 fix). ``key_col``
    must still be unique per row WITHIN a group for the cap to be
    exact (:func:`per_group_cap`'s contract).
    """
    from konohadataplatform_spark.operators.gating import (
        gated_broadcast,
    )

    kept = per_group_cap(df, group_col, key_col, cap).select(
        group_col, F.explode("kept").alias(key_col)
    )
    return df.join(
        gated_broadcast(kept, kept_broadcast, kept_broadcast_rows),
        [group_col, key_col],
        "left_semi",
    ).select(*df.columns)


IMP_SCALE = 1_000_000


def importance_weights(
    docs: DataFrame,
    target_pred,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style data selection: score every document by how much its
    word ``n``-gram mass resembles a TARGET slice of the corpus
    (``target_pred``, e.g. ``lang == 'en'``), for importance-resampling
    a raw crawl toward a target domain. Returns
    (doc_id, imp_score, selected) for EVERY input doc.

    Integer-exact variant: each n-gram's weight is the add-one-smoothed
    target/corpus occurrence ratio, scaled —

        w(t) = ((c_target(t) + 1) * IMP_SCALE) // (c_corpus(t) + 1)

    and ``imp_score = sum(tf * w)`` over the doc's n-grams. The
    corpus-prior factor (T_corpus/T_target), constant across terms, is
    deliberately dropped — it rescales every score identically, and
    selection compares scores against the corpus mean by integer
    cross-multiplication (``imp_score * n_docs > total_score``), so the
    statistic is bit-reproducible in any engine with no float division
    anywhere. The cross-multiplication runs in decimal(38,0): imp_score
    alone can reach ~1e18 and the doc count ~1e12, so the int64 product
    would overflow at web scale; the widened product is exact below
    1e38. Docs shorter than ``n`` words score 0.

    Scale shape: term weights are one partial+final conditional
    aggregate over the (doc, term, tf) relation; the weight join keys
    on ``term`` at tf granularity (one row per doc containing the
    term); the doc-score aggregate shuffles on unique doc_id; the
    selection threshold is a broadcast scalar. Overflow bound:
    (c_target + 1) * IMP_SCALE must fit int64 (target corpus < 9e12
    occurrences of one n-gram).
    """
    from konohadataplatform_spark.operators.retrieval import (
        ngram_tokens,
        term_frequencies,
    )

    ids = docs.select(
        F.col(id_col).alias("doc_id"),
        target_pred.cast("boolean").alias("_is_t"),
    )
    tf = term_frequencies(ngram_tokens(docs, n, text_col, id_col)).join(
        ids, "doc_id"
    )
    wt = tf.groupBy("term").agg(
        F.expr(
            f"div((sum(if(_is_t, tf, 0)) + 1) * {IMP_SCALE}, sum(tf) + 1)"
        ).alias("w")
    )
    ds = (
        tf.join(wt, "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("w")).alias("imp_score"))
    )
    sc = ids.select("doc_id").join(ds, "doc_id", "left").select(
        "doc_id", F.coalesce("imp_score", F.lit(0)).alias("imp_score")
    )
    tot = sc.agg(
        F.count(F.lit(1)).alias("nd"), F.sum("imp_score").alias("ts")
    )
    # selection cross-multiplication widened to decimal(38,0): imp_score
    # can reach ~1e18 (tf * IMP_SCALE summed per doc) and nd ~1e12 docs
    # at web scale, so the int64 product would overflow; the decimal
    # product is exact below 1e38 and costs one widened multiply per doc
    return sc.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "imp_score",
        (
            F.col("imp_score").cast("decimal(38,0)") * F.col("nd")
            > F.col("ts").cast("decimal(38,0)")
        ).alias("selected"),
    )


def shard_plan(
    docs: DataFrame,
    tokens_per_shard: int,
    prefix_chars: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    priority_col: str | None = None,
    token_count_col: str | None = None,
) -> DataFrame:
    """Deterministic token-balanced shard assignment — the layout step
    before writing training shards (WebDataset/tfrecord-style "~N
    tokens per output file"). Returns (doc_id, toks, shard): docs are
    ordered by (md5(text), doc_id) and greedily packed, shard =
    exclusive-prefix-tokens // tokens_per_shard, so every shard except
    possibly the last holds >= tokens_per_shard and overflows by at
    most one document.

    Scale shape (no global window): the priority's first
    ``prefix_chars`` chars split the sort order into lexicographic
    ranges that are PREFIX-CONSISTENT with the global order, so
    per-range local prefix sums + broadcast range offsets (one row per
    distinct prefix — metadata) reproduce the exact global prefix.
    Pick prefix_chars so one range fits a task (md5 default: 16^p
    ranges, p=4 -> 65536). Deterministic under any partitioning:
    priority ties break on the unique doc_id.

    ``priority_col`` overrides the md5 shuffle order with a custom
    STRING ordering (curriculum sharding: a zero-padded difficulty
    score). Correctness never depends on prefix balance — only range
    sizing does — but a constant prefix degrades to one sort task, so
    fixed-width keys with a varying head are the contract.

    ``token_count_col`` opts in to TOKENIZER-accurate budgets:
    training-shard sizes are specified in tokenizer tokens, not
    whitespace words, so a real pipeline precomputes per-doc counts
    (e.g. ``bpe_encode_docs``' ``n_bpe_tokens``) and passes that
    column here; the packer then budgets on it (NULL counts as 0 —
    docs the tokenizer produced no row for). The whitespace count
    stays the default for count-free callers.
    """
    if tokens_per_shard < 1:
        raise ValueError("tokens_per_shard must be >= 1")
    from pyspark.sql.window import Window

    if token_count_col is not None:
        toks = F.coalesce(
            F.col(token_count_col).cast("bigint"),
            F.lit(0).cast("bigint"),
        )
    else:
        toks = F.when(
            F.col(text_col).isNull(), F.lit(0)
        ).otherwise(
            F.size(F.split(F.trim(F.col(text_col)), " "))
        ).cast("bigint")
    pri = (
        F.col(priority_col) if priority_col is not None
        else F.md5(F.col(text_col))
    )
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
        # NULL priorities (md5 of NULL text) coalesce to '' so the
        # sort position is explicit — Spark orders NULLs first but
        # SQL engines differ (DuckDB defaults NULLS LAST), and ''
        # sorts before every hex char in both
        F.coalesce(pri.cast("string"), F.lit("")).alias("pri"),
    ).withColumn(
        "rng", F.coalesce(F.substring("pri", 1, prefix_chars), F.lit(""))
    )
    off_w = (
        Window.orderBy("rng").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        d.groupBy("rng")
        .agg(F.sum("toks").alias("_rng_toks"))
        .withColumn("offset", F.coalesce(F.sum("_rng_toks").over(off_w), F.lit(0)))
        .drop("_rng_toks")
    )
    local_w = (
        Window.partitionBy("rng")
        .orderBy("pri", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.join(F.broadcast(offsets), "rng")
        .withColumn("_before", F.coalesce(F.sum("toks").over(local_w), F.lit(0)))
        .select(
            "doc_id",
            "toks",
            # bigint: at 100 TB total_tokens/budget can pass 2^31 and a
            # non-ANSI int cast would wrap to negative shard ids
            F.expr(f"(offset + _before) div {int(tokens_per_shard)}")
            .alias("shard"),
        )
    )


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    tokens_per_shard: int,
    prefix_chars: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the corpus as token-balanced parquet shards
    (``out_dir/shard=K/``) and return the manifest (shard, n_docs,
    toks). One shuffle on the shard key co-locates each output file's
    rows; `partitionBy` makes the shard id part of the layout so a
    trainer can stream shard directories independently."""
    plan = shard_plan(
        docs, tokens_per_shard, prefix_chars, text_col, id_col
    ).persist()  # two actions below (write + manifest): plan once
    try:
        tagged = docs.join(
            plan.select(F.col("doc_id").alias(id_col), "shard"), id_col
        )
        (
            tagged.repartition("shard")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(out_dir)
        )
        return (
            plan.groupBy("shard")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("toks").alias("toks"),
            )
            .orderBy("shard")
            .localCheckpoint()  # materialize off the cache before release
        )
    finally:
        plan.unpersist()


def leakage_free_split(
    docs: DataFrame,
    threshold: float = 0.8,
    train_nibbles: int = 13,
    val_nibbles: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/val/test split that CANNOT leak near-duplicates across
    folds: documents first cluster by near-duplicate similarity
    (trigram Jaccard >= ``threshold``, connected components), then the
    whole cluster inherits one fold from the md5 nibble of its
    REPRESENTATIVE id — so a test document's paraphrases/copies can
    never sit in train. Under a plain per-doc hash split
    (q_dataset_split) a near-dup pair straddles folds with probability
    ~31% (1 - 13²/16² - 1/16² - 4/16²); this rule makes it 0.

    Returns (doc_id, cluster_rep, split). Fold fractions follow the
    nibble budget (default 13/16 train, 1/16 val, 2/16 test) over
    CLUSTERS, which converges to the same doc-level fractions when
    duplicates are a small corpus share. Deterministic and stable
    under corpus growth ONLY for docs whose cluster membership is
    unchanged — merging two clusters re-draws the merged cluster's
    fold (inherent to any leakage-free rule; record splits at release
    time like any dataset card does).

    Scale: clustering is operators/dedup.dedup_clusters — the exact
    prefix-filtered Jaccard self-join plus fixed-point min-label
    components (candidate generation is inverted-index-pruned, not
    all-pairs; for web-scale corpora swap the pair stage for
    minhash_lsh_candidates and keep the same component/fold tail).
    The fold column is one projection on its output.
    """
    from konohadataplatform_spark.operators.dedup import dedup_clusters

    clusters = dedup_clusters(
        docs, threshold=threshold, text_col=text_col, id_col=id_col
    )
    nibble = F.conv(
        F.substring(F.md5(F.col("cluster_rep").cast("string")), 1, 1), 16, 10
    ).cast("int")
    return clusters.select(
        F.col(id_col),
        F.col("cluster_rep"),
        F.when(nibble < train_nibbles, "train")
        .when(nibble < train_nibbles + val_nibbles, "val")
        .otherwise("test")
        .alias("split"),
    )


# --------------------------------------------------------------------------
# PII redaction (the C4/CCNet-style scrub pass)
# --------------------------------------------------------------------------
# Patterns chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB): character classes, bounded repetition, \b anchors —
# no backreferences, no lookaround (RE2 has neither).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}-\d{4}\b"


def pii_redact(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    passthrough: list[str] | None = None,
) -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, redacted): emails, IPv4
    addresses, and NNN-NNNN phone fragments replaced with typed
    sentinel tokens (``<EMAIL>``/``<IP>``/``<PHONE>``), per-doc match
    counts alongside — the pre-training scrub pass every public
    pipeline runs (C4 removed pages by blocklist; CCNet/RefinedWeb
    descendants redact in place to conserve the surrounding text).

    Order matters and is part of the contract: emails first (their
    domains can contain digit runs an IP pattern would chew), then
    IPs (dotted digit runs a phone pattern could partially match),
    then phones. Counts are taken BEFORE any replacement, on the
    original text, so they are independent of sentinel choice.

    Scale shape: one narrow projection, zero exchanges, zero UDFs —
    regexp_replace/regexp_count are codegen'd JVM expressions, so the
    pass runs at scan speed and pipelines into whatever follows.
    """
    t = F.col(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_IP_RE)).cast("bigint").alias("n_ips"),
        F.regexp_count(t, F.lit(PII_PHONE_RE)).cast("bigint").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"),
                PII_IP_RE,
                "<IP>",
            ),
            PII_PHONE_RE,
            "<PHONE>",
        ).alias("redacted"),
        *[F.col(c) for c in (passthrough or [])],
    )


PII_IPV6_RE = r"\b(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\b"
PII_CC_RE = r"\b(?:\d[ -]?){15}\d\b"


def _luhn_valid(cand):
    """Boolean Column: does a 16-digit candidate (spaces/dashes
    allowed) pass the Luhn checksum? Static 16-term integer sum —
    doubling the odd 1-based positions of the separator-stripped
    digits is exactly double-every-second-from-the-right for length
    16. No UDF, no loop at runtime."""
    d = F.replace(
        F.replace(cand, F.lit(" "), F.lit("")), F.lit("-"), F.lit("")
    )
    total = F.lit(0)
    for i in range(1, 17):
        dig = F.substring(d, i, 1).cast("int")
        if i % 2 == 1:
            term = F.when(dig * 2 > 9, dig * 2 - 9).otherwise(dig * 2)
        else:
            term = dig
        total = total + term
    return total % 10 == 0


def pii_redact_v2(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """:func:`pii_redact` extended with a CHECKSUMMED class and IPv6:
    (doc_id, n_emails, n_ip6s, n_ips, n_ccs, n_phones, redacted).

    - credit cards: 16-digit runs (optional single space/dash between
      digits) that pass the **Luhn checksum** — verified by a static
      16-term integer expression, so a Luhn-FAILING 16-digit run stays
      in the text (a regex alone cannot express that); valid matches
      are replaced literally via one ``aggregate`` higher-order fold
    - IPv6: full-form addresses (8 colon-separated hex groups;
      compressed ``::`` forms are out of scope and documented so)

    Replacement order extends the v1 contract (emails first, then
    IPs, then phones): email -> IPv6 -> IPv4 -> credit card -> phone.
    IPv6 precedes IPv4 (dotted quads never contain colons, the
    reverse protects nothing but the order is fixed for
    reproducibility); cards precede phones (the phone pattern is a
    sub-shape of dashed card groups). Counts are taken BEFORE any
    replacement, on the original text.

    Scale shape: still one codegen projection — regexp_count /
    regexp_extract_all / the Luhn fold are all JVM expressions, zero
    exchanges, zero UDFs; scan-speed at 100 TB like v1.
    """
    t = F.col(text_col)
    valid_ccs = F.filter(
        F.regexp_extract_all(t, F.lit(PII_CC_RE), F.lit(0)), _luhn_valid
    )
    s1 = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    s2 = F.regexp_replace(s1, PII_IPV6_RE, "<IP6>")
    s3 = F.regexp_replace(s2, PII_IP_RE, "<IP>")
    s4 = F.aggregate(
        valid_ccs,
        s3,
        lambda acc, c: F.replace(acc, c, F.lit("<CC>")),
    )
    s5 = F.regexp_replace(s4, PII_PHONE_RE, "<PHONE>")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(t, F.lit(PII_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(t, F.lit(PII_IPV6_RE)).cast("bigint").alias("n_ip6s"),
        F.regexp_count(t, F.lit(PII_IP_RE)).cast("bigint").alias("n_ips"),
        F.size(valid_ccs).cast("bigint").alias("n_ccs"),
        F.regexp_count(t, F.lit(PII_PHONE_RE)).cast("bigint").alias("n_phones"),
        s5.alias("redacted"),
    )


# --------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, Appendix A1.1) — integer-exact
# --------------------------------------------------------------------------
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    min_stopwords: int = 2,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """Per-doc Gopher-rule quality flags (the published heuristic
    filter battery from the Gopher/MassiveText pipeline), each rule an
    INTEGER comparison so the verdicts are bit-reproducible in any
    engine:

    - ``ok_word_count``: word count in [min_words, max_words]
    - ``ok_mean_word_len``: mean word length in [3, 10], tested as
      ``3 * n_words <= total_chars <= 10 * n_words`` (no division)
    - ``ok_alpha_ratio``: >= 80% of words contain an alphabetic
      character, tested as ``5 * n_alpha_words >= 4 * n_words``
    - ``ok_stopwords``: at least ``min_stopwords`` occurrences from
      the 8-word Gopher stop list (a proxy for "is running prose")
    - ``pass_gopher``: all of the above

    NULL/empty text fails every rule (n_words = 0). Tokenization is
    the repo-wide single-space split — the same definition every other
    text operator uses, so flags compose with their outputs.

    Scale shape: one projection over the token array (higher-order
    functions, zero exchanges, zero UDFs); at 100 TB this is a
    scan-speed filter exactly like the heuristic quality_score gate.
    """
    words = F.split(F.trim(F.col(text_col)), " ")
    n_words = F.when(
        F.col(text_col).isNull() | (F.trim(F.col(text_col)) == ""), F.lit(0)
    ).otherwise(F.size(words)).cast("bigint")
    total_chars = F.coalesce(
        F.aggregate(
            words, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
        ),
        F.lit(0),
    )
    n_alpha = F.coalesce(
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))), F.lit(0)
    ).cast("bigint")
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.coalesce(
        F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w))),
        F.lit(0),
    ).cast("bigint")
    ok_wc = (n_words >= min_words) & (n_words <= max_words)
    ok_mwl = (
        (F.lit(int(min_mean_word_len)) * n_words <= total_chars)
        & (total_chars <= F.lit(int(max_mean_word_len)) * n_words)
        & (n_words > 0)
    )
    ok_alpha = (F.lit(5) * n_alpha >= F.lit(4) * n_words) & (n_words > 0)
    ok_stop = n_stop >= min_stopwords
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        total_chars.alias("total_chars"),
        n_alpha.alias("n_alpha_words"),
        n_stop.alias("n_stopwords"),
        ok_wc.alias("ok_word_count"),
        ok_mwl.alias("ok_mean_word_len"),
        ok_alpha.alias("ok_alpha_ratio"),
        ok_stop.alias("ok_stopwords"),
        (ok_wc & ok_mwl & ok_alpha & ok_stop).alias("pass_gopher"),
        # passthrough: carry caller columns through the projection so a
        # battery of per-row filters composes on ONE scan instead of
        # re-scanning and joining per flag set (the r14 funnel fix)
        *[F.col(c) for c in (passthrough or [])],
    )


def gopher_repetition_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_line_pct: int = 30,
    max_dup_para_pct: int = 30,
    max_top2_pct: int = 20,
    max_top3_pct: int = 18,
    max_top4_pct: int = 16,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """The second half of the Gopher filter battery (Rae et al. 2021
    §A1.1): the REPETITION rules, complementing the word-form rules in
    :func:`gopher_quality_flags`.

    Per document:

    - ``ok_dup_lines`` — fraction of (trimmed, non-empty) newline-split
      lines that are duplicates of another line stays <=
      ``max_dup_line_pct``/100 (Gopher removes above 0.30)
    - ``ok_dup_paras`` — same over blank-line-separated paragraphs
    - ``ok_top2/3/4`` — the non-space character mass of the single most
      frequent word 2-/3-/4-gram, as a fraction of the doc's non-space
      characters, stays <= 20% / 18% / 16% (ties broken by
      lexicographically smallest gram, so the winner — and therefore
      the verdict — is engine-portable)
    - ``pass_repetition`` — all of the above

    Thresholds are PERCENT integers and every comparison is an integer
    cross-multiplication (``mass * 100 <= pct * total``) — no division,
    so verdicts are bit-reproducible in any engine. Docs with zero
    lines / fewer than n words vacuously pass (the word-form battery
    already fails empty docs).

    Scale shape: the line/paragraph stats are one zero-exchange
    projection (higher-order functions over the doc's own splits); the
    top-gram pass explodes (doc_id, n, gram) rows — text never carried,
    grams only — into a partial-agg count and a per-(doc, n) window,
    every stage partitioned by doc_id. Same plan family as
    ``text.repetition_stats``, one pass for all three gram sizes.
    """
    from pyspark.sql.window import Window

    # NULL-safe: NULL text folds to '' here (F.size of a NULL array is
    # -1, which would poison the dup-fraction comparisons)
    t = F.coalesce(F.trim(F.col(text_col)), F.lit(""))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        t.alias("_tt"),
        F.split(t, " ").alias("_w"),
        *[F.col(c) for c in (passthrough or [])],
    )

    def _units(sep: str):
        arr = F.filter(
            F.transform(F.split(F.col("_tt"), sep), lambda x: F.trim(x)),
            lambda x: x != F.lit(""),
        )
        n = F.coalesce(F.size(arr), F.lit(0)).cast("bigint")
        ndup = (n - F.coalesce(F.size(F.array_distinct(arr)), F.lit(0))
                ).cast("bigint")
        return n, ndup

    n_lines, n_dup_lines = _units("\n")
    n_paras, n_dup_paras = _units("\n\n")
    nonspace = F.coalesce(
        F.length(
            F.replace(F.replace(F.col("_tt"), F.lit(" "), F.lit("")),
                      F.lit("\n"), F.lit(""))
        ),
        F.lit(0),
    ).cast("bigint")
    # top-n-gram mass is PER-DOCUMENT data: sort the row's own gram
    # array and take the longest equal-run — the most-frequent gram
    # with lexicographic tie-break, exactly the old explode ->
    # groupBy -> window pick, but as a ZERO-EXCHANGE projection. The
    # r13 version shuffled (doc_id, gram) pairs — nearly the corpus
    # token mass — through a hash aggregate just to count WITHIN
    # single rows; that shuffle was the filter funnel's dominant sf1
    # cost. Run detection is spelled as boundary positions + run
    # lengths (cheap integer/string compares per element) instead of
    # a struct-accumulator fold, and every intermediate is bound as
    # its OWN column so the interpreted HOFs evaluate once (Spark's
    # CollapseProject keeps multi-referenced non-cheap aliases in
    # their own projection).
    pass_cols = [F.col(c) for c in (passthrough or [])]
    step = base.select(
        "doc_id",
        n_lines.alias("n_lines"),
        n_dup_lines.alias("n_dup_lines"),
        n_paras.alias("n_paras"),
        n_dup_paras.alias("n_dup_paras"),
        nonspace.alias("nonspace_chars"),
        *[
            F.expr(
                f"if(size(_w) >= {n}, "
                f"array_sort(transform(sequence(0, size(_w) - {n}), "
                f"i -> concat_ws(' ', slice(_w, i + 1, {n})))), "
                "cast(array() as array<string>))"
            ).alias(f"_s{n}")
            for n in (2, 3, 4)
        ],
        *pass_cols,
    )
    for n in (2, 3, 4):
        # run-start positions in the sorted gram array
        step = step.withColumn(
            f"_b{n}",
            F.expr(
                f"if(size(_s{n}) = 0, cast(array() as array<int>), "
                f"filter(sequence(1, size(_s{n})), i -> i = 1 or "
                f"element_at(_s{n}, i) != element_at(_s{n}, i - 1)))"
            ),
        )
        # run lengths: next boundary (or end+1) minus this boundary
        step = step.withColumn(
            f"_l{n}",
            F.expr(
                f"if(size(_b{n}) = 0, cast(array() as array<bigint>), "
                f"zip_with(_b{n}, concat(slice(_b{n}, 2, "
                f"size(_b{n}) - 1), array(size(_s{n}) + 1)), "
                "(s, e) -> cast(e - s as bigint)))"
            ),
        )
    def _top_mass(n: int):
        # max run = top count; first max position = lexicographically
        # smallest gram among ties (the array is sorted ascending) —
        # the (cnt DESC, gram ASC) window pick
        return F.expr(
            f"if(size(_l{n}) = 0, 0L, "
            f"array_max(_l{n}) * length(replace(element_at(_s{n}, "
            f"element_at(_b{n}, cast(array_position(_l{n}, "
            f"array_max(_l{n})) as int))), ' ', '')))"
        ).cast("bigint")

    j = step.select(
        "doc_id",
        "n_lines",
        "n_dup_lines",
        "n_paras",
        "n_dup_paras",
        "nonspace_chars",
        _top_mass(2).alias("top2_mass"),
        _top_mass(3).alias("top3_mass"),
        _top_mass(4).alias("top4_mass"),
        *pass_cols,
    )
    top2 = F.coalesce("top2_mass", F.lit(0)).cast("bigint")
    top3 = F.coalesce("top3_mass", F.lit(0)).cast("bigint")
    top4 = F.coalesce("top4_mass", F.lit(0)).cast("bigint")
    ok_lines = (
        F.col("n_dup_lines") * 100
        <= F.lit(int(max_dup_line_pct)) * F.col("n_lines")
    )
    ok_paras = (
        F.col("n_dup_paras") * 100
        <= F.lit(int(max_dup_para_pct)) * F.col("n_paras")
    )
    ok2 = top2 * 100 <= F.lit(int(max_top2_pct)) * F.col("nonspace_chars")
    ok3 = top3 * 100 <= F.lit(int(max_top3_pct)) * F.col("nonspace_chars")
    ok4 = top4 * 100 <= F.lit(int(max_top4_pct)) * F.col("nonspace_chars")
    return j.select(
        "doc_id",
        "n_lines",
        "n_dup_lines",
        "n_paras",
        "n_dup_paras",
        "nonspace_chars",
        top2.alias("top2_mass"),
        top3.alias("top3_mass"),
        top4.alias("top4_mass"),
        ok_lines.alias("ok_dup_lines"),
        ok_paras.alias("ok_dup_paras"),
        ok2.alias("ok_top2"),
        ok3.alias("ok_top3"),
        ok4.alias("ok_top4"),
        (ok_lines & ok_paras & ok2 & ok3 & ok4).alias("pass_repetition"),
        *[F.col(c) for c in (passthrough or [])],
    )


# substrings whose presence removes a line in the public C4 cleaner
# (tensorflow_datasets c4_utils.clean_page policy screens)
C4_POLICY_MARKERS = (
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "use of cookies",
    "use cookies",
)
C4_END_MARKS_RE = r'[.!?"”]$'


def c4_quality_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_sentences: int = 5,
    min_words_per_line: int = 3,
) -> DataFrame:
    """The C4 prose filter battery (Raffel et al. 2020 §2.2 and the
    public ``c4_utils.clean_page``), completing the canonical
    quality-filter set next to the Gopher (:func:`gopher_quality_flags`)
    and StarCoder (:func:`code_quality_flags`) batteries. Line screens
    REWRITE the page; page screens FLAG it:

    Line level (a line survives iff ALL hold):

    - ends in a terminal punctuation mark (``. ! ?`` or a closing
      quote — the paper's end-mark rule);
    - has at least ``min_words_per_line`` words (single-space split,
      the repo-wide tokenization);
    - does not mention ``javascript`` (case-folded — the paper's
      "enable Javascript" banner screen);
    - carries none of the :data:`C4_POLICY_MARKERS` substrings
      (case-folded cookie/policy boilerplate).

    Page level:

    - ``ok_min_sentences``: the KEPT text has at least
      ``min_sentences`` sentences, where the sentence count is the
      number of ``. ! ?`` marks in the kept lines (an integer-exact
      stand-in for the paper's nltk sentence tokenizer — same
      monotonicity, no Python in the loop);
    - ``ok_no_lorem``: the RAW page does not contain ``lorem ipsum``
      (case-folded);
    - ``ok_no_brace``: the raw page contains no ``{`` (the paper's
      source-code screen);
    - ``pass_c4``: all page screens.

    Returns ``(doc_id, n_lines, n_kept_lines, n_sentences,
    ok_min_sentences, ok_no_lorem, ok_no_brace, pass_c4,
    cleaned_text)`` — ``cleaned_text`` is the surviving trimmed lines
    re-joined by newline (empty when nothing survives). NULL text
    behaves as the empty page.

    Scale shape: the whole battery is ONE codegen projection —
    higher-order filter/transform over the line array plus substring
    screens, zero exchanges, zero UDFs; scan-speed at 100 TB, the
    same plan class as the Gopher and StarCoder batteries. Every
    verdict is an integer/boolean comparison, bit-reproducible in any
    engine.
    """
    raw = F.coalesce(F.col(text_col), F.lit(""))
    lower = F.lower(raw)
    lines = F.split(raw, "\n")

    def _line_ok(l):
        t = F.trim(l)
        lt = F.lower(t)
        ok = (
            t.rlike(C4_END_MARKS_RE)
            & (F.size(F.split(t, " ")) >= F.lit(int(min_words_per_line)))
            & ~F.contains(lt, F.lit("javascript"))
        )
        for m in C4_POLICY_MARKERS:
            ok = ok & ~F.contains(lt, F.lit(m))
        return ok

    kept = F.filter(F.transform(lines, F.trim), _line_ok)
    cleaned = F.array_join(kept, "\n")
    n_lines = F.size(lines).cast("bigint")
    n_kept = F.size(kept).cast("bigint")
    n_sent = F.length(
        F.regexp_replace(cleaned, r"[^.!?]", "")
    ).cast("bigint")
    ok_sent = n_sent >= F.lit(int(min_sentences))
    ok_lorem = ~F.contains(lower, F.lit("lorem ipsum"))
    ok_brace = ~F.contains(raw, F.lit("{"))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_lines.alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        n_sent.alias("n_sentences"),
        ok_sent.alias("ok_min_sentences"),
        ok_lorem.alias("ok_no_lorem"),
        ok_brace.alias("ok_no_brace"),
        (ok_sent & ok_lorem & ok_brace).alias("pass_c4"),
        cleaned.alias("cleaned_text"),
    )


def mixture_sample(
    docs: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic hash-based corpus mixing: keep each document with
    its source's sampling rate, decided by a salted md5 of the doc id
    — the reservoir-free mixture sampling every pretraining data
    pipeline runs (Pile/ROOTS-style source weighting). Reproducible
    across reruns and engines (no RNG state; change ``seed`` to
    redraw), and each doc's verdict is independent of every other
    row, so the pass is one scan-speed projection — no shuffle, no
    sample() nondeterminism, trivially resumable at 100 TB.

    The draw: ``hkey`` = first 15 hex digits of
    ``md5(seed || ':' || doc_id)`` as a bigint (uniform over 2^60);
    ``selected`` iff ``hkey < floor(rate * 2^60)`` — an integer
    comparison, no floating point at runtime. Unknown sources use
    ``default_rate``. Returns every row with (hkey, rate-scaled
    threshold applied) so callers can audit rates; filter on
    ``selected`` for the sampled corpus.
    """
    lim = 1 << 60
    if not rates:
        raise ValueError("rates must name at least one source")
    for s, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {s!r} outside [0, 1]: {r}")
    hkey = F.expr(
        f"cast(conv(substring(md5(concat('{seed}', ':', "
        f"cast({id_col} as string))), 1, 15), 16, 10) as bigint)"
    )
    thr = F.lit(int(default_rate * lim))
    for s, r in sorted(rates.items()):
        thr = F.when(F.col(source_col) == s, F.lit(int(r * lim))).otherwise(
            thr
        )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        hkey.alias("hkey"),
        (hkey < thr).alias("selected"),
    )


DUP_NGRAM_PCTS = {5: 15, 6: 14, 7: 13, 8: 12, 9: 11, 10: 10}


def gopher_dup_ngram_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pcts: dict[int, int] | None = None,
) -> DataFrame:
    """The final third of the Gopher repetition battery (Rae et al.
    2021 §A1.1 rows 5-10): for each n in 5..10, the fraction of
    characters covered by words inside DUPLICATED n-grams (n-grams
    occurring >= 2 times in the document), counting overlapping
    occurrences once — Gopher removes when the fraction exceeds
    0.15/0.14/0.13/0.12/0.11/0.10 for n = 5..10.

    Coverage is an interval union over word positions: every
    occurrence of a duplicated n-gram covers word indexes
    [i, i+n-1]; sorted same-length intervals merge exactly like
    ``exact_substring_rewrite``'s cut spans (a new island starts when
    the gap to the previous start exceeds n-1), and each island's
    character mass sums that word-slice's lengths from the doc's own
    token array. Thresholds are PERCENT integers compared by
    cross-multiplication — bit-reproducible verdicts, no division.

    Returns (doc_id, nonspace_chars, dup5_mass..dup10_mass,
    ok_dup5..ok_dup10, pass_dup_ngrams). Docs with < n words have
    zero mass for that n (vacuous pass).

    Scale shape: one (doc_id, n, gram-position) explode — grams only,
    never text — into a per-(doc, n, gram) partial-agg count, a
    per-(doc, n) window over duplicated positions, and one join back
    to the doc's token array; every stage is partitioned by doc_id.
    """
    from pyspark.sql.window import Window

    pcts = dict(DUP_NGRAM_PCTS if pcts is None else pcts)
    ns = sorted(pcts)
    t = F.coalesce(F.trim(F.col(text_col)), F.lit(""))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(t, " ").alias("_w"),
        F.coalesce(
            F.length(F.replace(t, F.lit(" "), F.lit(""))), F.lit(0)
        ).cast("bigint").alias("nonspace_chars"),
    )
    ns_arr = ", ".join(str(n) for n in ns)
    # the gram is only ever a GROUP KEY (never output), so carry a
    # 60-bit md5 digest instead of the joined words: the shuffled row
    # shrinks from ~(10 words) to 4 ints, which is what kept the sf1
    # smoke from spilling (11.5x superlinear with string grams, ~linear
    # with digests). Both engines compute the same digest (oracle
    # mirrors it), so collisions — ~2^-60 per same-doc gram pair —
    # affect both sides identically.
    grams = base.select(
        "doc_id",
        F.explode(
            F.expr(
                f"flatten(transform(filter(array({ns_arr}), n -> size(_w) >= n), "
                "n -> transform(sequence(0, size(_w) - n), "
                "i -> struct(n AS n, i AS i, "
                "cast(conv(substring(md5(concat_ws(' ', slice(_w, i + 1, n))),"
                " 1, 15), 16, 10) as bigint) AS gram))))"
            )
        ).alias("s"),
    ).select("doc_id", "s.n", "s.i", "s.gram")
    # positions of DUPLICATED grams only (count >= 2 per (doc, n, gram))
    dup_pos = (
        grams.groupBy("doc_id", "n", "gram")
        .agg(F.count(F.lit(1)).alias("_c"), F.collect_list("i").alias("_ps"))
        .filter(F.col("_c") >= 2)
        .select("doc_id", "n", F.explode("_ps").alias("i"))
    )
    w = Window.partitionBy("doc_id", "n").orderBy("i")
    islands = dup_pos.withColumn(
        "_new",
        F.when(F.col("i") - F.lag("i").over(w) > F.col("n") - 1, F.lit(1))
        .otherwise(F.lit(0)),
    ).withColumn(
        "_isl",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = islands.groupBy("doc_id", "n", "_isl").agg(
        F.min("i").alias("s"),
        (F.max("i") + F.col("n") - 1).alias("e"),
    )
    span_lists = spans.groupBy("doc_id", "n").agg(
        F.collect_list(F.struct("s", "e")).alias("_spans")
    )
    mass_expr = F.expr(
        "aggregate(_spans, 0L, (acc, sp) -> acc + "
        "aggregate(slice(_w, cast(sp.s + 1 as int), "
        "cast(sp.e - sp.s + 1 as int)), 0L, (a, wd) -> a + length(wd)))"
    )
    masses = (
        span_lists.join(base.select("doc_id", "_w"), "doc_id")
        .select("doc_id", "n", mass_expr.alias("_m"))
        .groupBy("doc_id")
        .agg(*[
            F.max(F.when(F.col("n") == n, F.col("_m"))).alias(f"_m{n}")
            for n in ns
        ])
    )
    j = base.select("doc_id", "nonspace_chars").join(masses, "doc_id", "left")
    cols = [F.col("doc_id"), F.col("nonspace_chars")]
    oks = []
    for n in ns:
        m = F.coalesce(F.col(f"_m{n}"), F.lit(0)).cast("bigint")
        ok = m * 100 <= F.lit(int(pcts[n])) * F.col("nonspace_chars")
        cols.append(m.alias(f"dup{n}_mass"))
        oks.append(ok.alias(f"ok_dup{n}"))
    allok = None
    for n in ns:
        m = F.coalesce(F.col(f"_m{n}"), F.lit(0)).cast("bigint")
        ok = m * 100 <= F.lit(int(pcts[n])) * F.col("nonspace_chars")
        allok = ok if allok is None else (allok & ok)
    return j.select(*cols, *oks, allok.alias("pass_dup_ngrams"))


# --------------------------------------------------------------------------
# Language-temperature sampling quotas (multilingual corpus balancing)
# --------------------------------------------------------------------------
def lang_temperature_quota(
    docs: DataFrame,
    budget: int,
    lang_col: str = "lang",
    scale: int = 1_000_000,
) -> DataFrame:
    """(lang, n_docs, weight, quota): how many of ``budget`` sampled
    documents each language gets under temperature sampling with
    alpha = 0.5 — the standard multilingual-pretraining rebalance
    (mBERT/XLM-R exponentiate language mass to flatten the head;
    alpha = 0.5 is the square root).

    weight = floor(sqrt(n_docs * scale)) — an integer, and exact
    across engines because IEEE-754 sqrt is correctly rounded and
    n_docs * scale stays below 2^52. quota = budget * weight div
    sum(weights) (floor division; the <#langs remainder docs are the
    caller's to assign). Head languages get sub-proportional quotas,
    tail languages super-proportional — the alpha contract.

    Scale shape: one partial+final count per language (metadata-sized
    result), a broadcast total, one projection. The corpus is scanned
    once; nothing language-sized ever shuffles.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    counts = docs.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    # the cross-engine exactness claim requires n_docs * scale < 2^52
    # (exact-double range for the sqrt input); past it, floor(sqrt(...))
    # may legitimately differ between engines — fail loudly instead.
    # Guard in DIVISION form (the epoch_schedule r11-ADVICE fix): the
    # multiply-then-compare spelling wraps int64 for n_docs > ~9.2e12
    # and the check silently passes. n_docs <= (2^52 - 1) div scale
    # <=> n_docs * scale < 2^52, overflow-free for any n_docs.
    max_docs = ((1 << 52) - 1) // int(scale)
    weighted = counts.withColumn(
        "weight",
        F.floor(
            F.sqrt(
                F.expr(
                    f"if(n_docs <= {max_docs}L, "
                    f"n_docs * {int(scale)}L, "
                    "raise_error(concat('lang_temperature_quota: n_docs "
                    "* scale = ', cast(n_docs as string), ' * "
                    f"{int(scale)} >= 2^52 — floor(sqrt) is no longer "
                    "engine-exact; lower scale')))"
                )
            )
        ).cast("bigint"),
    )
    tot = weighted.agg(F.sum("weight").alias("_tw"))
    return weighted.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "weight",
        F.expr(f"CAST({int(budget)} * weight DIV _tw AS BIGINT)").alias(
            "quota"
        ),
    )


def perplexity_partition(
    df: DataFrame,
    train_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 3,
    alpha: float = 0.4,
) -> DataFrame:
    """CCNet's perplexity partitioning: score every non-reference doc
    with the stupid-backoff trigram LM trained on the ``train_pred``
    split (:func:`~konohadataplatform_spark.operators.text.
    trigram_backoff_surprisal`), rank ascending (fluent first), and
    cut into ``buckets`` equal tiles — head / middle / tail for the
    default 3 (CCNet keeps head, samples middle, drops tail).

    Returns ``(doc_id, n_trigrams, surprisal, ppl_rank, bucket)``.
    The tile arithmetic is explicit integer math —
    ``floor((rank - 1) * buckets / n)`` — NOT a window NTILE, for two
    reasons: NTILE's remainder placement is engine-specific trivia,
    and (the scale reason) a global NTILE is a single-task sort. The
    rank comes from :func:`~konohadataplatform_spark.operators.
    ranking.scalable_row_number` (range-partitioned local ranks + a
    metadata offsets table), ordered by the ROUNDED surprisal with
    doc_id tie-break — a total order both engines reproduce.
    """
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    from konohadataplatform_spark.operators.ranking import (
        scalable_row_number,
    )
    from konohadataplatform_spark.operators.text import (
        trigram_backoff_surprisal,
    )

    scored = trigram_backoff_surprisal(
        df, train_pred, text_col=text_col, id_col=id_col, alpha=alpha
    )
    # N rides along from the same per-partition counts relation that
    # produced the ranks (total_col) — the old separate
    # `scored.select(count(*))` + crossJoin re-executed the whole LM
    # scoring lineage a second time for one number (r14 optimization
    # round; same fix margin_tiles got in r11).
    ranked = scalable_row_number(
        scored,
        [F.col("surprisal").asc(), F.col(id_col).asc()],
        out_col="ppl_rank",
        total_col="_n",
        # counted gate: one scored row per input doc, so the raw input
        # bounds the ranked relation without executing the LM scoring
        probe_side=df,
    )
    tile = F.expr(f"CAST((ppl_rank - 1) * {int(buckets)} DIV _n AS INT)")
    label = (
        F.when(tile == 0, F.lit("head"))
        .when(tile == F.lit(buckets - 1), F.lit("tail"))
        .otherwise(F.lit("middle"))
        if buckets == 3
        else F.concat(F.lit("tile_"), tile.cast("string"))
    )
    return ranked.select(
        id_col, "n_trigrams", "surprisal", "ppl_rank",
        label.alias("bucket"),
    )


def stratified_sample(
    df: DataFrame,
    group_col: str,
    quota: int,
    id_col: str = "doc_id",
    kept_broadcast: bool | None = None,
    kept_broadcast_rows: int = 500_000,
) -> DataFrame:
    """EXACT-count stratified sample: per ``group_col`` value, exactly
    ``quota`` rows (fewer only if the stratum is smaller), selected by
    smallest ``md5(id)`` — the deterministic analog of uniform random
    sampling, identical on every rerun and in every engine. The
    eval-set/holdout builder: :func:`mixture_sample`'s hash gate gives
    a random-RATE sample (binomial count per source); this gives the
    exact per-stratum COUNT an eval suite needs.

    Selection key is ``md5(id) || length-prefixed id`` — the digest
    makes the order pseudo-random and id-uniform (not age-biased); the
    suffix (``lpad(length(id), 4) || id``, injective for ids up to
    9999 chars, never truncated) makes the key total even under
    digest-prefix collisions. ``id_col`` must be UNIQUE per row — a
    duplicated id collides to one key and the quota semi-join would
    admit both rows. Keeps all original columns.

    Scale shape: delegates to :func:`apply_group_cap`'s two-phase
    local-top-``quota``-then-merge — no per-group window, no hot-group
    straggler sort; the kept-key relation is at most ``quota`` keys
    per stratum, semi-joined back on (stratum, key) behind the r13
    counted gate (``kept_broadcast`` / ``kept_broadcast_rows`` pass
    straight through — broadcast under the bound, shuffled above).
    """
    idstr = F.col(id_col).cast("string")
    key = F.concat(
        F.md5(idstr.cast("binary")),
        F.lpad(F.length(idstr).cast("string"), 4, "0"),
        idstr,
    )
    keyed = df.withColumn("_skey", key)
    return apply_group_cap(
        keyed, group_col, "_skey", quota,
        kept_broadcast=kept_broadcast,
        kept_broadcast_rows=kept_broadcast_rows,
    ).drop("_skey")


def code_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_line: int = 1000,
    avg_line: int = 100,
) -> DataFrame:
    """StarCoder/SantaCoder-style code-corpus filters (Li et al. 2023
    'StarCoder' §3; the code analog of the Gopher prose battery):
    per doc, line-geometry and character-class screens —

    - ``ok_avg_line_len``: mean line length <= ``avg_line`` chars
      (minified/embedded-blob files fail), cross-multiplied
      (``total_chars <= avg_line * n_lines``) — no division;
    - ``ok_max_line_len``: longest line <= ``max_line`` chars;
    - ``ok_alnum_frac``: >= 25% alphanumeric characters
      (``4 * alnum_chars >= total_chars`` — binary-ish blobs fail);
    - ``ok_not_autogen``: no 'auto-generated' marker (case-folded);
    - ``pass_code_filters``: all of the above.

    ``total_chars`` sums LINE lengths (newlines excluded) so the avg
    and alnum screens agree on the denominator. All integer/boolean —
    bit-reproducible in any engine. One zero-exchange codegen
    projection: scan-speed at 100 TB, same plan class as
    :func:`gopher_quality_flags`.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(t, "\n")
    line_lens = F.expr(
        f"transform(split(coalesce({text_col}, ''), '\\n'), "
        "l -> length(l))"
    )
    n_lines = F.size(lines).cast("bigint")
    max_len = F.array_max(line_lens).cast("bigint")
    total_chars = F.expr(
        f"aggregate(transform(split(coalesce({text_col}, ''), '\\n'), "
        "l -> cast(length(l) as bigint)), 0L, (a, x) -> a + x)"
    )
    alnum = F.length(
        F.regexp_replace(t, "[^A-Za-z0-9]", "")
    ).cast("bigint")
    ok_avg = total_chars <= F.lit(int(avg_line)) * n_lines
    ok_max = max_len <= F.lit(int(max_line))
    ok_alnum = F.lit(4) * alnum >= total_chars
    ok_auto = ~F.contains(F.lower(t), F.lit("auto-generated"))
    return df.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        max_len.alias("max_line_len"),
        total_chars.alias("total_chars"),
        alnum.alias("alnum_chars"),
        ok_avg.alias("ok_avg_line_len"),
        ok_max.alias("ok_max_line_len"),
        ok_alnum.alias("ok_alnum_frac"),
        ok_auto.alias("ok_not_autogen"),
        (ok_avg & ok_max & ok_alnum & ok_auto).alias(
            "pass_code_filters"
        ),
    )


def epoch_schedule(
    docs: DataFrame,
    token_budget: int,
    group_col: str = "source",
    text_col: str = "text",
    scale: int = 1_000_000,
) -> DataFrame:
    """The pretraining data-mixing table (the "sampling prop. /
    epochs" table of the Llama-class papers): given a total training
    ``token_budget``, temperature-weight each slice's token mass
    (alpha = 0.5, the same floor(sqrt(mass * scale)) integer weight as
    :func:`lang_temperature_quota`) and report how many tokens the
    budget allocates to the slice and how many PASSES over the slice
    that implies —

    (group, n_tokens, weight, target_tokens,
     epochs_micro = target_tokens * 1e6 div n_tokens)

    epochs_micro > 1e6 means the slice repeats (up-sampled tail);
    < 1e6 means it is subsampled. All integers; products ride
    decimal(38,0) so budget x weight cannot wrap int64. Exactness
    bound: n_tokens * scale must stay below 2^52 (raise_error-guarded,
    the lang_temperature_quota contract) — at a larger corpus lower
    ``scale``.

    Scale shape: one partial+final token-count aggregate per slice
    (metadata-sized), a broadcast weight total, one projection.
    """
    from konohadataplatform_spark.operators.text import token_count

    if token_budget < 1:
        raise ValueError("token_budget must be >= 1")
    counts = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.sum(token_count(F.col(text_col))).alias("n_tokens")
    )
    # overflow-proof exactness guard (r11 ADVICE): compare n_tokens
    # against ((2^52 - 1) div scale) BEFORE forming the product — the
    # multiply-then-compare form wraps int64 for n_tokens > ~9.2e12
    # (plausible at 100 TB), passes the `< 2^52` check negative, and
    # turns raise_error into a silent NULL weight. The (2^52 - 1)
    # numerator keeps the accepted domain EXACTLY the old product
    # check's (n_tokens * scale < 2^52): for any scale,
    # n_tokens <= (2^52 - 1) div scale  <=>  n_tokens * scale < 2^52.
    max_tokens = ((1 << 52) - 1) // int(scale)
    weighted = counts.withColumn(
        "weight",
        F.floor(
            F.sqrt(
                F.expr(
                    f"if(n_tokens <= {max_tokens}L, "
                    f"n_tokens * {int(scale)}L, "
                    "raise_error('epoch_schedule: n_tokens * scale >= "
                    "2^52 — floor(sqrt) is no longer engine-exact; "
                    "lower scale'))"
                )
            )
        ).cast("bigint"),
    )
    tot = weighted.agg(F.sum("weight").alias("_tw"))
    dec = "decimal(38,0)"
    return weighted.crossJoin(F.broadcast(tot)).select(
        F.col("grp").alias(group_col),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "weight",
        F.expr(
            f"CAST(CAST({int(token_budget)} AS {dec}) * weight DIV _tw "
            "AS BIGINT)"
        ).alias("target_tokens"),
        F.when(
            F.col("n_tokens") > 0,
            F.expr(
                f"CAST(CAST(CAST({int(token_budget)} AS {dec}) * weight "
                f"DIV _tw AS {dec}) * 1000000 DIV n_tokens AS BIGINT)"
            ),
        )
        .otherwise(F.lit(0))
        .alias("epochs_micro"),
    )


# ---------------------------------------------------------------------------
# URL / domain front door (round 12 — RefinedWeb §3.1, C4 §2.2): the
# screens real crawl pipelines run BEFORE any text-level filter.
# Everything here is flag/screen logic over a URL string column —
# the fixture has no URL column, so the registered queries derive a
# deterministic synthetic URL both engines rebuild from shared
# literals (queries/llmdata.py _URL_RECIPE).
# ---------------------------------------------------------------------------

# host = authority of scheme://authority/..., stopping at /, ?, #, or
# the port colon. Spark regexp_extract and DuckDB regexp_extract both
# return '' on no match, so the screens degrade identically.
URL_HOST_RE = "^[a-z][a-z0-9+.-]*://([^/?#:]+)"
# registrable domain ~ last two dot-labels (the PSL-free approximation
# every bulk crawl screen uses first; a true public-suffix join is a
# broadcast lookup table away and composes on top)
URL_DOMAIN_RE = "([^.]+\\.[^.]+)$"

URL_BLOCKED_DOMAINS: tuple[str, ...] = (
    "badsite.example",
    "adfarm.example",
    "tracker.example",
)
URL_BLOCKED_PATTERNS: tuple[str, ...] = (
    "/ads/",
    "sessionid=",
    "utm_",
    "/tracker/",
)
URL_SOFT_WORDS: tuple[str, ...] = (
    "casino",
    "lottery",
    "warez",
)


def url_host(url: F.Column) -> F.Column:
    """Lower-cased authority of the URL ('' when unparseable). A
    trailing dot (RFC-valid FQDN spelling, 'badsite.example.') is
    stripped — otherwise both the equality/suffix blocklist checks
    AND the registrable-domain regex miss, turning the dot into a
    blocklist bypass (r12 review fix)."""
    return F.regexp_replace(
        F.regexp_extract(F.lower(url), URL_HOST_RE, 1), "\\.$", ""
    )


def url_domain(host: F.Column) -> F.Column:
    """Registrable-domain approximation: the host's last two
    dot-labels ('' for bare/dotless hosts)."""
    return F.regexp_extract(host, URL_DOMAIN_RE, 1)


def _url_flag_columns(
    url: F.Column,
    blocked_domains: tuple[str, ...],
    blocked_patterns: tuple[str, ...],
    soft_words: tuple[str, ...],
    max_url_len: int,
) -> dict[str, F.Column]:
    """The six URL screens as named expression columns — the single
    definition :func:`url_filters` and :func:`url_pass_column` both
    expand (so the batch battery and any inline/streaming gate can
    never drift)."""
    lower = F.lower(url)
    host = url_host(url)
    ok_domain = F.lit(True)
    for d in blocked_domains:
        ok_domain = ok_domain & ~(
            (host == F.lit(d)) | F.endswith(host, F.lit("." + d))
        )
    ok_pattern = F.lit(True)
    for p in blocked_patterns:
        ok_pattern = ok_pattern & ~F.contains(lower, F.lit(p))
    ok_soft = F.lit(True)
    for w in soft_words:
        ok_soft = ok_soft & ~F.contains(lower, F.lit(w))
    return {
        "ok_scheme": lower.rlike("^https?://"),
        "ok_len": F.length(url) <= F.lit(int(max_url_len)),
        "ok_host_shape": (
            (host != F.lit(""))
            & F.contains(host, F.lit("."))
            & ~host.rlike("^[0-9.]+$")
        ),
        "ok_domain": ok_domain,
        "ok_pattern": ok_pattern,
        "ok_soft": ok_soft,
    }


def url_pass_column(
    url: F.Column,
    blocked_domains: tuple[str, ...] = URL_BLOCKED_DOMAINS,
    blocked_patterns: tuple[str, ...] = URL_BLOCKED_PATTERNS,
    soft_words: tuple[str, ...] = URL_SOFT_WORDS,
    max_url_len: int = 2048,
) -> F.Column:
    """The full pass_url_filters verdict as ONE expression column —
    for inline screens and the streaming ingest front door
    (streaming/ingest.py), which must reject on the SAME verdict the
    batch battery computes (the margin_column bit-parity convention).
    Inline-blocklist form only; the table-blocklist path needs
    url_filters' join."""
    fl = _url_flag_columns(
        url, blocked_domains, blocked_patterns, soft_words, max_url_len
    )
    out = F.lit(True)
    for c in fl.values():
        out = out & c
    return out


def url_filters(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    blocked_domains: tuple[str, ...] = URL_BLOCKED_DOMAINS,
    blocked_patterns: tuple[str, ...] = URL_BLOCKED_PATTERNS,
    soft_words: tuple[str, ...] = URL_SOFT_WORDS,
    max_url_len: int = 2048,
    blocked_domains_df: DataFrame | None = None,
) -> DataFrame:
    """The URL-level filter battery (RefinedWeb §3.1 "URL filtering",
    C4 §2.2 front door) — the screens that run before a single byte
    of page text is inspected:

    - ``ok_scheme``: http(s) only (ftp/data/javascript schemes drop);
    - ``ok_len``: URL length <= ``max_url_len`` (crawler-trap guard);
    - ``ok_host_shape``: host parsed non-empty, contains a dot, and is
      not an IPv4 literal (RefinedWeb drops IP-only hosts);
    - ``ok_domain``: the host is not IN — and not a subdomain of —
      any blocklisted registrable domain;
    - ``ok_pattern``: the case-folded URL carries none of the blocked
      substrings (ad/tracking/session-id path fragments);
    - ``ok_soft``: none of the soft-word fragments (the RefinedWeb
      "soft" word list scored over the URL) appear;
    - ``pass_url_filters``: all of the above.

    Returns (doc_id, url, host, domain, ok_scheme, ok_len,
    ok_host_shape, ok_domain, ok_pattern, ok_soft, pass_url_filters).

    Scale shape: the entire battery is ONE codegen projection over the
    scan — two regexp_extracts plus substring screens, zero exchanges,
    zero UDFs (the c4_quality_flags plan class). The blocklists here
    are config-sized tuples inlined as literal conjuncts. For a
    PRODUCTION-sized blocklist (millions of domains), pass
    ``blocked_domains_df`` — a one-column ``domain`` relation of
    registrable domains — instead: ``ok_domain`` then comes from an
    EQUI left join on the extracted registrable domain (a subdomain of
    a blocked domain extracts to the same registrable domain, so the
    equality join covers the suffix rule without a theta join), and
    AQE broadcasts or shuffles the blocklist by its measured size.
    Semantics are identical for registrable-domain blocklists (the
    q_url_filters_table query shares the inline oracle).
    """
    url = F.coalesce(F.col(url_col), F.lit(""))
    host = url_host(url)
    domain = url_domain(host)
    fl = _url_flag_columns(
        url, blocked_domains, blocked_patterns, soft_words, max_url_len
    )
    ok_scheme = fl["ok_scheme"]
    ok_len = fl["ok_len"]
    ok_host_shape = fl["ok_host_shape"]
    ok_domain = (
        fl["ok_domain"]
        if blocked_domains_df is None
        else F.col("_blk_domain").isNull()
    )
    ok_pattern = fl["ok_pattern"]
    ok_soft = fl["ok_soft"]
    if blocked_domains_df is not None:
        blk = blocked_domains_df.select(
            F.col("domain").alias("_blk_domain")
        ).dropDuplicates(["_blk_domain"])
        docs = docs.withColumn("_dom", url_domain(url_host(url))).join(
            blk, F.col("_dom") == F.col("_blk_domain"), "left"
        )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        url.alias("url"),
        host.alias("host"),
        domain.alias("domain"),
        ok_scheme.alias("ok_scheme"),
        ok_len.alias("ok_len"),
        ok_host_shape.alias("ok_host_shape"),
        ok_domain.alias("ok_domain"),
        ok_pattern.alias("ok_pattern"),
        ok_soft.alias("ok_soft"),
        (
            ok_scheme & ok_len & ok_host_shape & ok_domain
            & ok_pattern & ok_soft
        ).alias("pass_url_filters"),
    )


def apply_domain_cap(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    cap: int = 1000,
    kept_broadcast: bool | None = None,
    kept_broadcast_rows: int = 500_000,
) -> DataFrame:
    """Per-domain document cap (the RefinedWeb/C4 "at most N pages per
    domain" rule), keyed on the registrable domain parsed from
    ``url_col``: keeps each domain's ``cap`` lowest ``id_col`` rows.

    Composes :func:`apply_group_cap` — the two-phase partition-local
    cap, so a head domain with 10^9 pages never funnels through one
    task — over a derived ``_domain`` column; all original columns
    come back, the derived column does not. The kept-key semi-join is
    cap x #domains rows — crawl-scale domain counts overflow a
    broadcast, so the gate kwargs pass through to
    :func:`apply_group_cap`'s counted gate.
    """
    with_dom = docs.withColumn(
        "_domain", url_domain(url_host(F.col(url_col)))
    )
    return apply_group_cap(
        with_dom, "_domain", id_col, cap,
        kept_broadcast=kept_broadcast,
        kept_broadcast_rows=kept_broadcast_rows,
    ).select(*docs.columns)


def url_dedup(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-level exact dedup (the crawl-side dedup that runs before
    any content hash): normalize the URL — strip the query string and
    fragment, strip one trailing slash — and keep the lowest
    ``id_col`` per normalized URL.

    Returns (doc_id, url_norm, kept). Case is NOT folded: hosts are
    already folded by parse convention upstream and paths are
    case-sensitive by RFC 3986.

    Scale shape: one projection + one partial+final min aggregate on
    ``url_norm`` + one join back keyed on the same column (AQE picks
    the strategy; the aggregate side is one row per distinct URL).
    """
    norm = F.regexp_replace(
        F.regexp_replace(F.coalesce(F.col(url_col), F.lit("")),
                         "[?#].*$", ""),
        "/$", "",
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), norm.alias("url_norm")
    )
    firsts = base.groupBy("url_norm").agg(
        F.min("doc_id").alias("_first_id")
    )
    return base.join(firsts, "url_norm").select(
        "doc_id",
        "url_norm",
        (F.col("doc_id") == F.col("_first_id")).alias("kept"),
    )


def domain_quality_screen(
    flagged: DataFrame,
    url_col: str = "url",
    pass_col: str = "pass_quality",
    id_col: str = "doc_id",
    min_docs: int = 3,
    min_pass_micro: int = 500_000,
) -> DataFrame:
    """Domain-level quality screen (RefinedWeb §3.1's per-domain
    statistics; the "drop whole spam domains" rule every crawl
    pipeline applies after per-doc scoring): aggregate any per-doc
    boolean quality verdict by registrable domain and flag domains
    whose pass rate falls below ``min_pass_micro`` (integer-scaled,
    1e6 = 100%) once they have at least ``min_docs`` documents —
    below that the rate is noise and the domain passes by default
    (the low-evidence convention).

    Input: (id_col, url_col, pass_col) — pass_col from any shipped
    battery (Gopher, C4, StarCoder, the classifier margin gate).
    Returns one row per domain:
    (domain, n_docs, n_pass, pass_rate_micro, domain_ok).

    Scale shape: one projection (host/domain extraction) + ONE
    partial+final conditional aggregate keyed on domain — the output
    is domain-cardinality (metadata vs the corpus). Filtering a
    corpus by the verdict is a left-semi join of the doc relation
    against the ``domain_ok`` rows — domain keys, AQE-sized.
    """
    base = flagged.select(
        url_domain(url_host(F.col(url_col))).alias("domain"),
        F.col(pass_col).cast("boolean").alias("_p"),
    )
    agg = base.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("_p"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass"),
    )
    return agg.select(
        "domain",
        "n_docs",
        "n_pass",
        F.expr("n_pass * 1000000 DIV n_docs").cast("bigint").alias(
            "pass_rate_micro"
        ),
        (
            (F.col("n_docs") < F.lit(int(min_docs)))
            | (
                F.expr("n_pass * 1000000 DIV n_docs")
                >= F.lit(int(min_pass_micro))
            )
        ).alias("domain_ok"),
    )
