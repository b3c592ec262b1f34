"""Streaming document-ingest curation: the training-data pipeline as a
Structured Streaming job.

The batch flagship (``q_curation_pipeline``) curates a STATIC corpus;
this is the other half a production corpus needs — documents arriving
continuously (crawl drops, vendor feeds), each micro-batch gated and
deduplicated against EVERYTHING accepted so far, state persisted in
catalog tables rather than executor memory (the same no-unbounded-state
posture as the CDC engine in ``streaming/cdc.py``).

Per micro-batch, in order:

1. **quality gate** — ``operators.text.quality_score`` threshold
   (zero-shuffle codegen expressions), optionally followed by a
   **trained-classifier gate**: pass ``classifier_weights`` (the dict
   ``operators.classifier.train_perceptron`` returns from a batch
   training run) and each doc's perceptron margin is computed by the
   SAME ``margin_column`` expression the batch scorer expands —
   train-in-batch, score-in-stream, bit-identical margins, still zero
   exchanges per batch.
2. **exact dedup** — in-batch keep-lowest-id per md5 digest, then a
   TWO-PHASE BROADCAST probe of the persisted digest table: the
   batch's digests broadcast into an inner join against the corpus
   digest scan (corpus side never shuffles), and only the handful of
   matches broadcast back onto the batch. The corpus' text is never
   re-read.
3. **near-dup gate** — ``operators.dedup.prebucketed_candidates``
   against the persisted PRE-EXPLODED (bkey, sid) bucket store:
   banding was materialized once at append time, so per batch the
   corpus side is one columnar scan of two long columns probed by a
   broadcast of the batch's bucket keys — no corpus explode, no
   corpus Exchange. Verification is exact Jaccard over just the
   colliding sids (sid-pruned read of the (sid, shingles) index, not
   a full-index join). The scan is the only corpus-sized term; all
   shuffles are sized by |batch| + collisions.
3b. **eval-set decontamination** (once ``register_benchmark()`` has
   persisted a benchmark index) — the near-dup survivors' band bucket
   keys broadcast-probe ``{name}__benchbuckets``, collisions verify by
   exact Jaccard against ``{name}__benchidx`` at
   ``contamination_threshold``, matches quarantine as "contaminated".
   Per batch the benchmark side is one scan of two long columns — the
   same no-shuffle contract as the corpus near-dup gate.
4. **commits** — accepted docs upsert into the corpus (MOR, keyed);
   digests, index entries, and bucket rows are INSERT-ONLY state and
   land via ``catalog.append_rows`` — O(|batch|) writes that keep
   reads flat scans (an upsert layer per micro-batch would make every
   read fold #batches anti-joins). Rejected docs land in
   ``{name}__rejects`` with a reason (the DLQ analog: inspectable,
   and re-ingestable after a threshold change).

State tables: ``{name}`` (accepted corpus), ``{name}__digests``
(text_hash -> doc_id, append-only), ``{name}__dedupidx``
(sid, shingles, sig, append-only), ``{name}__dedupbuckets``
(bkey, sid, append-only, pre-exploded), ``{name}__rejects``
(doc_id, reason). Batch-id high-water marking makes checkpoint replay
idempotent (same contract as ``apply_cdc_batch``); a crash between
the appends and the batch marker can re-append rows on replay, which
every reader here tolerates (digest owner = min(doc_id) per digest,
candidate pairs are distinct'd, index rows are only read sid-pruned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from konohadataplatform_spark.catalog import SnapshotCatalog
from konohadataplatform_spark.operators import dedup as D
from konohadataplatform_spark.operators import text as TX
from konohadataplatform_spark.streaming.cdc import (
    _mark_applied_batch,
    last_applied_batch,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

# the url_screen=True stream contract: DOC_SCHEMA plus the url column
# the front-door gate screens on
DOC_SCHEMA_URL = T.StructType(
    DOC_SCHEMA.fields + [T.StructField("url", T.StringType(), True)]
)


class DocIngestPipeline:
    """Curated streaming ingest into a catalog-backed corpus."""

    # colliding-corpus-sid sets up to this size are collected and
    # pushed down as an IN filter (row-group pruning on the index
    # scan); larger sets fall back to a broadcast semi-join
    SID_COLLECT_CAP = 100_000

    def __init__(
        self,
        spark: SparkSession,
        catalog: SnapshotCatalog,
        name: str,
        quality_min: float = 0.6,
        jaccard_threshold: float = 0.8,
        ngram: int = 3,
        num_perm: int = 64,
        bands: int = 16,
        maintain_every: int = 32,
        max_bucket: int | None = 4096,
        classifier_weights: dict[int, int] | None = None,
        classifier_dims: int = 64,
        classifier_ngram: int = 2,
        margin_min: int = 0,
        contamination_threshold: float = 0.8,
        url_screen: bool = False,
    ):
        self.spark = spark
        self.catalog = catalog
        self.name = name
        self.quality_min = quality_min
        # optional trained gate: weights from a batch
        # train_perceptron run; docs with margin <= margin_min are
        # quarantined as low_margin. The margin is the one
        # margin_column expression batch scoring expands
        # (batch/stream bit-parity), a codegen'd aggregate over the
        # doc's own tokens — zero exchanges, O(|batch|) like the
        # heuristic gate. dims/ngram MUST match the training run.
        self.classifier_weights = classifier_weights
        # URL front door (r12): when True, incoming docs MUST carry a
        # `url` column and each batch is screened by the SAME
        # pass_url_filters verdict the batch battery computes
        # (operators.curation.url_pass_column — one codegen
        # expression, zero exchanges); failures quarantine as
        # "blocked_url" BEFORE any text is inspected, the RefinedWeb
        # §3.1 ordering. The URL rides into the accepted corpus.
        self.url_screen = url_screen
        self.classifier_dims = classifier_dims
        self.classifier_ngram = classifier_ngram
        self.margin_min = margin_min
        # eval-set decontamination at ingest: active once
        # register_benchmark() has persisted a benchmark index — batch
        # docs whose exact Jaccard with a benchmark doc reaches this
        # threshold quarantine as "contaminated"
        self.contamination_threshold = contamination_threshold
        self.jaccard_threshold = jaccard_threshold
        self.ngram = ngram
        self.num_perm = num_perm
        self.bands = bands
        # skew guard on the persisted bucket store: a boilerplate
        # bucket accreting corpus sids forever would otherwise emit
        # bucket-size candidate pairs per colliding batch doc, every
        # batch. Dropped-bucket docs still pair via their other
        # bands - 1 buckets; None disables (exact uncapped recall).
        self.max_bucket = max_bucket
        # every commit is a merge-on-read layer: maintain() bounds the
        # read-side fold depth (threshold-gated — the check itself is
        # metadata-only, compaction only runs when layers/files pile
        # up). 0 disables.
        self.maintain_every = maintain_every

    # -- table names --------------------------------------------------------
    @property
    def digests_table(self) -> str:
        return f"{self.name}__digests"

    @property
    def index_table(self) -> str:
        return f"{self.name}__dedupidx"

    @property
    def buckets_table(self) -> str:
        return f"{self.name}__dedupbuckets"

    @property
    def rejects_table(self) -> str:
        return f"{self.name}__rejects"

    @property
    def benchidx_table(self) -> str:
        return f"{self.name}__benchidx"

    @property
    def benchbuckets_table(self) -> str:
        return f"{self.name}__benchbuckets"

    # -- eval-set decontamination state -------------------------------------
    def register_benchmark(self, bench: DataFrame) -> None:
        """Persist the benchmark's dedup index so every future batch
        is decontaminated against it: ``{name}__benchidx``
        (sid, shingles — sids offset into the disjoint 2^40 space) and
        ``{name}__benchbuckets`` (bkey, sid, pre-exploded). Overwrite
        semantics — re-register to swap benchmarks. The benchmark is
        indexed ONCE here; per batch it costs one broadcast of its
        bucket keys (a 100k-doc eval suite x 16 bands ~ 25 MB) and a
        collision-sized verify — the same no-corpus-shuffle contract
        as the near-dup gate."""
        bench = bench.select(
            F.expr(
                f"if(doc_id >= 0 and doc_id < {D.BENCH_SID_OFFSET}, doc_id, "
                "raise_error(concat('register_benchmark: doc_id ', "
                "cast(doc_id as string), ' outside [0, 2^40)')))"
            ).alias("doc_id"),
            "text",
        )
        idx = D.minhash_index(
            bench, "text", "doc_id", self.ngram, self.num_perm
        ).select(
            (F.col("sid") + F.lit(D.BENCH_SID_OFFSET)).alias("sid"),
            "shingles",
            "sig",
        )
        self.catalog.write(
            self.benchidx_table, idx.select("sid", "shingles")
        )
        self.catalog.write(
            self.benchbuckets_table,
            D.band_bucket_keys(idx, self.bands, self.num_perm),
        )

    # -- the batch curation pass -------------------------------------------
    def apply_batch(self, docs: DataFrame, batch_id: int | None = None) -> None:
        """Gate + dedup one micro-batch and commit the survivors.

        Every commit is O(|batch|) (one MOR upsert for the corpus,
        append-only part files for digest/index/bucket state). The
        only corpus-sized work per batch is two columnar SCANS (the
        digest table's 16-byte keys, the bucket store's two longs) —
        both probed via broadcast, so no corpus row ever shuffles or
        explodes, and document text never leaves the batch.
        """
        if batch_id is not None:
            last = last_applied_batch(self.catalog, self.name)
            if last is not None and batch_id <= last:
                return
        cols = [
            F.col("doc_id"), F.col("text"), F.col("lang"),
            F.col("source"),
            F.coalesce(
                F.col("n_chars"), F.length("text"), F.lit(0)
            ).alias("n_chars"),
        ]
        if self.url_screen:
            cols.append(F.col("url"))
        docs = cached = docs.select(*cols).cache()
        firsts = new_index = accepted = drop_ids = cands = None
        contaminated = None
        try:
            rejects = []

            # 0. URL front door (optional): the crawl-side screen runs
            # before any text-level gate — one expression column, the
            # same verdict as the batch url_filters battery
            if self.url_screen:
                from konohadataplatform_spark.operators.curation import (
                    url_pass_column,
                )

                gated = docs.withColumn(
                    "_u_ok",
                    url_pass_column(F.coalesce(F.col("url"), F.lit(""))),
                )
                rejects.append(
                    gated.filter(~F.col("_u_ok")).select(
                        "doc_id", F.lit("blocked_url").alias("reason")
                    )
                )
                docs = gated.filter(F.col("_u_ok")).drop("_u_ok")

            # 1. quality gate (codegen expressions, zero shuffle).
            # NULL-safe: empty/whitespace text yields a NULL score
            # (0-token division) — that's low quality, never a row that
            # silently vanishes from both the corpus and the DLQ.
            scored = docs.withColumn(
                "_q",
                F.coalesce(
                    TX.quality_score(F.col("text"), F.col("n_chars")),
                    F.lit(0.0),
                ),
            )
            rejects.append(
                scored.filter(
                    F.col("text").isNull() | (F.col("_q") < self.quality_min)
                ).select("doc_id", F.lit("low_quality").alias("reason"))
            )
            ok = scored.filter(
                F.col("text").isNotNull() & (F.col("_q") >= self.quality_min)
            ).drop("_q")

            # 1b. trained-classifier gate (optional): the batch-trained
            # perceptron margin via the shared margin_column expression
            # — same codegen'd aggregate the batch scorer runs, so a
            # doc scores identically whether it arrives in batch or
            # stream. Zero exchanges (per-row expression).
            if self.classifier_weights is not None:
                from konohadataplatform_spark.operators.classifier import (
                    margin_column,
                )

                margined = ok.withColumn(
                    "_w", F.split(F.trim(F.col("text")), " ")
                ).withColumn(
                    "_m",
                    margin_column(
                        self.classifier_weights,
                        self.classifier_dims,
                        self.classifier_ngram,
                    ),
                )
                rejects.append(
                    margined.filter(F.col("_m") <= self.margin_min)
                    .select("doc_id", F.lit("low_margin").alias("reason"))
                )
                ok = margined.filter(
                    F.col("_m") > self.margin_min
                ).drop("_w", "_m")

            # 2a. in-batch exact dedup: keep-lowest-id per digest
            # (TX.fingerprint is the one canonical digest definition —
            # batch-curated corpora must stay digest-compatible)
            hashed = ok.withColumn(
                "text_hash", TX.fingerprint(F.col("text"))
            )
            w = Window.partitionBy("text_hash").orderBy("doc_id")
            hashed = hashed.withColumn("_rn", F.row_number().over(w))
            rejects.append(
                hashed.filter(F.col("_rn") > 1)
                .select("doc_id", F.lit("exact_duplicate").alias("reason"))
            )
            firsts = hashed.filter(F.col("_rn") == 1).drop("_rn")

            # 2b. exact dedup vs the persisted digest set, two-phase
            # broadcast (the big-probe pattern): (i) the batch's
            # digests broadcast into an inner join against the corpus
            # digest SCAN — the corpus side never shuffles; (ii) the
            # (tiny) match set broadcasts back onto the batch as a
            # left join. min(doc_id) collapses replay-duplicated
            # append rows to the one true owner. A digest whose
            # recorded owner IS this doc_id is not a duplicate — it is
            # this record's own earlier commit (crash between the
            # commits and the batch marker -> checkpoint redelivery);
            # without the owner check, replay would file every
            # already-accepted doc into the DLQ as its own duplicate.
            if self.catalog.exists(self.digests_table):
                matches = (
                    self.catalog.read(self.digests_table)
                    .join(
                        F.broadcast(firsts.select("text_hash").distinct()),
                        "text_hash",
                    )
                    .groupBy("text_hash")
                    .agg(F.min("doc_id").alias("_owner"))
                )
                joined = firsts.join(F.broadcast(matches), "text_hash",
                                     "left_outer")
                rejects.append(
                    joined.filter(
                        F.col("_owner").isNotNull()
                        & (F.col("_owner") != F.col("doc_id"))
                    ).select("doc_id", F.lit("exact_duplicate").alias("reason"))
                )
                firsts = joined.filter(
                    F.col("_owner").isNull()
                    | (F.col("_owner") == F.col("doc_id"))
                ).drop("_owner")
            firsts = firsts.cache()

            # 3. near-dup vs the persisted PRE-EXPLODED bucket store
            # (+ in-batch): corpus side = scan + broadcast probe, no
            # explode, no Exchange (r6's scale-killer was re-banding
            # the whole corpus index here every micro-batch)
            new_index = D.minhash_index(
                firsts, "text", "doc_id", self.ngram, self.num_perm
            ).cache()
            if self.catalog.exists(self.buckets_table):
                corpus_buckets = self.catalog.read(self.buckets_table)
            else:
                corpus_buckets = self.spark.createDataFrame(
                    [], "sid long, bkey long"
                )
            cands = D.prebucketed_candidates(
                corpus_buckets,
                new_index,
                bands=self.bands,
                num_perm=self.num_perm,
                max_bucket=self.max_bucket,
            ).cache()
            # Exact-Jaccard verification needs shingle sets for exactly
            # the COLLIDING sids. Batch sids come from the in-memory
            # new_index; corpus sids are read sid-pruned from the index
            # table — an IN-list pushdown when the collision set is
            # small enough to collect (row-group stats prune the scan),
            # a broadcast semi-join past the cap. Either way the index
            # is never joined wholesale.
            pair_sids = (
                cands.select(F.col("a_id").alias("sid"))
                .unionByName(cands.select(F.col("b_id").alias("sid")))
                .distinct()
            )
            corpus_sids = pair_sids.join(
                new_index.select("sid"), "sid", "left_anti"
            )
            ids = [
                r.sid
                for r in corpus_sids.limit(self.SID_COLLECT_CAP + 1).collect()
            ]
            sets = new_index.select("sid", "shingles")
            if ids and self.catalog.exists(self.index_table):
                idx = self.catalog.read(self.index_table)
                if len(ids) <= self.SID_COLLECT_CAP:
                    pruned = idx.filter(F.col("sid").isin(ids))
                else:
                    pruned = idx.join(F.broadcast(corpus_sids), "sid")
                # dropDuplicates: replay-duplicated append rows must
                # not multiply verified pairs
                sets = sets.unionByName(
                    pruned.select("sid", "shingles").dropDuplicates(["sid"])
                )
            pairs = D.verify_jaccard(cands, sets, self.jaccard_threshold)
            new_ids = firsts.select(F.col("doc_id").alias("_nid"))
            flagged = (
                pairs.join(
                    new_ids.withColumnRenamed("_nid", "a_id")
                    .withColumn("_a_new", F.lit(True)),
                    "a_id", "left_outer",
                )
                .join(
                    new_ids.withColumnRenamed("_nid", "b_id")
                    .withColumn("_b_new", F.lit(True)),
                    "b_id", "left_outer",
                )
            )
            # both sides new -> arrival (lowest id) wins; one side in
            # the corpus -> the corpus doc arrived first, drop the new
            drop_ids = flagged.select(
                F.when(
                    F.col("_a_new").isNotNull() & F.col("_b_new").isNotNull(),
                    F.greatest("a_id", "b_id"),
                )
                .when(F.col("_b_new").isNotNull(), F.col("b_id"))
                .otherwise(F.col("a_id"))
                .alias("doc_id")
            ).distinct().cache()
            rejects.append(
                drop_ids.select(
                    "doc_id", F.lit("near_duplicate").alias("reason")
                )
            )
            survivors = firsts.join(drop_ids, "doc_id", "left_anti")

            # 3b. eval-set decontamination (active once
            # register_benchmark() persisted the benchmark index): the
            # near-dup SURVIVORS' band bucket keys broadcast-probe the
            # benchmark bucket store (same no-benchmark-shuffle contract
            # as the corpus near-dup gate), colliding pairs verify by
            # exact Jaccard against the benchidx shingle sets at
            # contamination_threshold, and matches quarantine as
            # "contaminated". Benchmark sids live in the disjoint
            # >= 2^40 space, so pairs with b_id below the offset are
            # in-batch artifacts and are excluded.
            if self.catalog.exists(self.benchbuckets_table):
                surv_index = new_index.join(
                    survivors.select(F.col("doc_id").alias("sid")),
                    "sid",
                    "left_semi",
                ).withColumn(
                    # the >= 2^40 pair filter below assumes batch sids
                    # stay in the corpus id space — fail loudly if not
                    "sid",
                    F.expr(
                        f"if(sid >= 0 and sid < {D.BENCH_SID_OFFSET}, sid, "
                        "raise_error(concat('apply_batch: doc_id ', "
                        "cast(sid as string), ' collides with the "
                        "benchmark sid space')))"
                    ),
                )
                bcands = D.prebucketed_candidates(
                    self.catalog.read(self.benchbuckets_table),
                    surv_index,
                    bands=self.bands,
                    num_perm=self.num_perm,
                    max_bucket=self.max_bucket,
                ).filter(F.col("b_id") >= D.BENCH_SID_OFFSET)
                bench_sids = bcands.select(
                    F.col("b_id").alias("sid")
                ).distinct()
                bsets = surv_index.select("sid", "shingles").unionByName(
                    self.catalog.read(self.benchidx_table)
                    .join(F.broadcast(bench_sids), "sid", "left_semi")
                    .select("sid", "shingles")
                )
                contaminated = (
                    D.verify_jaccard(
                        bcands, bsets, self.contamination_threshold
                    )
                    .select(F.col("a_id").alias("doc_id"))
                    .distinct()
                    .cache()
                )
                rejects.append(
                    contaminated.select(
                        "doc_id", F.lit("contaminated").alias("reason")
                    )
                )
                survivors = survivors.join(
                    contaminated, "doc_id", "left_anti"
                )
            accepted = survivors.cache()

            # 4. O(|batch|) commits: corpus, digests, index, rejects
            corpus_cols = ["doc_id", "text", "lang", "source", "n_chars"]
            if self.url_screen:
                corpus_cols.append("url")
            self.catalog.upsert_by_keys(
                self.name,
                accepted.select(*corpus_cols),
                ["doc_id"],
            )
            self.catalog.append_rows(
                self.digests_table,
                accepted.select("text_hash", "doc_id"),
            )
            # index + bucket entries for EVERY doc that reached the
            # near-dup stage — including the near-dup-rejected ones.
            # In-batch, a dropped doc still drops later docs (the
            # keep-lowest-id chain); storing only accepted entries
            # would make the outcome depend on micro-batch boundaries
            # (doc C near B but not A: batch [B,C] drops C, batches
            # [B],[C] would keep C). Same rationale as
            # build_semantic_index storing dropped vectors. Appends,
            # not upserts: insert-only state must not pay a per-batch
            # MOR layer that every later read folds.
            self.catalog.append_rows(self.index_table, new_index)
            self.catalog.append_rows(
                self.buckets_table,
                D.band_bucket_keys(new_index, self.bands, self.num_perm),
            )
            all_rejects = rejects[0]
            for r in rejects[1:]:
                all_rejects = all_rejects.unionByName(r)
            if not all_rejects.isEmpty():
                # the FULL doc rides along (CDC-DLQ convention: the
                # quarantine table is self-contained) so replay_rejects
                # can re-run the gates without the original source
                self.catalog.upsert_by_keys(
                    self.rejects_table,
                    # join the PRE-screen cache: URL-blocked docs are
                    # no longer in `docs` but must still quarantine
                    # with their full row
                    all_rejects.join(cached, "doc_id"),
                    ["doc_id"],
                )
            if batch_id is not None:
                _mark_applied_batch(self.catalog, self.name, batch_id)
                if self.maintain_every and batch_id % self.maintain_every == 0:
                    for t in (self.name, self.digests_table,
                              self.index_table, self.buckets_table,
                              self.rejects_table):
                        try:
                            if self.catalog.exists(t):
                                self.catalog.maintain(t)
                        except Exception:
                            # best-effort chore: the batch is already
                            # committed + marked — a transient
                            # compaction failure must not abort the
                            # stream (it retries at the next interval,
                            # and maintain() is threshold-gated anyway)
                            continue
        finally:
            # release per-batch caches even when a commit fails — a
            # stream retrying failed batches must not accumulate cached
            # frames (same hygiene as apply_cdc_batch)
            for frame in (firsts, new_index, accepted, drop_ids, cands,
                          contaminated):
                if frame is not None:
                    frame.unpersist()
            cached.unpersist()

    # -- reject lifecycle ----------------------------------------------------
    def replay_rejects(self) -> int:
        """Re-run every quarantined doc through the CURRENT gates and
        drain the ones that now pass — the dead-letter lifecycle
        (mirror of ``CdcPipeline.replay_dlq``): loosen ``quality_min``,
        ``jaccard_threshold``, or ``margin_min`` (or retrain and swap
        ``classifier_weights``), replay, and only still-rejected docs
        remain. Returns the number of docs accepted into the corpus.

        Self-contained: the rejects table stores the full doc row, so
        no original source is needed. Re-rejected docs stay quarantined
        with their (possibly updated) reason; a doc whose digest was
        meanwhile accepted from another arrival drains as
        ``exact_duplicate`` — resolved, not pending. Near-dup-rejected
        docs already hold index entries; their own ``sid`` is excluded
        from candidate pairs, so replay re-scores them against the rest
        of the corpus only.
        """
        if not self.catalog.exists(self.rejects_table):
            return 0
        replay_cols = ["doc_id", "text", "lang", "source", "n_chars"]
        if self.url_screen:
            # url-screened pipelines store the url with every reject
            # (apply_batch joins the pre-screen cache) — replay must
            # carry it back through the front door
            replay_cols.append("url")
        quarantined = self.catalog.read(self.rejects_table).select(
            *replay_cols
        )
        if quarantined.isEmpty():
            return 0
        before = self.catalog.read(self.name).count() if (
            self.catalog.exists(self.name)
        ) else 0
        self.apply_batch(quarantined)  # no batch_id: replays re-gate
        accepted = (
            self.catalog.read(self.rejects_table)
            .select("doc_id")
            .join(self.catalog.read(self.name).select("doc_id"),
                  "doc_id", "left_semi")
        )
        n = accepted.count()
        if n:
            self.catalog.delete_by_keys(
                self.rejects_table, accepted, ["doc_id"]
            )
        after = self.catalog.read(self.name).count()
        return after - before

    # -- streaming entry point ---------------------------------------------
    def start_stream(self, src_dir: str, checkpoint_dir: str):
        """Tail a directory of JSON document files (one object per
        line, DOC_SCHEMA) and curate each micro-batch. availableNow
        semantics: drain what exists, then stop — rerun to pick up new
        files (the same harness pattern as CdcPipeline.start_stream)."""
        stream = (
            self.spark.readStream.schema(
                DOC_SCHEMA_URL if self.url_screen else DOC_SCHEMA
            )
            .json(src_dir)
        )
        return (
            stream.writeStream.foreachBatch(
                lambda batch, bid: self.apply_batch(batch, batch_id=bid)
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
