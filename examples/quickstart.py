"""End-to-end tour of the engine. Run: python examples/quickstart.py

Walks the full capability surface on the sf0.001 testdata:
SQL entry point -> model pipeline -> time travel -> CDC apply ->
dedup/similarity/text operators -> data-quality checks.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from konohadataplatform_spark import Engine, get_spark
from konohadataplatform_spark.catalog import SnapshotCatalog
from konohadataplatform_spark.operators import dedup, similarity, text
from konohadataplatform_spark.plans.models import register_reference_models
from konohadataplatform_spark.plans.pipeline import Pipeline, PipelineOps
from konohadataplatform_spark.plans.quality import ModelChecks, run_checks
from konohadataplatform_spark.sources.star_schema import load_table

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="quickstart")
    engine = Engine(spark)

    # --- 1. ad-hoc SQL over the star schema (the Kyuubi surface) ------
    engine.register_star_schema(SF_DIR)
    print("== Top segments by revenue ==")
    engine.sql(
        """
        SELECT c_mktsegment,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment ORDER BY revenue DESC
        """
    ).show(5)

    # --- 2. model pipeline (the dbt DAG analog) -----------------------
    warehouse = tempfile.mkdtemp(prefix="kdp_wh_")
    catalog = SnapshotCatalog(spark, warehouse)
    pipe = Pipeline(spark, catalog)
    register_reference_models(pipe)
    print("== Pipeline run ==", pipe.run())
    catalog.read("user_order_summary").orderBy("revenue_rank").show(3)

    # --- 3. time travel -----------------------------------------------
    pipe.run(select=["daily_order_metrics"])  # incremental merge
    print(
        "daily_order_metrics versions:",
        [s.version for s in catalog.history("daily_order_metrics")],
    )

    # --- 4. data quality (the dbt-test analog) ------------------------
    results = run_checks(
        pipe,
        [ModelChecks(model="stg_orders", not_null_cols=["order_id"], unique_cols=["order_id"])],
    )
    print("quality:", [(r.check, r.violations) for r in results])

    # --- 5. LLM-data operators ----------------------------------------
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    pairs = dedup.minhash_dedup(docs, threshold=0.8)
    print("near-dup pairs (MinHash+LSH, verified):", pairs.count())
    knn = similarity.cosine_topk(emb, emb.filter(F.col("vec_id") < 2), k=3)
    print("== kNN ==")
    knn.show()
    feats = docs.select(
        "doc_id",
        text.token_count(F.col("text")).alias("tokens"),
        text.predict_lang(F.col("text")).alias("pred_lang"),
    )
    feats.show(3)

    # --- 6. lakehouse round 2: WAP, MOR upserts, rollback -------------
    from pyspark.sql import Row

    catalog.write("accounts", spark.createDataFrame(
        [Row(id=1, tier="bronze"), Row(id=2, tier="silver")]))
    # write-audit-publish: stage -> audit -> publish (bad data never visible)
    staged = catalog.stage("accounts", spark.createDataFrame(
        [Row(id=1, tier="bronze"), Row(id=2, tier="gold"), Row(id=3, tier="silver")]))
    assert catalog.read_staged(staged).filter(F.col("tier").isNull()).count() == 0
    catalog.publish("accounts", staged)
    # merge-on-read upsert: O(batch) commit, latest-wins fold at read
    catalog.upsert_by_keys("accounts", spark.createDataFrame(
        [Row(id=3, tier="gold")]), ["id"])
    print("accounts after MOR upsert:",
          sorted((r.id, r.tier) for r in catalog.read("accounts").collect()))
    # compact folds layers; rollback restores v1 as a new commit
    catalog.compact("accounts", target_files=1)
    catalog.rollback("accounts", 1)
    print("accounts after rollback:",
          sorted((r.id, r.tier) for r in catalog.read("accounts").collect()))
    print("diff v1->v2:",
          catalog.diff("accounts", 1, 2).count(), "changed rows")

    # --- 7. round 4: SQL DML surface + schema evolution + IVF index ---
    engine.catalog = catalog  # attach the lakehouse to the SQL surface
    engine.sql("CREATE OR REPLACE TABLE tiers AS SELECT 'gold' AS tier, 2 AS rank_")
    engine.sql("INSERT INTO tiers VALUES ('silver', 1)")
    engine.sql("""
        MERGE INTO accounts t
        USING (SELECT 2 AS id, 'platinum' AS tier) s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET tier = s.tier
        WHEN NOT MATCHED THEN INSERT *
    """)
    print("accounts after SQL MERGE:",
          sorted((r.id, r.tier) for r in engine.table("accounts").collect()))
    print("time travel via SQL:",
          engine.sql("SELECT count(*) AS n FROM accounts FOR VERSION AS OF 1")
          .collect()[0].n, "rows at v1")
    engine.sql("ALTER TABLE accounts RENAME COLUMN tier TO level")
    print("after rename (metadata-only):", engine.table("accounts").columns)

    from konohadataplatform_spark.operators import similarity as sim

    emb = engine.table("embeddings")
    sim.build_ivf_index(catalog, "vecidx", emb, n_cells=8)
    hits = sim.ivf_index_search(
        catalog, "vecidx", emb.limit(2), k=3, nprobe=2)
    print("IVF index probe:", hits.count(), "neighbors for 2 queries")

    # --- 8. round 5: curation operators + native JPEG -----------------
    from konohadataplatform_spark.operators import jpeg_py

    docs = engine.table("documents")
    flagged = dedup.ngram_decontaminate(
        docs, eval_pred=F.col("doc_id") % 17 == 0, n=5)
    print("decontamination: flagged", flagged.count(), "training docs")
    rep = text.repetition_stats(docs)
    print("most repetitive doc:",
          rep.orderBy(F.desc("dup_word_frac")).first().doc_id)
    jpg = jpeg_py.encode_jpeg(8, 8, bytes(range(8 * 8 * 3)))
    print("JPEG roundtrip lossless:",
          jpeg_py.decode_jpeg(jpg)["pixels"] == bytes(range(8 * 8 * 3)))

    # --- 9. round 5: branches, manifest pruning, OPTIMIZE ZORDER ------
    catalog.write(
        "metrics9",
        spark.range(0, 5000).withColumn("g", F.col("id") % 7),
    )
    engine.sql("CALL system.create_branch('metrics9', 'dev')")
    catalog.merge(
        "metrics9@dev",
        spark.createDataFrame([(99999, 0)], "id long, g long"),
        ["id"],
    )
    engine.sql("CALL system.fast_forward('metrics9', 'dev')")
    print("after branch fast-forward:", catalog.count("metrics9"), "rows")
    engine.sql("OPTIMIZE metrics9 ZORDER BY (id)")
    _snap, kept, total = catalog.scan_files("metrics9", [("id", ">=", 4500)])
    print(f"manifest pruning reads {len(kept)}/{total} files for id>=4500")
    engine.register("metrics9", catalog.read("metrics9"))
    top = engine.sql(
        "SELECT id, g FROM metrics9 "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY id DESC) <= 2"
    )
    print("QUALIFY top-2 ids:", sorted(r.id for r in top.collect()))

    # --- 10. round 5: CDC DLQ + auto-evolve, bloom filters, TIFF ------
    import json as _json

    from pyspark.sql import Row, types as T
    from konohadataplatform_spark.streaming.cdc import ENVELOPE_SCHEMA, CdcPipeline

    cust_schema = T.StructType(
        [
            T.StructField("customer_id", T.StringType(), False),
            T.StructField("company_name", T.StringType(), True),
        ]
    )
    pipe = CdcPipeline(
        spark, catalog, {"cust10": (cust_schema, ["customer_id"])},
        dlq_table="cdc_dlq10", evolve_schema=True,
    )
    pipe.apply_envelopes(
        spark.createDataFrame(
            [
                Row(op="c", before=None,
                    after=_json.dumps({"customer_id": "A", "company_name": "co"}),
                    ts_ms=1, lsn=1, table="cust10"),
                Row(op="c", before=None, after='{"broken', ts_ms=2, lsn=2,
                    table="cust10"),  # -> dead-letter queue
                Row(op="c", before=None,
                    after=_json.dumps({"customer_id": "B", "company_name": "b",
                                       "country": "DE"}),  # new upstream column
                    ts_ms=3, lsn=3, table="cust10"),
            ],
            ENVELOPE_SCHEMA,
        ),
        batch_id=1,
    )
    print("CDC with DLQ:", catalog.read("cust10").columns,
          "| quarantined:", [r._error for r in catalog.read("cdc_dlq10").collect()])

    engine.sql(
        "ALTER TABLE metrics9 SET TBLPROPERTIES ("
        "'write.parquet.bloom-filter-enabled.column.id'='true', "
        "'write.parquet.bloom-filter-expected-ndv.column.id'='5000')"
    )
    catalog.compact("metrics9", target_files=2)  # rewrite picks up blooms
    print("bloom props:",
          {r.key: r.value for r in engine.sql("SHOW TBLPROPERTIES metrics9").collect()})

    from konohadataplatform_spark.operators import multimodal as M

    tiff = M.encode_tiff(8, 4, bytes(range(96)), big_endian=True)
    print("TIFF (MM) roundtrip lossless:",
          M.decode_image(tiff)["pixels"] == bytes(range(96)))

    # --- 11. metadata tables, change feed, ANALYZE --------------------
    print("metrics9$snapshots:",
          engine.sql("SELECT version, operation FROM metrics9$snapshots "
                     "ORDER BY version DESC LIMIT 2").collect())
    files = engine.sql(
        "SELECT count(*) AS n, sum(file_bytes) AS bytes FROM metrics9$files"
    ).collect()[0]
    print(f"metrics9$files: {files.n} files, {files.bytes} bytes")
    feed = engine.table_changes("accounts", 1, key_cols=["id"])
    print("change feed v1..head:",
          sorted((r._change_type, r.id) for r in feed.collect())[:4])
    print("ANALYZE:", engine.sql(
        "ANALYZE TABLE cust10 COMPUTE STATISTICS FOR COLUMNS customer_id"
    ).collect())

    # --- 12. r7: HiveServer2 door, streaming ingest, sketches ---------
    from konohadataplatform_spark.hs2 import Hs2Client, Hs2Server

    hs2 = Hs2Server(engine).start()  # any Hive JDBC client connects here
    cli = Hs2Client(hs2.port)
    cli.open_session()
    cols, rows = cli.execute(
        "SELECT o_orderpriority, count(*) AS n FROM orders "
        "GROUP BY o_orderpriority ORDER BY n DESC LIMIT 1"
    )
    print("over hive jdbc protocol:", cols, rows)
    cli.close()
    hs2.stop()

    from konohadataplatform_spark.streaming.ingest import DocIngestPipeline

    ing = DocIngestPipeline(spark, catalog, "corpus12", quality_min=0.9)
    ing.apply_batch(
        spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog and keeps "
                 "going through the wide green field toward the hills", "en",
              "web", None),
             (2, "x x x x x x x x x x x x x x x x", "en", "web", None)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ),
        batch_id=0,
    )
    ing.quality_min = 0.1  # operator loosens the gate...
    readmitted = ing.replay_rejects()  # ...and replays the reject DLQ
    print("ingest: corpus", catalog.read("corpus12").count(),
          "docs after replaying", readmitted, "reject(s)")

    from konohadataplatform_spark.operators.sketches import (
        approx_distinct,
        quantile_sketch,
    )

    orders_df = spark.table("orders")
    print("HLL++ custkeys/priority:",
          approx_distinct(orders_df, ["o_orderpriority"], "o_custkey")
          .orderBy("o_orderpriority").first().approx_n)
    print("GK p99 totalprice:",
          quantile_sketch(orders_df, ["o_orderpriority"], "o_totalprice",
                          probs=[0.99]).first().p99)

    spark.stop()


if __name__ == "__main__":
    main()
