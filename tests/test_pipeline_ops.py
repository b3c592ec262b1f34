"""The remaining dbt-operator analogs (§2.12): compile, docs, debug,
freshness, SCD2 snapshot, and data-quality checks (dbt test)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import Row

from konohadataplatform_spark.catalog import SnapshotCatalog
from konohadataplatform_spark.plans.models import register_reference_models
from konohadataplatform_spark.plans.pipeline import Pipeline, PipelineOps
from konohadataplatform_spark.plans.quality import ModelChecks, run_checks


@pytest.fixture()
def pipeline(spark, tmp_path):
    p = Pipeline(spark, SnapshotCatalog(spark, str(tmp_path / "wh")))
    register_reference_models(p)
    return p


def test_compile_resolves_schemas_without_materializing(pipeline):
    ops = PipelineOps(pipeline)
    # compile staging models only: they depend solely on sources
    schemas = ops.compile(select=["stg_users", "stg_orders"])
    assert "user_id:bigint" in schemas["stg_users"] or "user_id:int" in schemas["stg_users"]
    assert not pipeline.catalog.exists("stg_users")  # nothing written


def test_docs_and_debug(pipeline):
    ops = PipelineOps(pipeline)
    doc = ops.docs()
    assert doc["models"]["daily_order_metrics"]["materialization"] == "incremental"
    assert ("stg_orders", "daily_order_metrics") in doc["edges"]
    dbg = ops.debug()
    assert dbg["models"] == 5
    assert dbg["sources"]["raw_users"].startswith("ok")


def test_freshness(pipeline, spark):
    pipeline.run(select=["stg_orders"])
    ops = PipelineOps(pipeline)
    ages = ops.freshness({"stg_orders": "created_at"})
    # fixed clock = 2024-01-01, so age is large and finite
    assert 0 < ages["stg_orders"] < 10 * 365 * 86400


def _ts(s):
    return datetime.fromisoformat(s)


def test_scd2_snapshot_lifecycle(pipeline, spark):
    ops = PipelineOps(pipeline)
    v1 = spark.createDataFrame(
        [
            Row(id=1, city="Hanoi", updated=_ts("2024-01-01T00:00:00")),
            Row(id=2, city="Paris", updated=_ts("2024-01-01T00:00:00")),
        ]
    )
    ops.snapshot("dim_city", v1, unique_key="id", updated_at="updated")
    t1 = pipeline.catalog.read("dim_city")
    assert t1.count() == 2
    assert t1.filter("_is_current").count() == 2

    # id=1 changes, id=3 appears, id=2 unchanged
    v2 = spark.createDataFrame(
        [
            Row(id=1, city="Saigon", updated=_ts("2024-02-01T00:00:00")),
            Row(id=2, city="Paris", updated=_ts("2024-02-01T00:00:00")),
            Row(id=3, city="Tokyo", updated=_ts("2024-02-01T00:00:00")),
        ]
    )
    ops.snapshot("dim_city", v2, unique_key="id", updated_at="updated")
    t2 = pipeline.catalog.read("dim_city")
    assert t2.count() == 4  # 2 open originals -> 1 closed + 3 open
    cur = {r.id: r.city for r in t2.filter("_is_current").collect()}
    assert cur == {1: "Saigon", 2: "Paris", 3: "Tokyo"}
    closed = t2.filter("NOT _is_current").collect()
    assert len(closed) == 1
    assert closed[0].id == 1 and closed[0].city == "Hanoi"
    assert closed[0]._valid_to == _ts("2024-02-01T00:00:00")

    # idempotent re-apply of the same source
    ops.snapshot("dim_city", v2, unique_key="id", updated_at="updated")
    assert pipeline.catalog.read("dim_city").count() == 4


def test_quality_checks(pipeline):
    pipeline.run()
    checks = [
        ModelChecks(
            model="stg_orders",
            not_null_cols=["order_id", "user_id"],
            unique_cols=["order_id"],
            accepted={"status": ["COMPLETED", "PENDING", "CANCELLED"]},
            expressions=["amount > 0"],
            fks=[("user_id", "stg_users", "user_id")],
        ),
        ModelChecks(
            model="user_order_summary",
            unique_cols=["user_id", "revenue_rank"],
            expressions=["total_orders >= completed_orders"],
        ),
    ]
    results = run_checks(pipeline, checks)
    failing = [r for r in results if not r.passed]
    assert not failing, f"quality violations: {failing}"


def test_quality_checks_catch_violations(pipeline, spark):
    pipeline.catalog.write(
        "bad",
        spark.createDataFrame(
            [Row(id=1, s="x"), Row(id=1, s=None), Row(id=2, s="zz")]
        ),
    )
    results = run_checks(
        pipeline,
        [
            ModelChecks(
                model="bad",
                not_null_cols=["s"],
                unique_cols=["id"],
                accepted={"s": ["x", "y"]},
            )
        ],
    )
    by_check = {r.check: r.violations for r in results}
    assert by_check["not_null"] == 1
    assert by_check["unique"] == 2
    # dbt semantics: NULL is not an accepted_values violation (not_null
    # owns it) — only the out-of-set 'zz' counts
    assert by_check["accepted_values"] == 1


def test_deps_installs_local_package(pipeline, tmp_path):
    """dbt-deps analog: a local package module registers its models
    into the pipeline and the lock records its version/content hash."""
    pkg = tmp_path / "revenue_pkg.py"
    pkg.write_text(
        '__version__ = "1.2.0"\n'
        "from konohadataplatform_spark.plans.pipeline import ModelSpec\n\n\n"
        "def register(pipeline):\n"
        "    def pkg_user_count(spark, ctx):\n"
        "        return ctx.ref('stg_users').groupBy().count()\n"
        "    pipeline.model(ModelSpec(\n"
        "        name='pkg_user_count', fn=pkg_user_count,\n"
        "        depends_on=['stg_users']))\n"
    )
    ops = PipelineOps(pipeline)
    lock = ops.deps({"revenue_pkg": str(pkg)})
    assert lock == {"revenue_pkg": "1.2.0"}
    assert "pkg_user_count" in pipeline.models
    pipeline.run(select=["pkg_user_count"])
    assert pipeline.catalog.read("pkg_user_count").collect()[0]["count"] >= 1

    # unversioned package -> content hash; missing entry point -> loud
    pkg2 = tmp_path / "noop_pkg.py"
    pkg2.write_text("def register(pipeline):\n    pass\n")
    lock2 = ops.deps({"noop_pkg": str(pkg2)})
    assert len(lock2["noop_pkg"]) == 12
    bad = tmp_path / "bad_pkg.py"
    bad.write_text("x = 1\n")
    with pytest.raises(ValueError, match="register"):
        ops.deps({"bad_pkg": str(bad)})
