"""Data-quality checks — the dbt `test` operator analog.

The reference wires a ``DbtSparkTestOperator``
(``dag/operators/dbt_spark_operator.py:442-447``) and a feature flag
``enable_data_quality_checks`` (``dbt/dbt_project.yml:28``) but ships no
tests (SURVEY §5); this module supplies the standard dbt check types as
DataFrame predicates so the pipeline can actually enforce them:

not_null / unique / accepted_values / relationships (FK into another
table) / expression (arbitrary SQL predicate that must hold).

Each check returns the number of VIOLATING rows (0 = pass) — a single
aggregate job per check, no collect of data rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CheckResult:
    model: str
    check: str
    column: str | None
    violations: int

    @property
    def passed(self) -> bool:
        return self.violations == 0


def not_null(df: DataFrame, column: str) -> int:
    return df.filter(F.col(column).isNull()).count()


def unique(df: DataFrame, column: str) -> int:
    dup = (
        df.groupBy(column)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("v"))
        .first()
    )
    return int(dup.v)


def accepted_values(df: DataFrame, column: str, values: list) -> int:
    """dbt semantics: NULLs are not violations here — they belong to
    not_null. Only non-null values outside the accepted set count."""
    return df.filter(
        ~F.col(column).isin(values) & F.col(column).isNotNull()
    ).count()


def relationships(df: DataFrame, column: str, to: DataFrame, to_col: str) -> int:
    """FK integrity: rows whose key has no match in the parent table."""
    parent = to.select(F.col(to_col).alias(column)).distinct()
    return df.select(column).join(parent, column, "left_anti").count()


def expression(df: DataFrame, predicate: str) -> int:
    """Rows violating an arbitrary SQL predicate (dbt singular test)."""
    return df.filter(f"NOT ({predicate})").count()


@dataclass
class ModelChecks:
    model: str
    not_null_cols: list[str] = field(default_factory=list)
    unique_cols: list[str] = field(default_factory=list)
    accepted: dict[str, list] = field(default_factory=dict)
    expressions: list[str] = field(default_factory=list)
    # (column, parent_model, parent_column)
    fks: list[tuple[str, str, str]] = field(default_factory=list)


def run_checks(pipeline, checks: list[ModelChecks]) -> list[CheckResult]:
    out: list[CheckResult] = []
    for mc in checks:
        df = pipeline.catalog.read(mc.model)
        for c in mc.not_null_cols:
            out.append(CheckResult(mc.model, "not_null", c, not_null(df, c)))
        for c in mc.unique_cols:
            out.append(CheckResult(mc.model, "unique", c, unique(df, c)))
        for c, vals in mc.accepted.items():
            out.append(
                CheckResult(mc.model, "accepted_values", c, accepted_values(df, c, vals))
            )
        for pred in mc.expressions:
            out.append(CheckResult(mc.model, f"expr[{pred}]", None, expression(df, pred)))
        for c, parent, pc in mc.fks:
            out.append(
                CheckResult(
                    mc.model,
                    f"relationship->{parent}.{pc}",
                    c,
                    relationships(df, c, pipeline.catalog.read(parent), pc),
                )
            )
    return out
