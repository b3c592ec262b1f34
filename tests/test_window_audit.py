"""Repo-wide unpartitioned-window audit (r14, closing VERDICT r13 #1).

A ``Window.orderBy(...)`` with no ``partitionBy`` (or an EMPTY
``Window.partitionBy()``) is a single-partition WindowExec — every row
of the windowed relation funnels through ONE task. That is the W1/W3
failure mode at fact scale, and rounds 13-14 each rewrote instances of
it (q_customer_order_summary, q_customer_pareto, q_balance_deciles,
mart_customer_summary_star now route through
``operators/ranking.scalable_rank_stats``). This test closes the
class the way ``test_broadcast_audit.py`` closed ungated broadcasts:
every unpartitioned-window construction site in the package must be
WHITELISTED below with its justification category, and the whitelist
pins the per-function site COUNT — adding a global window anywhere
fails the test until the new site is audited and recorded.

Categories:

- ``metadata`` — the windowed relation is bounded by something that
  does not grow with the corpus: one row per range partition
  (ranking offsets), dim^2 covariance cells, a capped vocabulary, a
  16^k prefix-bucket key space, a year-month grain.
- ``fixture``  — the reference's inline 5-user/8-order fixture model
  port (plans/models.py) — the fixtures ARE the spec and are
  constant-sized by construction.
- ``gated``    — the single-window spelling behind
  ``scalable_rank_stats``'s counted gate (operators/gating.py
  convention): it can only execute when a LIMIT-bounded probe proved
  the relation is under $SPARK_GRAFT_RANK_SMALL rows; above the bound
  the two-phase range-partitioned plan runs instead, and both sides
  of the flip are parity-tested bit-identical.

Anything corpus-proportional must instead go through
``scalable_rank_stats`` / ``scalable_row_number`` /
``ntile_from_rank`` (operators/ranking.py).
"""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parents[1] / "konohadataplatform_spark"

# (module, enclosing-function) -> (expected site count, category)
WHITELIST: dict[tuple[str, str], tuple[int, str]] = {
    # vocab-sized: the rank window runs over <= vocab_cap pieces
    ("operators/bpe.py", "unigram_train"): (1, "metadata"),
    ("operators/bpe.py", "unigram_train_em"): (1, "metadata"),
    ("operators/bpe.py", "unigram_train_em_prob"): (1, "metadata"),
    # 16^prefix_chars rng buckets — one row per bucket key
    ("operators/curation.py", "shard_plan"): (1, "metadata"),
    # dim^2/2 covariance cells — never corpus rows
    ("operators/projection.py", "dimension_correlation"): (1, "metadata"),
    # THE two-phase helper itself: offsets/totals windows run over one
    # row per range partition (2 sites), plus the counted-gated
    # small-relation spelling (1 orderBy + 1 empty partitionBy)
    ("operators/ranking.py", "scalable_rank_stats"): (4, "gated"),
    # reference's inline fixture model port (5 users / 8 orders)
    ("plans/models.py", "user_order_summary"): (2, "fixture"),
    ("plans/models.py", "simple_pipeline"): (2, "fixture"),
    # year-month grain: <= 12 rows per year of data
    ("queries/tpch.py", "q_monthly_growth"): (1, "metadata"),
}

_CATEGORIES = {"metadata", "fixture", "gated"}


def _census() -> dict[tuple[str, str], int]:
    found: dict[tuple[str, str], int] = {}
    for path in sorted(PKG.rglob("*.py")):
        rel = str(path.relative_to(PKG))
        tree = ast.parse(path.read_text())
        spans: list[tuple[int, int, str]] = []

        class _Funcs(ast.NodeVisitor):
            def visit_FunctionDef(self, n):  # noqa: N802
                spans.append(
                    (n.lineno, max(getattr(n, "end_lineno", n.lineno), n.lineno), n.name)
                )
                self.generic_visit(n)

            visit_AsyncFunctionDef = visit_FunctionDef

        _Funcs().visit(tree)

        def _enclosing(line: int) -> str:
            best = "<module>"
            for s, e, name in spans:
                if s <= line <= e:
                    best = name  # innermost wins: spans are pre-order
            return best

        for node in ast.walk(tree):
            if not (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and isinstance(node.func.value, ast.Name)
                and node.func.value.id == "Window"
            ):
                continue
            attr = node.func.attr
            is_global = attr == "orderBy" or (
                attr == "partitionBy" and not node.args and not node.keywords
            )
            if is_global:
                key = (rel, _enclosing(node.lineno))
                found[key] = found.get(key, 0) + 1
    return found


def test_every_global_window_site_is_whitelisted():
    found = _census()
    unexpected = {k: v for k, v in found.items() if k not in WHITELIST}
    assert not unexpected, (
        "un-audited unpartitioned Window site(s) — route corpus-grade "
        "ranks through operators/ranking.scalable_rank_stats or add an "
        f"audited whitelist entry: {sorted(unexpected)}"
    )
    for key, (expected_n, _cat) in WHITELIST.items():
        assert found.get(key, 0) == expected_n, (
            f"site count drifted for {key}: expected {expected_n}, "
            f"found {found.get(key, 0)} — re-audit the function"
        )


def test_whitelist_categories_are_valid():
    for key, (_n, cat) in WHITELIST.items():
        assert cat in _CATEGORIES, f"unknown category {cat!r} for {key}"
