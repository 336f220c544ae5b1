"""Plan audit: find scale-killer shapes in a query's optimized plan.

The first pattern a 100 TB user hits is an UNPARTITIONED window over a
corpus-sized input — ``row_number() over (order by ...)`` with no
``partitionBy`` plans ``Exchange SinglePartition`` and sorts the entire
input in one task (Spark warns "Moving all data to a single partition"
at runtime, but only in the logs, and only once the job is already
melting). This module walks the optimized LOGICAL plan and reports
every global window whose input is not provably bounded, so the gate in
``tests/test_plan_hygiene.py`` can sweep the whole registry and fail a
build that reintroduces the shape (VERDICT r7/r8 item 2; ``decile_lift``
was the live instance, fixed via ``operators/ranking.py::global_rank``).

Boundedness here is the SCALING.md notion, not a row-count proof: an
input that has passed through an Aggregate (groupBy / distinct), a
GlobalLimit, or is a literal LocalRelation is "post-aggregate bounded" —
its size is vocab / bins / groups / sketch-k class, sublinear in the
corpus — while anything reading a relation leaf (parquet scan, RDD
checkpoint) unreduced is corpus-sized. Joins and unions are bounded only
when EVERY child is (a bounded×corpus join is corpus-sized); row-mapping
nodes (Project/Filter/Sort/Repartition/Generate/Expand/...) inherit
their child. The rule classifies every one of the registry's ~25 global
windows correctly today: the post-agg cumulative/ranking windows pass,
and the pre-fix ``decile_lift`` window is the one it would flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: nodes whose OUTPUT is bounded regardless of input size (logical +
#: the physical aggregates/limits seen inside cached plans)
_BOUNDING = {
    "Aggregate", "GlobalLimit", "Deduplicate", "DeduplicateWithinWatermark",
    "HashAggregateExec", "SortAggregateExec", "ObjectHashAggregateExec",
    "GlobalLimitExec", "CollectLimitExec", "TakeOrderedAndProjectExec",
}
#: leaf nodes that are bounded by construction (driver-side literals /
#: generated ranges — always sketch/seed/codebook-sized in this repo)
_BOUNDED_LEAVES = {"LocalRelation", "OneRowRelation", "Range", "LocalTableScanExec"}
#: nodes bounded only if ALL children are bounded
_ALL_CHILDREN = {"Join", "Union", "Intersect", "Except", "CoGroup"}


def _children(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.length())]


def _simple_name(node) -> str:
    return node.getClass().getSimpleName().removesuffix("$")


def _walk(node, violations: list[str]) -> bool:
    """Post-order: record unbounded global windows, return boundedness."""
    name = _simple_name(node)
    kids = _children(node)
    kid_bounded = [_walk(k, violations) for k in kids]

    if name in _BOUNDING:
        return True
    if name == "InMemoryRelation":
        # persist_tracked frames: the optimizer swaps the cached subtree
        # for this leaf — boundedness is decided by the PLAN THAT FILLS
        # the cache (physical; AQE-wrapped), not by the leaf itself
        return _walk(node.cachedPlan(), violations)
    if name == "InMemoryTableScanExec":
        return _walk(node.relation(), violations)
    if name == "AdaptiveSparkPlanExec":
        return _walk(node.inputPlan(), violations)
    if name == "ReusedExchangeExec":
        return _walk(node.child(), violations)
    if not kids:
        return name in _BOUNDED_LEAVES
    if name in ("Window", "WindowExec"):
        child_ok = kid_bounded[0]
        if node.partitionSpec().isEmpty() and not child_ok:
            funcs = (
                node.windowExpressions()
                if name == "Window"
                else node.windowExpression()
            ).mkString(", ")
            violations.append(
                f"unpartitioned {name} over unbounded input: [{funcs[:200]}]"
            )
        return child_ok
    if name in _ALL_CHILDREN:
        return all(kid_bounded)
    # row-mapping single-child nodes (Project, Filter, Sort, Sample,
    # Repartition*, Generate, Expand, SubqueryAlias, ...) inherit; any
    # multi-child node not listed above is conservatively unbounded
    # unless every child is bounded.
    return all(kid_bounded)


def unbounded_global_windows(df: DataFrame) -> list[str]:
    """Descriptions of every unpartitioned Window in ``df``'s optimized
    plan whose input is not post-aggregate bounded. Empty list = the
    plan has no single-partition corpus sort hiding in it."""
    violations: list[str] = []
    _walk(df._jdf.queryExecution().optimizedPlan(), violations)
    return violations
