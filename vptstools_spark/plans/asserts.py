"""Plan assertions — executable conventions about what a query plan may do.

`unbounded_global_windows` enforces the no-global-window rule: a window
function with an empty PARTITION BY funnels its entire input through one
partition; that is only acceptable when the input is already bounded by a
Limit below the window (the two-phase top-k shape, e.g. `supplier_rank`).
Tests sweep every registered query through this check so the convention is
enforced, not aspirational.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _walk(node):
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i))


def _subtree_has_limit(node) -> bool:
    for sub in _walk(node):
        if sub.getClass().getSimpleName() in ("GlobalLimit", "LocalLimit"):
            return True
    return False


def unbounded_global_windows(df: DataFrame) -> list[str]:
    """Names of window expressions that run with an empty partitionSpec over
    an input NOT bounded by a Limit — i.e. true single-partition windows
    over unbounded data. Empty list ⇒ the plan honors the convention.

    Inspects the optimized logical plan (stable node shapes; the physical
    SinglePartition exchange is a consequence of what this detects).
    """
    plan = df._jdf.queryExecution().optimizedPlan()
    flagged: list[str] = []
    for node in _walk(plan):
        if node.getClass().getSimpleName() != "Window":
            continue
        if not node.partitionSpec().isEmpty():
            continue
        if _subtree_has_limit(node):
            continue
        exprs = node.windowExpressions()
        names = ",".join(
            exprs.apply(i).name() for i in range(exprs.size())
        )
        flagged.append(names or "<window>")
    return flagged
