"""Physical-plan audits — the 100 TB design rules as checkable code.

``global_window_violations`` walks a DataFrame's physical plan and
returns every Window node that would funnel an unbounded input through
a single task: an EMPTY partition spec (``OVER (ORDER BY ...)`` with no
``PARTITION BY``) whose subtree shows no evidence of boundedness.
Evidence of boundedness, in practice:

* an Aggregate below the window — the window ranks a grouped table
  whose cardinality is the (bounded) key space, not the raw input;
* a TakeOrderedAndProject / Limit / WindowGroupLimit below it — the
  optimizer already pruned the input to K rows (Catalyst rewrites
  ``row_number().over(orderBy) ... filter(rk <= k)`` into a distributed
  per-partition top-K + merge, so a pinned top-K plan passes here).

Anything else is the single-partition global sort the round-6 verdict
flagged in the exact-rank statistics family; the scale-safe form is the
two-pass kernel in ``operators.relational`` (global_row_number /
global_ntile / global_lag), which emits mapInPandas, not Window.

Used by tests/test_plan_invariants.py (with the kernel threshold forced
to 0 so auto-switch small paths can't mask a missing reroute) and by
scripts/global_window_audit.py for ad-hoc sweeps.
"""

from __future__ import annotations

_LIMIT_NODES = {
    "TakeOrderedAndProjectExec", "GlobalLimitExec", "LocalLimitExec",
    "CollectLimitExec", "WindowGroupLimitExec",
}

_WINDOW_NODES = ("WindowExec", "WindowInPandasExec")


def _simple(node) -> str:
    return node.getClass().getSimpleName()


def _walk(node):
    yield node
    if _simple(node) == "AdaptiveSparkPlanExec":
        yield from _walk(node.inputPlan())
        return
    cs = node.children()
    for i in range(cs.size()):
        yield from _walk(cs.apply(i))


def _subtree_bounded(window_node) -> bool:
    cs = window_node.children()
    for i in range(cs.size()):
        for d in _walk(cs.apply(i)):
            nm = _simple(d)
            if "Aggregate" in nm or nm in _LIMIT_NODES:
                return True
    return False


def global_window_violations(df) -> list[str]:
    """Descriptions of partitionBy-less Windows over unbounded input."""
    root = df._jdf.queryExecution().executedPlan()
    out = []
    for n in _walk(root):
        if (_simple(n) in _WINDOW_NODES
                and n.partitionSpec().isEmpty()
                and not _subtree_bounded(n)):
            out.append(str(n.simpleString(120)))
    return out
