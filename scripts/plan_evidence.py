"""Capture verifiable plan evidence for OPTIMIZATION_r16 claims.

``node_counts(df)`` walks the LIVE physical-plan object tree via py4j
instead of parsing explain text: InMemoryTableScan keeps its cached
relation in a FIELD (not in children()), so a session-memoized view's
one-time build plan is naturally excluded — exactly the
"executed-node counts excluding InMemoryRelation reprints" VERDICT
r15 #7 asked for. AdaptiveSparkPlan wraps its plan in a field too, so
it is descended explicitly via initialPlan().

``capture(df, path)`` writes the formatted explain dump with a
'# node-counts' header line so every count claimed in
OPTIMIZATION_r16.md is reproducible by reading the committed file.
"""

from __future__ import annotations


def _children(jnode):
    name = jnode.nodeName()
    if name == "AdaptiveSparkPlan":
        return [jnode.initialPlan()]
    seq = jnode.children()
    return [seq.apply(i) for i in range(seq.size())]


def node_counts(df) -> dict[str, int]:
    counts: dict[str, int] = {}
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        name = node.nodeName()
        counts[name] = counts.get(name, 0) + 1
        if name.startswith("InMemoryTableScan"):
            continue  # cached session view: its build plan ran once, elsewhere
        stack.extend(_children(node))
    return counts


def capture(df, path: str) -> dict[str, int]:
    from grapho_spark.plan_expectations import formatted_plan

    try:
        counts = node_counts(df)
        summary = ", ".join(f"{k}={v}" for k, v in sorted(counts.items()))
        header = (
            "# node-counts (live object tree, cache-boundary-stopped):\n"
            f"# {summary}\n"
        )
    except Exception:
        counts = {}
        header = (
            "# node-counts unavailable (streaming plan: executedPlan "
            "requires writeStream) — textual dump only\n"
        )
    with open(path, "w") as fh:
        fh.write(header)
        fh.write(formatted_plan(df))
    return counts
