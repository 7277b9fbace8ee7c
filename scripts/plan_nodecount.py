"""Count physical-plan nodes in an explain('formatted') dump,
EXCLUDING InMemoryRelation cached-plan reprints (VERDICT r15 #7: the
textual dump re-inlines every cached subtree's ORIGINAL plan under
'InMemoryRelation', so naive grep counts nodes that never execute —
the executed plan reads the cache instead).

A formatted dump has three sections: the numbered tree, the node
details ('(n) NodeName'), and subqueries. We count ONLY tree lines
(they start with optional whitespace and tree-drawing chars followed
by '* ' or a node name), and we skip every tree line that sits under
an 'InMemoryRelation' node at greater indentation (its reprinted
child plan).

Usage: python scripts/plan_nodecount.py <dump.txt> [<dump2.txt> ...]
"""
import re
import sys

NODE = re.compile(r"^([ :+\-*]*)\(?\d*\)?\s*([A-Za-z][A-Za-z0-9_]*)")
INTERESTING = (
    "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct", "Exchange",
    "ReusedExchange", "Window", "Generate", "HashAggregate",
    "ObjectHashAggregate", "SortAggregate", "InMemoryTableScan",
    "BatchEvalPython", "ArrowEvalPython", "MapInPandas", "Scan",
    "Sort",
)


def count(path: str) -> dict:
    counts: dict[str, int] = {}
    imr_depth = None  # indent of the InMemoryRelation we are under
    with open(path) as fh:
        for line in fh:
            if line.startswith("==") or line.strip() == "":
                continue
            # details section starts like '(1) Scan parquet ...' at col 0
            m = re.match(r"^[ :+\-]*(\*\(\d+\)\s+)?([A-Za-z][A-Za-z0-9_]*)", line)
            if not m:
                continue
            indent = len(line) - len(line.lstrip(" :+-*"))
            name = m.group(2)
            if re.match(r"^\(\d+\)", line.strip()):
                # node-details section: stop scanning the tree
                break
            if imr_depth is not None:
                if indent > imr_depth:
                    continue  # reprinted cached child plan
                imr_depth = None
            if name == "InMemoryRelation":
                imr_depth = indent
            for k in INTERESTING:
                if name == k or (k == "Scan" and name.startswith("Scan")):
                    counts[k] = counts.get(k, 0) + 1
    return counts


if __name__ == "__main__":
    for p in sys.argv[1:]:
        c = count(p)
        print(p)
        for k in INTERESTING:
            if c.get(k):
                print(f"  {k}: {c[k]}")
