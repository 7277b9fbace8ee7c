"""Plan audit: prints the physical-plan evidence for PERF.md's claims
(predicate pushdown, column pruning, broadcast joins, codegen spans)
for the headline queries.  The expectation matrix itself lives in
``grapho_spark/plan_expectations.py`` and is asserted in CI by
``tests/test_plan_expectations.py``; this script is the human-readable
report over the same data.

Usage: PYTHONPATH=. python scripts/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

from grapho_spark.plan_expectations import PLAN_CHECKS, formatted_plan
from grapho_spark.queries import all_queries
from grapho_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain_audit")
    reg = all_queries()
    failures = []
    for name, wanted in PLAN_CHECKS.items():
        df = reg[name].spark_fn(spark, sf_dir)
        plan = formatted_plan(df)
        print(f"=== {name} ===")
        for pat in wanted:
            hit = re.search(pat, plan)
            status = "OK " if hit else "MISS"
            if not hit:
                failures.append((name, pat))
            print(f"  [{status}] {pat}")
        for line in plan.splitlines():
            if "PushedFilters" in line or "ReadSchema" in line:
                print("   ", line.strip()[:160])
    print("FAILURES:", failures or "none")


if __name__ == "__main__":
    main()
