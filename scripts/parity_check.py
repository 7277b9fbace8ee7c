"""Run oracle-parity for each query, printing status + timing.

Usage: python scripts/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

from grapho_spark.oracle import compare_query
from grapho_spark.queries import all_queries
from grapho_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or sorted(all_queries().keys())
    spark = get_spark("parity_check")
    n_bad = 0
    for name in names:
        t0 = time.perf_counter()
        try:
            rep = compare_query(spark, name, sf_dir)
        except Exception as e:
            rep = {"name": name, "status": "error", "error": f"{type(e).__name__}: {e}"}
            if "-v" in sys.argv:
                traceback.print_exc()
        dt = time.perf_counter() - t0
        status = rep["status"]
        ok = status in ("match", "rows_only")
        n_bad += 0 if ok else 1
        line = f"{'OK ' if ok else 'BAD'} {name:40s} {status:18s} {dt:6.1f}s"
        if status in ("schema_mismatch",):
            line += f"\n    spark={rep['spark_cols']}\n    duck ={rep['duck_cols']}"
        elif status == "rowcount_mismatch":
            line += f" spark={rep['spark_rows']} duck={rep['duck_rows']}"
        elif status == "value_mismatch":
            line += f"\n    spark={rep['spark_row']}\n    duck ={rep['duck_row']}"
        elif status == "error":
            line += f"\n    {rep['error'][:500]}"
        print(line, flush=True)
    print(f"DONE bad={n_bad}/{len(names)}")


if __name__ == "__main__":
    main()
