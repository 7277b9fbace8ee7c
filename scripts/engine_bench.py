"""Engine (GQL/DML) micro-benchmark: statement throughput and MATCH
latency of the OLTP surface, the counterpart of bench.py's analytic
headline. The reference executes every statement as an O(N) Go-map
scan (/root/reference/server/server.go:641-740) with no published
numbers (BASELINE.md); this records ours for the same statement mix.

Usage: PYTHONPATH=/root/repo python scripts/engine_bench.py [n_rows]
Prints one JSON line: {"inserts_per_sec": ..., "match_ms": ...,
"update_ms": ..., "delete_ms": ..., "replay_sec": ...}.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from grapho_spark.engine import GraphEngine
from grapho_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = get_spark("engine_bench")
    data_dir = tempfile.mkdtemp(prefix="grapho_engine_bench_")
    try:
        eng = GraphEngine(spark, data_dir=data_dir)
        eng.execute(
            "CREATE NODE Person (id: int PRIMARY KEY, name: string, age: int);"
        )

        t0 = time.perf_counter()
        for i in range(n):
            eng.execute(
                f"INSERT NODE Person (id: {i}, name: 'user_{i}', age: {i % 80});"
            )
        insert_sec = time.perf_counter() - t0

        t0 = time.perf_counter()
        res = eng.execute("MATCH Person WHERE age: 42 RETURN name;")[0]
        n_match = res.df.count()
        match_ms = (time.perf_counter() - t0) * 1000

        t0 = time.perf_counter()
        eng.execute("UPDATE NODE Person SET age: 99 WHERE age: 41;")
        update_ms = (time.perf_counter() - t0) * 1000

        t0 = time.perf_counter()
        eng.execute("DELETE NODE Person WHERE age: 99;")
        delete_ms = (time.perf_counter() - t0) * 1000

        eng.flush()
        eng.execute(f"INSERT NODE Person (id: {n}, name: 'tail', age: 1);")
        t0 = time.perf_counter()
        eng2 = GraphEngine(spark, data_dir=data_dir)
        replay_sec = time.perf_counter() - t0
        assert eng2.node_df("Person").count() > 0

        print(
            json.dumps(
                {
                    "n_rows": n,
                    "inserts_per_sec": round(n / insert_sec, 1),
                    "match_ms": round(match_ms, 1),
                    "match_rows": n_match,
                    "update_ms": round(update_ms, 1),
                    "delete_ms": round(delete_ms, 1),
                    "reopen_replay_sec": round(replay_sec, 2),
                }
            )
        )
    finally:
        shutil.rmtree(data_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
