"""Keep-composed vs always-fresh post-flush reads (VERDICT r13 #4).

The flush() partial-rewrite path has two ways to refresh the live
view: KEEP the pre-flush composed merge-on-read plan (skips any
post-flush work, defers side-file GC, grows plan depth), or rebuild a
FRESH chain read from the per-version file manifests (eager side-file
GC, depth reset to 0). Keep-composed was written when a fresh rebuild
cost a ~5s O(leafs) directory relist; the r13 manifests removed the
relist, so this probe measures whether the branch still pays for its
complexity.

Per scale (x10/x100 of the 150k-row base) and mode, runs a settle
compact then ROUNDS point-UPDATE cycles of:
  statement -> flush -> point MATCH -> full COUNT
recording each wall separately. The flush wall isolates the refresh
cost (fresh adds the manifest-built reader construction); the MATCH /
count walls expose any post-flush plan-depth difference.

Usage: PYTHONPATH=/root/repo python scripts/keepcomposed_probe.py [mults]
Prints one table + one JSON line per (scale, mode).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from grapho_spark.engine import GraphEngine  # noqa: E402
from grapho_spark.session import get_spark  # noqa: E402
from grapho_spark.sparkutil import scratch_path  # noqa: E402

BASE_ROWS = 150_000
TARGET_BUCKET_ROWS = 10_000
ROUNDS = 4


def run(spark, mult: int, keep_composed: bool) -> dict:
    n_rows = BASE_ROWS * mult
    mode = "keep" if keep_composed else "fresh"
    data_dir = scratch_path(f"kc_probe_x{mult}_{mode}_{os.getpid()}")
    shutil.rmtree(data_dir, ignore_errors=True)
    eng = GraphEngine(
        spark,
        data_dir=data_dir,
        id_buckets=16,
        max_delta_chain=4,
        target_bucket_rows=TARGET_BUCKET_ROWS,
    )
    eng.keep_composed = keep_composed
    df = spark.range(n_rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("int").alias("v"),
        F.concat(F.lit("pad_"), F.col("id")).alias("pad"),
    )
    eng.bind_node_type("T", df, pk="k")
    eng.flush()
    eng.compact()  # settle: one full bucketed version at grown width
    out: dict = {"mult": mult, "rows": n_rows, "mode": mode}
    stmt_s = flush_s = match_s = count_s = 0.0
    for i in range(ROUNDS):
        key = n_rows // 2 + i
        t0 = time.perf_counter()
        eng.execute(f"UPDATE NODE T SET v: {1000 + i} WHERE k: {key};")
        stmt_s += time.perf_counter() - t0
        t0 = time.perf_counter()
        eng.flush()
        flush_s += time.perf_counter() - t0
        t0 = time.perf_counter()
        rows = eng.execute(
            f"MATCH T t WHERE k: {key} RETURN k, v;"
        )[0].df.collect()
        match_s += time.perf_counter() - t0
        assert rows[0]["v"] == 1000 + i
        t0 = time.perf_counter()
        assert eng.node_df("T").count() == n_rows
        count_s += time.perf_counter() - t0
    out["stmt_s"] = round(stmt_s / ROUNDS, 3)
    out["flush_s"] = round(flush_s / ROUNDS, 3)
    out["match_s"] = round(match_s / ROUNDS, 3)
    out["count_s"] = round(count_s / ROUNDS, 3)
    # scratch posture: fresh GCs side files at every flush
    root = os.path.join(data_dir, "_scratch")
    out["scratch_files"] = (
        sum(len(fs) for _, _, fs in os.walk(root)) if os.path.isdir(root) else 0
    )
    shutil.rmtree(data_dir, ignore_errors=True)
    return out


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark("keepcomposed_probe")
    rows = []
    for m in mults:
        for kc in (True, False):
            rows.append(run(spark, m, kc))
    print(
        f"{'scale':>6s} {'mode':>6s} {'stmt_s':>7s} {'flush_s':>8s} "
        f"{'match_s':>8s} {'count_s':>8s} {'scratch':>7s}"
    )
    for r in rows:
        print(
            f"x{r['mult']:<5d} {r['mode']:>6s} {r['stmt_s']:>7.3f} "
            f"{r['flush_s']:>8.3f} {r['match_s']:>8.3f} "
            f"{r['count_s']:>8.3f} {r['scratch_files']:>7d}"
        )
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
