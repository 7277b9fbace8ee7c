"""Leaf-count scaling probe for bloom candidate selection (VERDICT
r13 #2): build ONE table at two leaf widths (2048 and 16384 leafs —
the second past the documented ~10^4 driver-loop ceiling), then time
point statements with candidate selection on (a) the driver bitmap
loop and (b) the distributed _ZONES probe job, each from a FRESH
engine open (cold sidecar caches — the driver loop's first statement
pays the per-version bitmap load, which is the O(leafs) driver cost
the semi-join path removes).

Usage: PYTHONPATH=/root/repo python scripts/leafscale_probe.py
Prints one table + one JSON line per (leafs, mode).
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

N_ROWS = 1_500_000
STATEMENTS = 3


def build(spark, bucket_rows: int) -> tuple[str, int]:
    data_dir = scratch_path(f"leafscale_{bucket_rows}_{os.getpid()}")
    shutil.rmtree(data_dir, ignore_errors=True)
    eng = GraphEngine(
        spark,
        data_dir=data_dir,
        id_buckets=16,
        target_bucket_rows=bucket_rows,
        zone_bloom_rows=0,  # blooms on regardless of size
    )
    df = spark.range(N_ROWS).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("int").alias("v"),
    )
    eng.bind_node_type("T", df, pk="k")
    t0 = time.perf_counter()
    eng.flush()
    build_s = round(time.perf_counter() - t0, 1)
    tdir = os.path.join(data_dir, "tables", "node_T")
    vdirs = [e for e in os.listdir(tdir) if e[1:].isdigit()]
    leafs = sum(
        1
        for v in vdirs
        for e in os.listdir(os.path.join(tdir, v))
        if e.startswith("_gbkt=")
    )
    print(f"# built {leafs} leafs in {build_s}s", file=sys.stderr)
    return data_dir, leafs


def probe(spark, data_dir: str, leafs: int, semijoin: bool) -> dict:
    mode = "semijoin" if semijoin else "driver"
    eng = GraphEngine(  # fresh open: cold inventory/bloom caches
        spark,
        data_dir=data_dir,
        zone_bloom_rows=0,
        bloom_semijoin_leafs=0 if semijoin else 1 << 30,
    )
    out: dict = {"leafs": leafs, "mode": mode}
    walls_m, walls_u = [], []
    for i in range(STATEMENTS):
        key = N_ROWS // 2 + i
        t0 = time.perf_counter()
        rows = eng.execute(
            f"MATCH T t WHERE k: {key} RETURN k, v;"
        )[0].df.collect()
        walls_m.append(time.perf_counter() - t0)
        assert len(rows) == 1
        t0 = time.perf_counter()
        r = eng.execute(f"UPDATE NODE T SET v: {i} WHERE k: {key + 50};")
        walls_u.append(time.perf_counter() - t0)
        assert r[0].count == 1
    out["match_first_s"] = round(walls_m[0], 3)
    out["match_rest_s"] = round(sum(walls_m[1:]) / (STATEMENTS - 1), 3)
    out["update_first_s"] = round(walls_u[0], 3)
    out["update_rest_s"] = round(sum(walls_u[1:]) / (STATEMENTS - 1), 3)
    return out


def main() -> None:
    spark = get_spark("leafscale_probe")
    rows = []
    for bucket_rows in (1024, 128):  # -> 2048 and 16384 leafs
        data_dir, leafs = build(spark, bucket_rows)
        for semijoin in (False, True):
            rows.append(probe(spark, data_dir, leafs, semijoin))
        shutil.rmtree(data_dir, ignore_errors=True)
    print(
        f"{'leafs':>7s} {'mode':>9s} {'match1_s':>9s} {'match_s':>8s} "
        f"{'upd1_s':>7s} {'upd_s':>7s}"
    )
    for r in rows:
        print(
            f"{r['leafs']:>7d} {r['mode']:>9s} {r['match_first_s']:>9.3f} "
            f"{r['match_rest_s']:>8.3f} {r['update_first_s']:>7.3f} "
            f"{r['update_rest_s']:>7.3f}"
        )
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
