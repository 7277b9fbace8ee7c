"""Composed storage-stack probe (VERDICT r13 #6): one BOUND table at
x100 (15M rows) exercising every storage feature TOGETHER —
retention window + per-leaf blooms + adaptive re-bucketing + delta
chains — under a mixed point UPDATE / DELETE / MATCH / AS OF / insert
workload, to catch cross-feature interactions the per-feature rows of
scripts/storage_probe.py and the soak's small-scale random DML both
miss. Walls should stay flat vs the per-feature probe (PERF.md).

Usage: PYTHONPATH=/root/repo python scripts/composed_probe.py [mult]
Prints one table + one JSON line.
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
CYCLES = 3  # mixed-DML cycles between flushes


def run(spark, mult: int) -> dict:
    n_rows = BASE_ROWS * mult
    data_dir = scratch_path(f"composed_probe_x{mult}_{os.getpid()}")
    shutil.rmtree(data_dir, ignore_errors=True)
    eng = GraphEngine(
        spark,
        data_dir=data_dir,
        id_buckets=16,
        max_delta_chain=4,
        target_bucket_rows=10_000,
        keep_versions=6,  # retention ON (the per-feature probe ran without)
        zone_bloom_rows=100_000,  # blooms ON at this scale
    )
    df = spark.range(n_rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("int").alias("v"),
        F.concat(F.lit("pad_"), F.col("id")).alias("pad"),
    )
    eng.bind_node_type("T", df, pk="k")
    eng.flush()
    eng.compact()  # settle at grown bucket width, blooms written
    out: dict = {"mult": mult, "rows": n_rows, "cycles": CYCLES}
    v_settled = 2
    walls: dict[str, list[float]] = {
        "pt_update": [], "pt_delete": [], "pt_match": [],
        "insert": [], "flush": [], "asof": [], "count": [],
    }
    live = n_rows
    for c in range(CYCLES):
        k_upd = n_rows // 3 + c
        k_del = n_rows // 2 + 10 * c
        k_ins = n_rows + 100 + c
        t0 = time.perf_counter()
        eng.execute(f"UPDATE NODE T SET v: {2000 + c} WHERE k: {k_upd};")
        walls["pt_update"].append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        eng.execute(f"DELETE NODE T WHERE k: {k_del};")
        walls["pt_delete"].append(time.perf_counter() - t0)
        live -= 1
        t0 = time.perf_counter()
        eng.execute(f"INSERT NODE T (k: {k_ins}, v: 1, pad: 'x');")
        walls["insert"].append(time.perf_counter() - t0)
        live += 1
        t0 = time.perf_counter()
        rows = eng.execute(
            f"MATCH T t WHERE k: {k_upd} RETURN k, v;"
        )[0].df.collect()
        walls["pt_match"].append(time.perf_counter() - t0)
        assert rows[0]["v"] == 2000 + c
        t0 = time.perf_counter()
        eng.flush()
        walls["flush"].append(time.perf_counter() - t0)
        # AS OF the settled version (still inside the retention window)
        t0 = time.perf_counter()
        n_hist = eng.node_df_at("T", v_settled).count()
        walls["asof"].append(time.perf_counter() - t0)
        assert n_hist == n_rows, (n_hist, n_rows)
        t0 = time.perf_counter()
        n_live = eng.node_df("T").count()
        walls["count"].append(time.perf_counter() - t0)
        assert n_live == live, (n_live, live)
    # post-workload invariants: deleted keys gone, updates visible
    assert not eng.execute(
        f"MATCH T t WHERE k: {n_rows // 2} RETURN k;"
    )[0].df.collect()
    for name, ws in walls.items():
        out[f"{name}_s"] = round(sum(ws) / len(ws), 3)
        out[f"{name}_max_s"] = round(max(ws), 3)
    # retention actually pruned: version count bounded
    tdir = os.path.join(data_dir, "tables", "node_T")
    out["versions_on_disk"] = sum(
        1 for e in os.listdir(tdir) if e.startswith("v") and e[1:].isdigit()
    )
    shutil.rmtree(data_dir, ignore_errors=True)
    return out


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("composed_probe")
    r = run(spark, mult)
    hdr = " ".join(
        f"{k:>12s}" for k in r if k.endswith("_s") and not k.endswith("max_s")
    )
    print(hdr)
    print(
        " ".join(
            f"{r[k]:>12.3f}"
            for k in r
            if k.endswith("_s") and not k.endswith("max_s")
        )
    )
    print(json.dumps(r))


if __name__ == "__main__":
    main()
