"""x1/x10/x100 storage probe (VERDICT r10 tasks #1/#5): run the
versioned-storage flagship paths — full bucketed rewrite, insert-chain
delta flush, single-key UPDATE flush, AS OF chain read, explicit
compact — at 150k/1.5M/15M rows with ADAPTIVE re-bucketing on
(target_bucket_rows=10_000), and record wall + leaf-dirs-written per
path. Asserts the two scale invariants the 100 TB posture rests on:

  * the point-UPDATE flush writes exactly ONE leaf dir at every scale
    (partition-pruned copy-on-write), and
  * the bucket count GROWS with the table (16 -> 256 -> 2048 at these
    sizes), so the rewritten fraction per point mutation SHRINKS
    (1/16 -> 1/256 -> 1/2048) instead of each bucket silently growing
    100x — the decay VERDICT r10 named as the top residual scale risk.

Usage: PYTHONPATH=/root/repo python scripts/storage_probe.py [mults]
  e.g. `python scripts/storage_probe.py 1 10 100` (default: 1 10 100)
Prints one table + one JSON line per scale.
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

BASE_ROWS = 150_000  # ~ the sf0.1 orders table the x10 probes anchor on
TARGET_BUCKET_ROWS = 10_000


def _tip(tdir: str) -> int:
    return max(int(e[1:]) for e in os.listdir(tdir) if e[1:].isdigit())


def _leafs(tdir: str, v: int) -> list[str]:
    return [
        e for e in os.listdir(os.path.join(tdir, f"v{v}"))
        if e.startswith("_gbkt=")
    ]


def run_scale(spark, mult: int) -> dict:
    n_rows = BASE_ROWS * mult
    data_dir = scratch_path(f"storage_probe_x{mult}_{os.getpid()}")
    shutil.rmtree(data_dir, ignore_errors=True)
    eng = GraphEngine(
        spark,
        data_dir=data_dir,
        id_buckets=16,
        max_delta_chain=4,
        target_bucket_rows=TARGET_BUCKET_ROWS,
    )
    df = spark.range(n_rows).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("int").alias("v"),
        F.concat(F.lit("pad_"), F.col("id")).alias("pad"),
    )
    eng.bind_node_type("T", df, pk="k")
    tdir = os.path.join(data_dir, "tables", "node_T")
    out: dict = {"mult": mult, "rows": n_rows}

    # 1. full bucketed rewrite (first flush) — the re-bucketing point
    t0 = time.perf_counter()
    eng.flush()
    out["full_rewrite_s"] = round(time.perf_counter() - t0, 2)
    bm = json.load(open(os.path.join(tdir, f"v{_tip(tdir)}", "_BUCKETS.json")))
    out["bucket_n"] = bm["n"]
    assert n_rows <= bm["n"] * TARGET_BUCKET_ROWS, (n_rows, bm["n"])

    # 2. insert-chain delta flush: O(delta), one new dir, no rewrite
    eng.execute(f"INSERT NODE T (k: {n_rows + 7}, v: 1, pad: 'x');")
    t0 = time.perf_counter()
    eng.flush()
    out["insert_delta_flush_s"] = round(time.perf_counter() - t0, 2)
    v_delta = _tip(tdir)
    assert os.path.exists(os.path.join(tdir, f"v{v_delta}", "_DELTA"))

    # 3. single-key UPDATE + flush: the flush must rewrite exactly ONE
    # leaf dir of the GROWN layout (the partial path compacts the
    # 1-delta chain only if forced; a delta tip forces the full path —
    # so settle the chain first with a compact, outside the timer)
    eng.compact()
    v_full2 = _tip(tdir)
    key = n_rows // 2
    # r12: time the STATEMENT too — merge-on-read made it an
    # O(matched) side-file write + pushdown scan instead of an
    # O(table) localCheckpoint materialization
    t0 = time.perf_counter()
    eng.execute(f"UPDATE NODE T SET v: 999 WHERE k: {key};")
    out["point_update_stmt_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    eng.flush()
    out["point_update_flush_s"] = round(time.perf_counter() - t0, 2)
    v_part = _tip(tdir)
    leafs = _leafs(tdir, v_part)
    assert v_part == v_full2 + 1 and len(leafs) == 1, (v_part, leafs)
    out["update_leaf_dirs"] = len(leafs)
    out["rewritten_fraction"] = round(1.0 / bm["n"], 5)

    # 3b. point MATCH (r13): the zone/bloom-pruned read path — a pk
    # point predicate should read O(1) leafs of the hash layout, not
    # scan the chain
    t0 = time.perf_counter()
    rows = eng.execute(
        f"MATCH T t WHERE k: {key + 1} RETURN k, v;"
    )[0].df.collect()
    out["point_match_s"] = round(time.perf_counter() - t0, 2)
    assert len(rows) == 1 and rows[0]["k"] == key + 1

    # 4. AS OF chain read: full-table count at the first version
    # (r13: manifest-built explicit-file read — no dir listing)
    t0 = time.perf_counter()
    n1 = eng.node_df_at("T", 1).count()
    out["asof_read_s"] = round(time.perf_counter() - t0, 2)
    assert n1 == n_rows

    # 5. explicit compact (maintenance OPTIMIZE): one fresh full version
    t0 = time.perf_counter()
    eng.compact()
    out["compact_s"] = round(time.perf_counter() - t0, 2)
    bm2 = json.load(open(os.path.join(tdir, f"v{_tip(tdir)}", "_BUCKETS.json")))
    assert bm2["n"] >= bm["n"]  # grow-only across compactions
    assert eng.node_df("T").count() == n_rows + 1

    shutil.rmtree(data_dir, ignore_errors=True)
    return out


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark("storage_probe")
    rows = [run_scale(spark, m) for m in mults]
    hdr = (
        f"{'scale':>6s} {'rows':>10s} {'buckets':>7s} {'full_s':>7s} "
        f"{'ins_delta_s':>11s} {'pt_upd_s':>8s} {'leafs':>5s} "
        f"{'frac':>8s} {'asof_s':>7s} {'compact_s':>9s}"
    )
    print(hdr)
    for r in rows:
        print(
            f"x{r['mult']:<5d} {r['rows']:>10,d} {r['bucket_n']:>7d} "
            f"{r['full_rewrite_s']:>7.2f} {r['insert_delta_flush_s']:>11.2f} "
            f"{r['point_update_flush_s']:>8.2f} {r['update_leaf_dirs']:>5d} "
            f"{r['rewritten_fraction']:>8.5f} {r['asof_read_s']:>7.2f} "
            f"{r['compact_s']:>9.2f}"
        )
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
