"""Round-15 optimization profiler: run named queries in one session,
time repeats (bench methodology: q.spark_fn + count), and write
`.explain("formatted")` to plans/r15/<query>_<tag>.txt.

Usage:
  PYTHONPATH=. python scripts/r15_profile.py <tag> q1 q2 ...        # time + plans
  PYTHONPATH=. python scripts/r15_profile.py --plans-only <tag> ... # plans only
  PYTHONPATH=. python scripts/r15_profile.py --noop <tag> ...      # noop-sink timing

The noop sink computes every column (guide §1.4); the default count()
matches bench.py's timed action so numbers are comparable with the
recorded bench columns.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = int(os.environ.get("R15_REPEATS", "3"))


def main() -> None:
    args = sys.argv[1:]
    plans_only = "--plans-only" in args
    use_noop = "--noop" in args
    args = [a for a in args if not a.startswith("--")]
    tag, names = args[0], args[1:]

    from grapho_spark.queries import all_queries
    from grapho_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15_profile")
    reg = all_queries()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    def _ident(it):
        yield from it

    spark.range(64).repartition(32).mapInPandas(_ident, schema="id long").count()

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        q = reg[name]
        df = q.spark_fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        if plans_only:
            print(f"{name}: plan written")
            continue
        runs = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            d = q.spark_fn(spark, sf_dir)
            if use_noop:
                d.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = d.count()
            runs.append(time.perf_counter() - t0)
        rs = sorted(runs)
        print(
            f"{name}: median={rs[len(rs)//2]:.3f}s min={rs[0]:.3f}s "
            f"cold={runs[0]:.3f}s rows={n}",
            flush=True,
        )


if __name__ == "__main__":
    main()
