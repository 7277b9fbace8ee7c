"""r10 differential soak: N seeds x M ops of random DML (generator now
emits NOT and parenthesized groups) against the independent model, on a
DURABLE engine with small id_buckets/max_delta_chain so every flush
exercises bucketed partial rewrites, delta chains, compaction and the
staged publish; periodic flushes mid-stream plus an end-of-run REOPEN
(boot recovery over the bucket maps + commit-log replay)."""
import random, shutil, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from test_differential_model import _model_match, _rand_conds, DOMAIN
from grapho_spark.session import get_spark
from grapho_spark.engine import GraphEngine
from grapho_spark.sparkutil import scratch_path

SEEDS = [int(a) for a in sys.argv[1:]] or list(range(200, 212))
N_OPS = 120
spark = get_spark("soak_r10")

def run(seed):
    rng = random.Random(seed)
    data_dir = scratch_path(f"soak_r10_{seed}")
    shutil.rmtree(data_dir, ignore_errors=True)
    # r11: target_bucket_rows makes the soak cross a re-bucket
    # boundary mid-stream (the table outgrows 4 rows/bucket), so
    # partial rewrites, point reads and reopen all run against a
    # GROWN-generation layout for most of each seed; keep_versions
    # makes every flush run retention GC, including the r11
    # leaf-granular shed of owner-only version dirs
    # r13: zone_bloom_rows=0 forces per-leaf blooms on EVERY flushed
    # version, so the random point predicates exercise zone/bloom
    # pruning (manifest reads, pruned mutation scans, _FILES/_ZONES
    # sidecars) against the model on every seed
    # r14: odd seeds force EVERY pruned chain read through the
    # distributed _ZONES probe job (the >10^4-leaf candidate-selection
    # path); even seeds keep the driver bitmap loop — the two paths
    # must be indistinguishable against the model
    eng = GraphEngine(spark, data_dir=data_dir, id_buckets=4,
                      max_delta_chain=2, target_bucket_rows=4,
                      keep_versions=3, zone_bloom_rows=0,
                      bloom_semijoin_leafs=0 if seed % 2 else 4096)
    eng.execute("CREATE NODE D (a: int, b: int, tag: string DEFAULT 'x');")
    model = []
    def insert():
        props = {f: rng.choice(DOMAIN) for f in ("a","b") if rng.random() < 0.85}
        body = ", ".join(f"{k}: {v}" for k,v in props.items())
        eng.execute(f"INSERT NODE D ({body});" if body else "INSERT NODE D;")
        model.append({"a": props.get("a"), "b": props.get("b"), "tag": "x"})
    def update():
        text, conds = _rand_conds(rng); setv = rng.choice(DOMAIN)
        eng.execute(f"UPDATE NODE D SET b: {setv} WHERE {text};")
        for r in model:
            if _model_match(r, conds): r["b"] = setv
    def delete():
        text, conds = _rand_conds(rng)
        eng.execute(f"DELETE NODE D WHERE {text};")
        model[:] = [r for r in model if not _model_match(r, conds)]
    def check():
        text, conds = _rand_conds(rng)
        want = [r for r in model if _model_match(r, conds)]
        got = eng.execute(f"MATCH D WHERE {text} RETURN a, b;")[0].df.collect()
        key = lambda t: tuple((v is None, v is not None and v) for v in t)
        gv = sorted(((r.a, r.b) for r in got), key=key)
        wv = sorted(((r["a"], r["b"]) for r in want), key=key)
        assert gv == wv, (seed, text, gv[:5], wv[:5])
        gd = eng.execute(f"MATCH D WHERE {text} RETURN DISTINCT a, b;")[0].df.collect()
        wset = sorted({(r["a"], r["b"]) for r in want}, key=key)
        assert sorted(((r.a, r.b) for r in gd), key=key) == wset, (seed, text)
    ops = [insert]*5 + [update]*2 + [delete]*1 + [check]*2
    n_flush = 0
    for i in range(N_OPS):
        rng.choice(ops)()
        if i % 24 == 23:
            eng.flush(); n_flush += 1
        if i == N_OPS // 2:
            eng.compact()  # mid-stream maintenance: the re-bucket point
    eng.flush()
    # reopen: boot recovery composes bucket maps + chains identically
    eng2 = GraphEngine(spark, data_dir=data_dir)
    rows = eng2.execute("MATCH D;")[0].df.collect()
    assert len(rows) == len(model), (seed, len(rows), len(model))
    key = lambda t: tuple((v is None, v is not None and v) for v in t)
    gv = sorted(((r.a, r.b) for r in rows), key=key)
    wv = sorted(((r["a"], r["b"]) for r in model), key=key)
    assert gv == wv, (seed, "reopen", gv[:5], wv[:5])
    # chain/path bound held throughout
    for v in eng2.table_versions("node", "D"):
        assert len(eng2._chain_versions("node", "D", v)) <= 3, (seed, v)
    # reopen restored the grown layout n (adaptive re-bucketing)
    bn = eng2.tables[("node", "D")].bucket_n
    assert bn is not None and bn >= 4, (seed, bn)
    shutil.rmtree(data_dir, ignore_errors=True)
    print(f"seed {seed}: OK ({len(model)} rows, {n_flush+1} flushes, reopen ok)", flush=True)

for s in SEEDS:
    run(s)
print("SOAK R10 DONE: all seeds green")
