"""Round-16 optimization invariants.

Pins the internals the second optimization round changed:
- the PQ codebook training + code assignment HOF fold (per-(vector,
  subspace) micro-unit arrays against broadcast codeword arrays)
  produces the bit-identical codebook and codes as the r15 exploded
  (vec,pos)x(code,pos) join chain it replaced;
- materialize()'s bounded scratch-persist FIFO evicts the oldest
  unpinned frame past the cap and never evicts pinned (session-memo)
  frames.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from grapho_spark.session import get_spark

    return get_spark("test_r16_opt")


def _old_codebook(spark, sf_dir, pred=None):
    """The r15 exploded-join training chain, verbatim (the reference
    the HOF fold must equal bit-for-bit)."""
    from grapho_spark.queries import embeddings as E

    expl = E._pq_expl(spark, sf_dir, pred)
    cw = expl.groupBy(
        (F.col("vec_id") % E._ANN_PQ_K).alias("grp"), "sub", "pos"
    ).agg(F.expr(E._MICRO_MEAN_CW_SPARK).alias("cw"))

    def code_dists(book):
        dvl = (F.col("dv") * 1000000).cast("long")
        cwl = (F.col("cw") * 1000000).cast("long")
        return (
            expl.join(F.broadcast(book), ["sub", "pos"])
            .groupBy("vec_id", "sub", "grp")
            .agg(F.sum((dvl - cwl) * (dvl - cwl)).alias("dist"))
        )

    w_code = Window.partitionBy("vec_id", "sub").orderBy("dist", "grp")
    for _ in range(E._ANN_PQ_TRAIN):
        am = (
            code_dists(cw)
            .withColumn("rn", F.row_number().over(w_code))
            .filter(F.col("rn") == 1)
            .select("vec_id", "sub", "grp")
        )
        cw = (
            expl.join(am.withColumnRenamed("grp", "code_grp"), ["vec_id", "sub"])
            .groupBy(F.col("code_grp").alias("grp"), "sub", "pos")
            .agg(F.expr(E._MICRO_MEAN_CW_SPARK).alias("cw"))
        )
    return cw


def _old_encode(spark, sf_dir, book, pred=None):
    from grapho_spark.queries import embeddings as E

    dvl = (F.col("dv") * 1000000).cast("long")
    cwl = (F.col("cw") * 1000000).cast("long")
    dists = (
        E._pq_expl(spark, sf_dir, pred)
        .join(F.broadcast(book), ["sub", "pos"])
        .groupBy("vec_id", "sub", "grp")
        .agg(F.sum((dvl - cwl) * (dvl - cwl)).alias("dist"))
    )
    w_code = Window.partitionBy("vec_id", "sub").orderBy("dist", "grp")
    return (
        dists.withColumn("rn", F.row_number().over(w_code))
        .filter(F.col("rn") == 1)
        .select("vec_id", "sub", F.col("grp").alias("code"))
    )


def _nt(df):
    return [(f.name, f.dataType) for f in df.schema.fields]


@pytest.mark.parametrize("pred", [None, "vec_id % 5 < 4"])
def test_pq_hof_codebook_and_codes_match_exploded_join(spark, pred):
    from grapho_spark.queries import embeddings as E

    old_book = _old_codebook(spark, SF, pred)
    new_book = E._pq16_codebook(spark, SF, pred)
    # name+type equality (nullability differs on the internal pos
    # column — floor().cast() is nullable where posexplode+1 was not —
    # and is erased by the parquet save the consumers read through)
    assert _nt(old_book) == _nt(new_book)
    assert old_book.exceptAll(new_book).count() == 0
    assert new_book.exceptAll(old_book).count() == 0
    assert new_book.count() > 0

    old_codes = _old_encode(spark, SF, old_book, pred)
    new_codes = E._pq_encode(spark, SF, new_book, pred)
    assert _nt(old_codes) == _nt(new_codes)
    assert old_codes.exceptAll(new_codes).count() == 0
    assert new_codes.exceptAll(old_codes).count() == 0


def test_pq_demo_parts_match_exploded_join(spark):
    """The memoized 4-codeword demo-PQ bundle (embedding_pq_adc_knn /
    embedding_ivfpq_knn) must reproduce the r15 exploded-join chain
    bit-for-bit: codes via the HOF argmin, LUT via the q-only join."""
    from grapho_spark.queries import embeddings as E

    e = __import__("grapho_spark.tables", fromlist=["load_table"]).load_table(
        spark, SF, "embeddings"
    )
    expl = e.select("vec_id", F.posexplode("embedding").alias("pos0", "v")).select(
        "vec_id",
        (F.col("pos0") + 1).alias("pos"),
        F.floor(F.col("pos0") / E._PQ_M).cast("int").alias("sub"),
        F.col("v").cast("double").cast("decimal(12,6)").alias("dv"),
    )
    cw = expl.groupBy((F.col("vec_id") % E._PQ_K).alias("grp"), "sub", "pos").agg(
        F.expr(E._MICRO_MEAN_CW_SPARK).alias("cw")
    )
    dvl = (F.col("dv") * 1000000).cast("long")
    cwl = (F.col("cw") * 1000000).cast("long")
    dists = (
        expl.join(F.broadcast(cw), ["sub", "pos"])
        .groupBy("vec_id", "sub", "grp")
        .agg(F.sum((dvl - cwl) * (dvl - cwl)).alias("dist"))
    )
    w_code = Window.partitionBy("vec_id", "sub").orderBy("dist", "grp")
    old_codes = (
        dists.withColumn("rn", F.row_number().over(w_code))
        .filter(F.col("rn") == 1)
        .select("vec_id", "sub", F.col("grp").alias("code"))
    )
    old_lut = dists.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("sub").alias("l_sub"),
        F.col("grp").alias("l_grp"),
        "dist",
    )
    new_codes, new_lut = E._pq_demo_parts(spark, SF)
    assert _nt(old_codes) == _nt(new_codes)
    assert old_codes.exceptAll(new_codes).count() == 0
    assert new_codes.exceptAll(old_codes).count() == 0
    assert _nt(old_lut) == _nt(new_lut)
    assert old_lut.exceptAll(new_lut).count() == 0
    assert new_lut.exceptAll(old_lut).count() == 0
    assert new_codes.count() > 0 and new_lut.count() > 0


def test_bench_final_line_fits_the_driver_tail_window():
    """The driver keeps only the last 2000 bytes of bench stdout
    (BENCH_r14/r15 'tail' are exactly 2000 chars; r06's inlined
    per-query maps overflowed it and parsed=null). The FINAL compact
    line must always fit; the per-query maps ride a separate preceding
    line. Pin the final line's shape below the window with worst-case
    field widths."""
    import json

    worst = {
        "metric": "headline_queries_total",
        "value": 99999.999,
        "unit": "sec",
        "stat": "median_of_3",
        "n_queries": 85,
        "min_total": 99999.999,
        "cold_total": 99999.999,
        "ann_build_sec": 99999.999,
        "wall_sec": 99999.999,
        "sf": 0.001,
        "common_subset_vs_prev": 99.999,
        "common_subset_vs_prev_min": 99.999,
        "quality_vs_prev": 99.999,
        "load_1m": 99.99,
        "run_noise": 99.999,
        "cpu_pressure": 99.999,
        "ratio_note": (
            "hot-box (load_1m_start=99.99, run_noise=99.999, "
            "cpu_pressure=99.999); read the _min ratio"
        ),
        "prev_stamp": "sf0.001_n850",
        "detail": "BENCH_DETAIL.json",
        "per_query": "preceding stdout line + BENCH_DETAIL.json",
    }
    assert len(json.dumps(worst)) < 1900


def test_scratch_persist_fifo_evicts_oldest_keeps_pinned(spark):
    import grapho_spark.sparkutil as su

    # run against a private registry/cap so the session's real scratch
    # state is untouched
    old_list, old_cap = su._SCRATCH_PERSISTS, su._SCRATCH_CAP
    su._SCRATCH_PERSISTS, su._SCRATCH_CAP = [], 3
    try:
        pinned = su.materialize(spark.range(5), pinned=True)
        frames = [su.materialize(spark.range(10 + i)) for i in range(5)]
        # cap 3: the two oldest scratch frames were evicted
        assert len(su._SCRATCH_PERSISTS) == 3
        alive = {id(d) for d in su._SCRATCH_PERSISTS}
        assert {id(f) for f in frames[2:]} == alive
        assert frames[0].storageLevel.useMemory is False  # unpersisted
        assert frames[1].storageLevel.useMemory is False
        assert frames[4].storageLevel.useMemory is True
        # pinned frames are never registered nor evicted
        assert id(pinned) not in alive
        assert pinned.storageLevel.useMemory is True
        # an evicted frame still COMPUTES correctly (plain persist:
        # recompute from lineage, no checkpoint truncation)
        assert frames[0].count() == 10
        # re-materializing the same frame does not double-register
        su.materialize(frames[4])
        assert sum(1 for d in su._SCRATCH_PERSISTS if d is frames[4]) == 1
        # pinning an already-scratch frame upgrades it out of the FIFO
        su.materialize(frames[4], pinned=True)
        assert not any(d is frames[4] for d in su._SCRATCH_PERSISTS)
    finally:
        for d in su._SCRATCH_PERSISTS:
            d.unpersist(blocking=False)
        pinned.unpersist(blocking=False)
        su._SCRATCH_PERSISTS, su._SCRATCH_CAP = old_list, old_cap
