"""Cross-engine pins for the r8e arithmetic protocols: the signed
half-up micro-unit division, the CMS md5 bucket hash, and the GD
sigmoid round-trip must produce IDENTICAL values on Spark and DuckDB
for adversarial inputs (exact half boundaries, negatives, unicode) —
the parity suite only exercises them on fixture data; these tests hit
the corners the fixtures may miss."""

from __future__ import annotations

import random

import duckdb
import pytest

from grapho_spark.queries.curation import _M, _gd_sigmoid, _shu
from grapho_spark.queries.text import CMS_D, CMS_W, _cms_bucket_duck, _cms_bucket_spark


def _py_half_up(a: int, d: int) -> int:
    """Reference: round-half-away-from-zero of a/d in exact integers."""
    return (2 * a + d) // (2 * d) if a >= 0 else -((2 * -a + d) // (2 * d))


def test_shu_matches_python_and_duckdb(spark):
    rng = random.Random(8)
    cases = [(a, d) for a in range(-7, 8) for d in (1, 2, 3, 7)]
    cases += [(rng.randint(-10**14, 10**14), rng.randint(1, 10**9)) for _ in range(400)]
    # exact .5 boundaries in both signs — where truncate/floor diverge
    cases += [(d * k + (d // 2), d) for d in (2, 10, 10**6) for k in (-3, -1, 0, 1, 3)]
    df = spark.createDataFrame(cases, "a long, d long")
    got = [
        r.v
        for r in df.selectExpr(f"{_shu('a', 'd', 'div')} AS v", "a", "d")
        .orderBy("a", "d")
        .collect()
    ]
    want = [_py_half_up(a, d) for a, d in sorted(cases)]
    assert got == want
    con = duckdb.connect()
    duck = [
        con.execute(f"SELECT {_shu(str(a), str(d), '//')}").fetchone()[0]
        for a, d in sorted(cases)[:80]
    ]
    assert duck == want[:80]


def test_cms_bucket_cross_engine(spark):
    rng = random.Random(8)
    words = ["", "a", "the", "naïve", "東京", "x" * 200] + [
        "".join(rng.choice("abcdefghij -._€") for _ in range(rng.randint(1, 30)))
        for _ in range(200)
    ]
    words = sorted(set(words) - {""})  # empty string never tokenizes
    df = spark.createDataFrame([(w,) for w in words], "w string")
    exprs = [f"{_cms_bucket_spark('w', j)} AS b{j}" for j in range(CMS_D)]
    got = {
        r.w: tuple(r[f"b{j}"] for j in range(CMS_D))
        for r in df.selectExpr("w", *exprs).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS w", [words])
    duck = {
        w: tuple(bs)
        for w, bs in con.execute(
            "SELECT w, list(b ORDER BY j) FROM ("
            f"SELECT w, j, {_cms_bucket_duck('w')} AS b "
            "FROM t, (SELECT unnest([0,1,2,3]) AS j)) GROUP BY w"
        ).fetchall()
    }
    assert got == duck
    assert all(0 <= b < CMS_W for bs in got.values() for b in bs)


def test_gd_sigmoid_cross_engine(spark):
    # micro-logit grid spanning the live range ±8, plus adversarial
    # near-half points; one libm exp() per value is the protocol's only
    # float op — this pins that Spark and DuckDB agree after the round
    pos = list(range(0, 8 * _M + 1, 137_731)) + [0, 1, 693_147, 8 * _M]
    zs = sorted({z for p in pos for z in (p, -p)})
    df = spark.createDataFrame([(z,) for z in zs], "z long")
    got = {r.z: r.s for r in df.selectExpr("z", f"{_gd_sigmoid('z')} AS s").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS z", [zs])
    duck = dict(con.execute(f"SELECT z, {_gd_sigmoid('z')} FROM t").fetchall())
    assert got == duck
    assert got[0] == 500_000  # sigmoid(0) is exact
    for z in zs:  # symmetry of the rounded sigmoid
        assert got[z] + got[-z] == pytest.approx(_M, abs=1)


def test_cdc_chunking_is_insertion_robust():
    """The property text_cdc_chunking exists for: one inserted token
    shifts every fixed-size chunk after the edit point, but changes
    only O(1) content-defined chunks."""
    import hashlib

    from grapho_spark.queries.text import CDC_MOD

    def h(prev: str, w: str) -> int:
        return int(hashlib.md5(f"cdc:{prev}|{w}".encode()).hexdigest()[:8], 16)

    def cdc_chunks(words: list[str]) -> list[str]:
        out, cur, prev = [], [], None
        for w in words:
            if prev is None or h(prev, w) % CDC_MOD == 0:
                if cur:
                    out.append(" ".join(cur))
                cur = []
            cur.append(w)
            prev = w
        if cur:
            out.append(" ".join(cur))
        return out

    def fixed_chunks(words: list[str], k: int = CDC_MOD) -> list[str]:
        return [" ".join(words[i : i + k]) for i in range(0, len(words), k)]

    rng_words = [f"w{(i * 2654435761) % 997}" for i in range(600)]
    edited = rng_words[:5] + ["INSERTED"] + rng_words[5:]

    base_cdc, edit_cdc = set(cdc_chunks(rng_words)), set(cdc_chunks(edited))
    base_fix, edit_fix = set(fixed_chunks(rng_words)), set(fixed_chunks(edited))

    cdc_survive = len(base_cdc & edit_cdc) / len(base_cdc)
    fix_survive = len(base_fix & edit_fix) / len(base_fix)
    assert cdc_survive > 0.9  # only the edited chunk (and a neighbor) move
    assert fix_survive < 0.2  # everything after token 5 shifted
