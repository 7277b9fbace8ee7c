"""Distributed-build Bloom filter with driver-side O(1) probes.

PySpark does not expose ``DataFrameStatFunctions.bloomFilter`` (JVM
only), so this builds the position set with a Spark aggregation — k
md5-derived hash positions per value, exploded and distincted on the
executors; only the (bounded) distinct-position set is collected —
and probes driver-side with the identical Python hash.

Primary consumer: the engine's UNIQUE/PK insert guard
(engine/engine.py) — a negative probe proves the value absent from
the base table with ZERO Spark jobs; only positive probes (true hits
or false positives, rate ~fpp) pay the exact scan. The reference
records unique IndexSpecs but never builds runtime indexes
(/root/reference/catalog/types.go:49-51); this is the scale-conscious
substitute.

Scale: the build is one distributed pass + a <= min(m, n*k)-int
collect; at 100 TB the same aggregation shape holds (positions merge
associatively). Only false-positive rate degrades with n, never
correctness: ``might_contain`` has no false negatives.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as ST

DEFAULT_M = 1 << 17  # bit-space size
DEFAULT_K = 4  # hash functions

# Types whose Spark cast-to-string matches Python str() exactly —
# bloom probes hash the string form, so representations must agree.
_SAFE_TYPES = (ST.StringType, ST.LongType, ST.IntegerType, ST.ShortType, ST.ByteType)


def _py_positions(value: object, m: int, k: int) -> list[int]:
    return [
        int(hashlib.md5(f"{i}:{value}".encode()).hexdigest()[:15], 16) % m
        for i in range(k)
    ]


def positions_expr(col: str, m: int, k: int) -> str:
    """SQL expression producing the k md5 hash positions of ``col``
    (array<bigint>), the JVM twin of ``_py_positions`` — shared by
    SparkBloom.build and the per-leaf zone blooms (engine/zones.py),
    so one hash convention covers both probe paths."""
    return (
        f"transform(sequence(0, {k - 1}), i -> "
        f"pmod(cast(conv(substring(md5(concat(cast(i as string), ':', "
        f"cast(`{col}` as string))), 1, 15), 16, 10) as bigint), {m}))"
    )


class SparkBloom:
    """Membership sketch: no false negatives, ~fpp false positives."""

    def __init__(self, positions: set[int], m: int = DEFAULT_M, k: int = DEFAULT_K):
        self.positions = positions
        self.m = m
        self.k = k

    @classmethod
    def supports(cls, dtype: ST.DataType) -> bool:
        return isinstance(dtype, _SAFE_TYPES)

    @classmethod
    def build(
        cls, df: DataFrame, col: str, m: int = DEFAULT_M, k: int = DEFAULT_K
    ) -> "SparkBloom":
        dtype = df.schema[col].dataType
        if not cls.supports(dtype):
            raise ValueError(
                f"bloom over {dtype.simpleString()} is unsafe: Spark/Python "
                "string forms may differ (use string/integer columns)"
            )
        pos_expr = positions_expr(col, m, k)
        rows = (
            df.filter(F.col(col).isNotNull())
            .select(F.explode(F.expr(pos_expr)).alias("p"))
            .distinct()
            .collect()
        )
        return cls({r.p for r in rows}, m, k)

    def might_contain(self, value: object) -> bool:
        if value is None:
            return False
        return all(p in self.positions for p in _py_positions(value, self.m, self.k))

    def put(self, value: object) -> None:
        if value is None:
            return
        self.positions.update(_py_positions(value, self.m, self.k))
