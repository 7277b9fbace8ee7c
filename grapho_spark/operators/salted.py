"""Skew-salted aggregation and join (PERF.md skew rule).

AQE's skew-join splitting handles most cases at runtime; explicit
salting remains the tool for (a) skewed AGGREGATIONS (AQE does not
split those) and (b) engines/paths where AQE is off. Pattern:

- salted aggregation: two-phase — partial agg on (key, salt), then
  final agg on key. The hot key's rows spread over ``n_salts``
  reducers in phase one.
- salted join: replicate the small side ``n_salts`` times (one copy
  per salt), salt the big side randomly-but-deterministically (hash of
  a unique column), join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(unique_col: str, n_salts: int) -> Column:
    # deterministic pseudo-random salt: stable across retries/engines
    return F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts)).alias("_salt")


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    unique_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe sum: groupBy(key, salt) -> groupBy(key).

    The value column should already be in an exactly-summable type
    (decimal/long) so the two-phase split cannot change results.
    """
    salted = df.withColumn("_salt", _salt_col(unique_col, n_salts))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.sum(value_col).alias("_partial")
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias(f"sum_{value_col}"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    unique_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    per salt, join on (key, salt). Output = plain join on ``key``.

    Only join types where every output row originates from (at most)
    one big-side row are allowed: replicating the small side n_salts
    times would emit unmatched small-side rows once per salt under
    right/full joins.
    """
    allowed = ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
               "left_anti", "leftanti", "semi", "anti")
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {allowed}, not {how!r}: replicated "
            "small-side rows would duplicate right/full-join output"
        )
    big_salted = big.withColumn("_salt", _salt_col(unique_col, n_salts))
    small_rep = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_salted.join(small_rep, [key, "_salt"], how).drop("_salt")
