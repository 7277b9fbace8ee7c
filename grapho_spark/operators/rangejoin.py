"""Bucketed range join: join ``left`` to ``right`` rows whose numeric
``point`` falls in ``[left.lo, left.hi]`` without a cartesian
explosion.

Strategy (the standard distributed range-join decomposition): pick a
bucket width, explode each left interval into the buckets it overlaps
(interval length / width buckets per row — bounded fan-out), hash-join
on the bucket id, then apply the exact range predicate. Catalyst alone
would fall back to BroadcastNestedLoopJoin for a bare range predicate;
this turns it into an equi-join with O(n) shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    lo: str,
    hi: str,
    point: str,
    bucket_width: float,
) -> DataFrame:
    lb = left.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / bucket_width).cast("long"),
                F.floor(F.col(hi) / bucket_width).cast("long"),
            )
        ),
    )
    rb = right.withColumn("_bucket", F.floor(F.col(point) / bucket_width).cast("long"))
    return (
        lb.join(rb, "_bucket")
        .filter((F.col(point) >= F.col(lo)) & (F.col(point) <= F.col(hi)))
        .drop("_bucket")
    )
