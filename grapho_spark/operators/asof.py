"""Generic as-of join: for each left row, the most recent right row
with ``right.on <= left.on`` (strictly ``<`` with ``allow_exact=False``),
per key group.

Implementation is the union-window pattern (no range join, no
quadratic blowup): tag both sides, union on (key, on), carry the last
right value forward with ``last(..., ignorenulls)`` over a single
window, keep left rows. One shuffle on the key — the shape that
survives 100 TB (contrast: a range-condition join explodes on dense
keys; ``pd.merge_asof`` inside ``applyInPandas`` is the fallback when
the right payload is too wide to union).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    value_cols: list[str] | None = None,
    allow_exact: bool = True,
    suffix: str = "_asof",
    tolerance: object | None = None,
) -> DataFrame:
    """Return ``left`` with, for each row, the latest ``right`` values
    at or before ``left.on`` within the same ``by`` group.

    ``value_cols``: right columns to carry (default: all non-key,
    non-on columns). Carried columns are renamed ``<col><suffix>``.

    ``tolerance``: maximum lookback (pandas ``merge_asof`` semantics) —
    a match older than ``left.on - tolerance`` is nulled out. Must be
    comparable with ``left.on - right.on`` (a number for numeric
    ``on``; ``F.expr("INTERVAL ...")`` for timestamps). The matched
    right ``on`` is exposed as ``<on><suffix>`` when set.
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in by_cols + [on]]
    carried = list(value_cols)
    if tolerance is not None:
        # carry the matched right `on` so the lookback bound can be
        # applied after the window pass
        right = right.withColumn(f"__on_src_{on}", F.col(on))
        carried = carried + [f"__on_src_{on}"]

    l_tag = left.withColumn("_side", F.lit(1))
    for c in carried:
        new = f"{c}{suffix}"
        l_tag = (
            l_tag.withColumnRenamed(c, f"{c}__left_orig")
            if c in l_tag.columns
            else l_tag
        )
        l_tag = l_tag.withColumn(new, F.lit(None).cast(dict(right.dtypes)[c]))
    r_tag = right.select(
        *by_cols,
        F.col(on).alias(on),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in carried],
    )

    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # rights sort before lefts at equal `on` iff exact matches count
    order = [F.col(on), F.col("_side") if allow_exact else (-F.col("_side"))]
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in carried:
        new = f"{c}{suffix}"
        unioned = unioned.withColumn(
            new,
            F.when(F.col("_side") == 0, F.col(new)).otherwise(F.lit(None)),
        )
        unioned = unioned.withColumn(new, F.last(new, ignorenulls=True).over(w))

    out = unioned.filter(F.col("_side") == 1).drop("_side")
    if tolerance is not None:
        on_src = f"__on_src_{on}{suffix}"
        stale = F.col(on_src).isNull() | (
            (F.col(on) - F.col(on_src)) > F.lit(tolerance)
        )
        for c in value_cols:
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(stale, F.lit(None)).otherwise(F.col(f"{c}{suffix}")),
            )
        out = out.withColumn(
            on_src, F.when(stale, F.lit(None)).otherwise(F.col(on_src))
        ).withColumnRenamed(on_src, f"{on}{suffix}")
    for c in carried:
        if f"{c}__left_orig" in out.columns:
            out = out.withColumnRenamed(f"{c}__left_orig", c)
    return out
