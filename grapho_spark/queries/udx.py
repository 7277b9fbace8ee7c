"""User-defined function surface (SURVEY.md §2.4 — absent in the
reference): one of each kind, all Arrow-vectorized, all with exact
oracles:

- scalar ``pandas_udf`` (cents conversion — integer exact),
- grouped-aggregate ``pandas_udf`` (UDAF: int64 sum, accumulation
  order cannot matter),
- Python UDTF (table function: top terms with ordinals).

The production guidance stands (PERF.md: built-ins first); these
exist to pin the extension API shape and its Arrow batch semantics.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from grapho_spark.queries import query
from grapho_spark.tables import load_table


def _make_udfs():
    """Built lazily: decorating with pandas_udf parses the return type
    through the active SparkContext, so module import must not require
    a session (test collection imports this module sessionless)."""

    @pandas_udf("bigint")
    def to_cents(price: pd.Series) -> pd.Series:
        # half-away-from-zero to match both engines' round()
        return (price * 100).round().astype("int64")

    @pandas_udf("bigint")
    def sum_cents(cents: pd.Series) -> int:  # GROUPED_AGG: series -> scalar
        return int(cents.sum())

    @pandas_udf("bigint")
    def count_rows(cents: pd.Series) -> int:  # GROUPED_AGG (pandas UDAFs
        return int(len(cents))  # cannot mix with JVM aggregates in one agg)

    return to_cents, sum_cents, count_rows


@query(
    "udaf_revenue_cents_by_priority",
    oracle="""
SELECT o_orderpriority,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
""",
)
def udaf_revenue_cents_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF path: a scalar pandas_udf converts prices to integer
    cents (Arrow-vectorized), a grouped-agg pandas_udf sums them —
    int64 all the way, so the Arrow batch/group order cannot change
    the result.

    Scale: grouped-agg pandas UDFs get partial groups per partition
    only when the plan allows partial aggregation; int sums merge
    associatively, the requirement for any distributed UDAF.
    """
    to_cents, sum_cents, count_rows = _make_udfs()
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderpriority", to_cents("o_totalprice").alias("cents"))
        .groupBy("o_orderpriority")
        .agg(
            sum_cents("cents").alias("total_cents"),
            count_rows("cents").alias("n_orders"),
        )
    )


def _make_top_terms_udtf():
    from pyspark.sql.functions import udtf

    @udtf(returnType="term: string, ordinal: int")
    class TopTerms:
        def eval(self, text: str, k: int):
            if text is None:
                return
            for i, term in enumerate(text.strip().lower().split()[:k]):
                yield term, i + 1

    return TopTerms


@query(
    "udtf_leading_terms",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS words
  FROM documents)
SELECT doc_id, words[i] AS term, i AS ordinal
FROM toks, range(1, 4) t(i)
WHERE i <= len(words)
""",
)
def udtf_leading_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): the first 3 terms of each document
    with their 1-based ordinal — one input row fans out to k output
    rows through the UDTF protocol (``eval`` yielding tuples),
    lateral-joined to keep the doc id.

    Scale: UDTFs run per-partition through Arrow like any Python UDF;
    prefer explode for this particular job (the oracle IS the explode
    form) — the query pins the API, not a recommendation.
    """
    TopTerms = _make_top_terms_udtf()
    spark.udtf.register("top_terms", TopTerms)
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT doc_id, t.term, t.ordinal "
        "FROM _udtf_docs, LATERAL top_terms(text, 3) t"
    )
