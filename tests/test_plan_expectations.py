"""CI gate for physical-plan shape: every headline query's plan must
keep the properties PERF.md claims (broadcasts, pushdown, top-k,
partition pruning, DPP).  The matrix lives in
``grapho_spark/plan_expectations.py`` and is shared with the
human-readable ``scripts/explain_audit.py`` report.

A plan regression (a lost broadcast, an unpushed filter) produces
correct answers at test scale and a 100x slowdown at the 100 TB
target, so it must fail CI — not wait for a benchmark round.
"""

from __future__ import annotations

import re

import pytest

from grapho_spark.plan_expectations import PLAN_CHECKS, formatted_plan


@pytest.mark.parametrize("name", sorted(PLAN_CHECKS))
def test_plan_expectation(spark, sf_dir, name):
    from grapho_spark.queries import all_queries

    df = all_queries()[name].spark_fn(spark, sf_dir)
    plan = formatted_plan(df)
    missing = [pat for pat in PLAN_CHECKS[name] if not re.search(pat, plan)]
    assert not missing, (
        f"{name}: plan lost expected operators {missing}\n"
        + "\n".join(
            line
            for line in plan.splitlines()
            if any(k in line for k in ("Join", "Filters", "ReadSchema", "Scan"))
        )[:4000]
    )


NEGATIVE_CHECKS = {
    # the bucketed interval join exists precisely to avoid the
    # quadratic nested-loop plan the raw inequality join would pick
    "events_interval_overlap_join": ["BroadcastNestedLoopJoin", "CartesianProduct"],
    # the prefix ssjoin's candidate stage is an equi-join on the
    # prefix token — never an all-pairs nested loop
    "core_dedup_prefix_ssjoin_pairs": ["CartesianProduct"],
    # GD weights re-enter the plan as LITERALS; a join/broadcast of a
    # weights table would mean the trainer regressed to a weights-as-
    # data design (one extra corpus-wide exchange per iteration)
    "corpus_quality_classifier_gd": ["Join", "CartesianProduct"],
}


@pytest.mark.parametrize("name", sorted(NEGATIVE_CHECKS))
def test_plan_negative_expectation(spark, sf_dir, name):
    from grapho_spark.queries import all_queries

    df = all_queries()[name].spark_fn(spark, sf_dir)
    plan = formatted_plan(df)
    present = [pat for pat in NEGATIVE_CHECKS[name] if re.search(pat, plan)]
    assert not present, f"{name}: forbidden operators in plan: {present}"
