"""CDC bridge tests: engine commit log -> immutable segments ->
Structured Streaming file source -> per-table change counts."""

from __future__ import annotations

from grapho_spark.engine import GraphEngine
from grapho_spark.streaming import (
    cdc_stream,
    changes_per_table,
    export_cdc_segments,
    run_to_memory,
)


def test_cdc_export_and_stream(spark, tmp_path):
    d = str(tmp_path / "cdcdb")
    eng = GraphEngine(spark, data_dir=d)
    eng.execute(
        "CREATE NODE P (name: string, age: int);"
        "INSERT NODE P (name: 'a', age: 1);"
        "INSERT NODE P (name: 'b', age: 2);"
        "UPDATE NODE P SET age: 9 WHERE name: 'a';"
        "DELETE NODE P WHERE name: 'b';"
    )
    n = export_cdc_segments(eng)
    assert n == 4  # DDL goes to the catalog log, not the commit log

    out = run_to_memory(changes_per_table(cdc_stream(spark, d)), "complete")
    counts = {(r.table, r.op): r.n_changes for r in out.collect()}
    assert counts == {("P", "insert"): 2, ("P", "update"): 1, ("P", "delete"): 1}

    # nothing new: no empty segment is written
    assert export_cdc_segments(eng) == 0

    # incremental: later commits land in a second immutable segment
    eng.execute("INSERT NODE P (name: 'c', age: 3);")
    assert export_cdc_segments(eng) == 1
    out2 = run_to_memory(changes_per_table(cdc_stream(spark, d)), "complete")
    counts2 = {(r.table, r.op): r.n_changes for r in out2.collect()}
    assert counts2[("P", "insert")] == 3
    # seq ordering survives the export
    assert max(r.last_seq for r in out2.collect()) >= 5
