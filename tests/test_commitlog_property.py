"""Stateful property test for the commit log: random interleavings of
appends, reopens, rotation, retention and torn-tail crashes must
always satisfy the log's invariants against a plain-Python model —
the same differential-model strategy as tests/test_differential_model.py,
applied to the durability layer itself."""

from __future__ import annotations

import os
import struct

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from grapho_spark.engine.commitlog import CommitLog


class _Model:
    """What the log MUST contain: every durably appended record, in
    order, minus a retained head prefix."""

    def __init__(self):
        self.records: list[str] = []
        self.base = 0  # global index of first retained record


_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.text(
            alphabet=st.characters(codec="utf-8", exclude_characters="\n\r"),
            min_size=0, max_size=40)),
        st.tuples(st.just("reopen"), st.none()),
        st.tuples(st.just("retain"), st.integers(min_value=0, max_value=60)),
        st.tuples(st.just("torn_tail"), st.none()),
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops, fmt=st.sampled_from(["text", "binary"]), seg=st.sampled_from([64, 200, None]))
def test_log_matches_model_under_random_ops(tmp_path_factory, ops, fmt, seg):
    d = str(tmp_path_factory.mktemp("clprop"))
    model = _Model()
    log = CommitLog(d, fmt=fmt, max_segment_bytes=seg)

    for op, arg in ops:
        if op == "append":
            rec = arg
            if fmt == "text":
                # the text encoding's documented contract: a record is
                # one line; embedded newlines are the caller's bug
                rec = rec.replace("\n", " ")
            log.append(rec)
            model.records.append(rec)
        elif op == "reopen":
            log.close()
            log = CommitLog(d, fmt=fmt, max_segment_bytes=seg)
        elif op == "retain":
            if seg is None:
                continue  # single-file logs have nothing sealed
            log.retain_below(arg)
            # the model: retention drops a head prefix, never past arg
            new_base = log.base_offset()
            assert model.base <= new_base <= max(model.base, min(arg, len(model.records)))
            model.base = new_base
        elif op == "torn_tail":
            # crash mid-append: garbage bytes on the ACTIVE file only
            log.close()
            with open(log.path, "ab") as fh:
                fh.write(struct.pack(">I", 999999) if fmt == "binary" else b"torn")
            log = CommitLog(d, fmt=fmt, max_segment_bytes=seg)

    # Invariant: retained records exactly match the model's tail, in
    # order; a torn tail only ever hides NOTHING (it is garbage past
    # the last complete record, stripped by the corruption-stop scan).
    got = log.records()
    assert got == model.records[model.base :]
    assert log.base_offset() + len(got) == len(model.records)
    log.close()

    # Invariant: a fresh handle (full recovery path) agrees.
    log2 = CommitLog(d, fmt=fmt, max_segment_bytes=seg)
    assert log2.records() == model.records[model.base :]
