"""Regression tests for the fixture loader's timestamp normalization.

The driver has regenerated the fixtures with different parquet
timestamp encodings across rounds (TIMESTAMP(NANOS) surfaced as raw
longs, then plain timestamp[us] read as TIMESTAMP_NTZ). The loader
must normalize every encoding to a plain ``timestamp`` column with
identical microsecond values — ``unix_micros``/``withWatermark``
reject NTZ and the JSON writer silently truncates it.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from grapho_spark.tables import load_stream, load_table

TS_VALUES_US = [
    1_704_103_470_589_998,  # 2024-01-01T10:44:30.589998 — sub-ms matters
    1_704_000_000_000_000,
    1_735_689_599_999_999,
]


def _write_events(tmp_path, unit: str, tz: str | None) -> str:
    arr = pa.array(TS_VALUES_US, type=pa.int64()).cast(pa.timestamp("us"))
    if unit != "us":
        arr = arr.cast(pa.timestamp(unit))
    if tz is not None:
        arr = arr.cast(pa.timestamp(unit, tz=tz))
    table = pa.table(
        {"event_id": pa.array([1, 2, 3], type=pa.int64()), "ts": arr}
    )
    sf_dir = str(tmp_path / f"sf_{unit}_{tz or 'ntz'}")
    os.makedirs(sf_dir, exist_ok=True)
    pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


@pytest.mark.parametrize(
    "unit,tz",
    [
        ("us", None),  # current fixtures: TIMESTAMP_NTZ in Spark 4
        ("ns", None),  # legacy fixtures: TIMESTAMP(NANOS) -> nanosAsLong
        ("us", "UTC"),  # ordinary tz-aware parquet
    ],
)
def test_load_table_normalizes_timestamp_encoding(spark, tmp_path, unit, tz):
    sf_dir = _write_events(tmp_path, unit, tz)
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [
        r.us
        for r in df.select(F.unix_micros("ts").alias("us"))
        .orderBy("us")
        .collect()
    ]
    assert got == sorted(TS_VALUES_US)


def test_load_table_values_survive_collection(spark, tmp_path):
    sf_dir = _write_events(tmp_path, "us", None)
    df = load_table(spark, sf_dir, "events")
    row = df.orderBy("event_id").first()
    # Session is UTC-pinned: the collected naive datetime must carry
    # the exact microseconds (truncation to ms was the r4 silent bug).
    assert row.ts == datetime.datetime(2024, 1, 1, 10, 4, 30, 589998)


def test_load_stream_normalizes_ntz_for_watermark(spark, tmp_path):
    sf_dir = _write_events(tmp_path, "us", None)
    stream = load_stream(spark, sf_dir, "events")
    assert dict(stream.dtypes)["ts"] == "timestamp"
    # withWatermark throws EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on NTZ;
    # constructing the watermarked aggregation is the regression check.
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .count()
    )
    q = agg.writeStream.format("memory").queryName(
        "ntz_watermark_smoke"
    ).outputMode("update").start()
    try:
        q.processAllAvailable()
        n = spark.sql("SELECT count(*) AS c FROM ntz_watermark_smoke").first().c
        assert n >= 1
    finally:
        q.stop()


def test_xml_requires_rowtag_and_roundtrips(spark, tmp_path):
    from grapho_spark.sources import read_table, write_table

    df = spark.createDataFrame(
        [(1, "a<b&c"), (2, "plain")], "id long, txt string"
    )
    with pytest.raises(ValueError, match="rowTag"):
        write_table(df, str(tmp_path / "x"), fmt="xml")
    write_table(df, str(tmp_path / "x"), fmt="xml", rowTag="row")
    with pytest.raises(ValueError, match="rowTag"):
        read_table(spark, str(tmp_path / "x"), fmt="xml", schema=df.schema)
    back = read_table(
        spark, str(tmp_path / "x"), fmt="xml", schema=df.schema, rowTag="row"
    )
    # XML escaping must round-trip special characters losslessly.
    assert sorted(r.txt for r in back.collect()) == ["a<b&c", "plain"]
