"""Spark 4 Python DataSource: the standard-API face of the day-payload
connector, end to end into the normalizer."""

from __future__ import annotations

import datetime
import json

from calorista_spark.sources.payload import normalize_day_payloads
from calorista_spark.sources.python_datasource import register


def test_datasource_reads_range_and_normalizes(spark, tmp_path):
    d0 = (datetime.date(2024, 3, 1) - datetime.date(1970, 1, 1)).days
    (tmp_path / "2024-03-01.json").write_text(
        json.dumps(
            {
                "food_entries": {
                    "food_entry": [
                        {
                            "food_entry_id": "x1",
                            "date_int": str(d0),
                            "timestamp": "1",
                            "meal": "lunch",
                            "food_entry_name": "n",
                            "food_entry_description": "",
                            "calories": "10",
                            "carbohydrate": "1",
                            "fat": "2",
                            "protein": "3",
                        }
                    ]
                }
            }
        )
    )
    register(spark)
    raw = (
        spark.read.format("food_days")
        .option("fixture_dir", str(tmp_path))
        .option("start", "2024-03-01")
        .option("end", "2024-03-03")
        .load()
    )
    rows = raw.collect()
    assert len(rows) == 3  # one row per day, missing days have null payload
    assert sum(r.payload is not None for r in rows) == 1

    entries = normalize_day_payloads(raw.select("payload")).collect()
    assert len(entries) == 1 and entries[0].food_entry_id == "x1"


def test_datasource_rejects_inverted_range(spark, tmp_path):
    register(spark)
    try:
        (
            spark.read.format("food_days")
            .option("fixture_dir", str(tmp_path))
            .option("start", "2024-03-05")
            .option("end", "2024-03-01")
            .load()
        ).collect()
        raise AssertionError("expected failure")
    except Exception as exc:
        assert "after end" in str(exc)


def test_streaming_datasource_incremental_offsets(spark, tmp_path):
    # ST1 via the DataSource streaming face: pass 1 ingests the
    # initial days; after new day files land, a resumed stream (same
    # checkpoint, file sink) appends ONLY the new days — offset-
    # tracked re-poll with exactly-once output
    fixture = tmp_path / "days"
    fixture.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    (fixture / "2024-03-01.json").write_text('{"a": 1}')
    (fixture / "2024-03-02.json").write_text('{"a": 2}')
    register(spark)

    def run_pass():
        stream = (
            spark.readStream.format("food_days")
            .option("fixture_dir", str(fixture))
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_pass()
    first = sorted(str(r.date) for r in spark.read.parquet(out).collect())
    assert first == ["2024-03-01", "2024-03-02"]

    (fixture / "2024-03-03.json").write_text('{"a": 3}')
    run_pass()
    second = sorted(
        (str(r.date), r.payload) for r in spark.read.parquet(out).collect()
    )
    # exactly one row per day: the resumed stream emitted only 03-03
    assert second == [
        ("2024-03-01", '{"a": 1}'),
        ("2024-03-02", '{"a": 2}'),
        ("2024-03-03", '{"a": 3}'),
    ]

    # ADVICE r01: a day file landing LATE with an EARLIER date (inside
    # the trailing window) must still be ingested — a max-date offset
    # would filter it out forever.
    (fixture / "2024-02-28.json").write_text('{"a": 0}')
    run_pass()
    third = sorted(str(r.date) for r in spark.read.parquet(out).collect())
    assert third == ["2024-02-28", "2024-03-01", "2024-03-02", "2024-03-03"]


def test_stream_offset_state_is_bounded(tmp_path):
    # seen-set pruning: days older than the trailing window drop out of
    # the offset, keeping state O(window) regardless of history length
    from calorista_spark.sources.python_datasource import FoodDaysStreamReader

    fixture = tmp_path / "days"
    fixture.mkdir()
    for i in range(1, 29):
        (fixture / f"2024-01-{i:02d}.json").write_text("{}")
    reader = FoodDaysStreamReader(
        {"fixture_dir": str(fixture), "trailing_days": 7}
    )
    rows, off = reader.read(reader.initialOffset())
    assert len(list(rows)) == 28
    assert off["seen"] == [f"2024-01-{i:02d}" for i in range(21, 29)]
    # a file older than the window is (documented) out of scope
    (fixture / "2024-01-01.json").write_text("{}")
    rows2, off2 = reader.read(off)
    assert list(rows2) == [] and off2["batch"] == []
