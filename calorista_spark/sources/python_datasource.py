"""Spark 4 Python DataSource for the day-payload REST feed
(SURVEY §2.1 S1: "custom Python DataSource (Spark 4
``spark.dataSource``)").

The engine's native-connector face: after ``register(spark)``,

    spark.read.format("food_days")
         .option("fixture_dir", dir)   # or a real endpoint config
         .option("start", "2024-03-01").option("end", "2024-03-31")
         .load()

yields (date, payload) rows with ONE InputPartition PER DAY — Spark
schedules the per-day fetches across executors exactly like the
mapInPandas fan-out in ``rest.py``, but behind the standard source
API (so it composes with ``.schema()``, catalogs, and SQL
``CREATE TABLE ... USING food_days``).

Only the fixture-backed transport is wired in this container; a real
HTTP transport drops into ``_fetch_one`` (with ``with_retries``).
"""

from __future__ import annotations

import datetime
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class DayPartition(InputPartition):
    def __init__(self, date_iso: str):
        self.date_iso = date_iso


def _fetch_one(fixture_dir: str, date_iso: str) -> str | None:
    path = os.path.join(fixture_dir, f"{date_iso}.json")
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        return f.read()


class FoodDaysReader(DataSourceReader):
    def __init__(self, options: dict):
        self.fixture_dir = options["fixture_dir"]
        self.start = datetime.date.fromisoformat(options["start"])
        self.end = datetime.date.fromisoformat(options["end"])
        if self.start > self.end:
            raise ValueError(f"start {self.start} after end {self.end}")

    def partitions(self) -> Sequence[InputPartition]:
        n = (self.end - self.start).days + 1
        return [
            DayPartition((self.start + datetime.timedelta(days=i)).isoformat())
            for i in range(n)
        ]

    def read(self, partition: DayPartition) -> Iterator[tuple]:
        date_iso = partition.date_iso
        yield (
            datetime.date.fromisoformat(date_iso),
            _fetch_one(self.fixture_dir, date_iso),
        )


class FoodDaysDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "food_days"

    def schema(self) -> str:
        return "date date, payload string"

    def reader(self, schema) -> FoodDaysReader:
        return FoodDaysReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(FoodDaysDataSource)
