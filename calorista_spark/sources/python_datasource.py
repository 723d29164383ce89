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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


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


class FoodDaysStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the connector (SURVEY §2.10 ST1): each
    micro-batch picks up day files that appeared after the committed
    offset — the reference's 30-min re-poll loop (README.md:65) as a
    real Structured Streaming source with exactly-once offsets.

    A max-date offset alone would drop a day file that lands *later*
    with an *earlier* date (the reference re-polls a trailing range for
    exactly this reason), so the offset carries the set of days already
    emitted inside a bounded trailing window:

        {"seen": [iso-days within window], "batch": [this batch's days]}

    A file is ingested when its day is not in ``seen`` and not older
    than ``trailing_days`` behind the newest seen day — late backfills
    inside the window are picked up on any later poll; ``seen`` is
    pruned to the window so offset state stays O(window). ``batch``
    makes ``readBetweenOffsets`` an exact, deterministic replay.
    """

    #: how far behind the newest ingested day a late file may land
    TRAILING_DAYS = 35

    def __init__(self, options: dict):
        self.fixture_dir = options["fixture_dir"]
        self.trailing_days = int(options.get("trailing_days", self.TRAILING_DAYS))

    def initialOffset(self) -> dict:
        return {"seen": [], "batch": []}

    def _all_days(self) -> list[str]:
        return sorted(
            f[: -len(".json")]
            for f in os.listdir(self.fixture_dir)
            if f.endswith(".json")
        )

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        seen = set(start.get("seen", []))
        horizon = "1970-01-01"
        if seen:
            horizon = (
                datetime.date.fromisoformat(max(seen))
                - datetime.timedelta(days=self.trailing_days)
            ).isoformat()
        new_days = [d for d in self._all_days() if d not in seen and d >= horizon]
        merged = seen | set(new_days)
        if merged:
            keep_from = (
                datetime.date.fromisoformat(max(merged))
                - datetime.timedelta(days=self.trailing_days)
            ).isoformat()
            merged = {d for d in merged if d >= keep_from}
        end = {"seen": sorted(merged), "batch": new_days}
        # a LIST, not a generator: the runner pickles prefetched rows
        rows = [
            (
                datetime.date.fromisoformat(d),
                _fetch_one(self.fixture_dir, d),
            )
            for d in new_days
        ]
        return iter(rows), end

    def readBetweenOffsets(
        self, start: dict, end: dict
    ) -> Iterator[tuple]:
        for d in end.get("batch", []):
            yield (
                datetime.date.fromisoformat(d),
                _fetch_one(self.fixture_dir, d),
            )


class FoodDaysDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "food_days"

    def schema(self) -> str:
        return "date date, payload string"

    def reader(self, schema) -> FoodDaysReader:
        return FoodDaysReader(self.options)

    def simpleStreamReader(self, schema) -> FoodDaysStreamReader:
        return FoodDaysStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(FoodDaysDataSource)
