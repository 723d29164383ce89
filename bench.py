#!/usr/bin/env python
"""Benchmark harness: run the full registered query set at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <float>}

Each query executes through a noop sink so the measured time is plan
execution (scan→shuffle→agg), not driver-side row transfer. A tiny
warmup query absorbs JVM/codegen startup so per-query numbers are
comparable across rounds.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from calorista_spark.queries import QUERIES  # noqa: E402
from calorista_spark.session import build_session  # noqa: E402


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="calorista-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + codegen + parquet footer caches
    QUERIES["daily_totals"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total wall-clock for the SURVEY §2 query set",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_of(sf_dir),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
