#!/usr/bin/env python
"""Compute-bound core-scaling probe (r15 — VERDICT r14 #7).

The driver's own 8-vs-32-core bench block is SATURATED at sf0.1:
nearly every registered query is dominated by fixed driver/job-setup
overhead (~0.6 s calibration floor), so per-query core ratios cluster
around 1.0 and certify nothing about parallelism. This probe runs a
small set of representative shuffle/compute-heavy operator shapes over
DETERMINISTIC 10M+-row synthetic inputs (generated in-plan by
spark.range — no testdata dependency, no disk, nothing cached across
runs), sized so each probe runs seconds at 8 cores, and reports the
8-core/32-core wall ratio per probe.

Run:  python core_scaling.py            # spawns local[8] + local[32] children
      python core_scaling.py --child N  # one session at local[N] (internal)

Writes CORE_SCALING_r{round}.json-style output to stdout (one JSON
line) — save it as the round artifact. Expected: ratio >= ~2 at 4x
cores for every probe (perfect scaling would be 4.0; shuffle write/read
and task scheduling keep real ratios below that).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_ROWS = 20_000_000  # agg/rank probes
N_DOCS = 150_000  # minhash/band probe (~40 words -> ~5.7M shingles)


def _probes(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from calorista_spark.operators.ranks import global_row_number
    from calorista_spark.operators.similarity import (
        lsh_candidate_pairs,
        minhash_band_keys,
    )

    def agg_shuffle():
        # high-cardinality groupBy over 20M rows: md5-derived keys so
        # the map side actually computes, partial agg combines
        df = spark.range(N_ROWS).select(
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 6), 16, 10)
            .cast("long")
            .alias("k"),
            (F.col("id") % 97).alias("v"),
        )
        return df.groupBy("k").agg(
            F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
        )

    def rank_two_pass():
        # the scalable two-pass global rank over 10M rows
        df = spark.range(N_ROWS // 2).select(
            F.col("id"),
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
            .cast("long")
            .alias("val"),
        )
        return global_row_number(df, ["val", "id"])

    def neardup_band():
        # synthetic corpus: 150k docs x 40 words from a 50k vocab,
        # deterministic (md5 of (id*41+i)); the minhash wide aggregate
        # + band join is the registry's near-dup shape
        words = F.transform(
            F.sequence(F.lit(1), F.lit(40)),
            lambda i: F.substring(
                F.md5(((F.col("id") * 41 + i) % 50_000).cast("string")), 1, 8
            ),
        )
        docs = spark.range(N_DOCS).select(
            F.col("id").alias("doc_id"),
            F.array_join(words, " ").alias("text"),
        )
        bands = minhash_band_keys(
            docs, "doc_id", "text", num_hashes=16, n=3, rows_per_band=4
        )
        return lsh_candidate_pairs(bands, "doc_id")

    def window_sessions():
        # per-user ordered window over 20M events, 100k users
        df = spark.range(N_ROWS).select(
            (F.col("id") % 100_000).alias("user_id"),
            ((F.col("id") * 2654435761) % 86_400_000).alias("ts"),
        )
        w = Window.partitionBy("user_id").orderBy("ts")
        return df.select(
            "user_id",
            (F.col("ts") - F.lag("ts", 1).over(w)).alias("gap"),
        ).groupBy("user_id").agg(F.max("gap").alias("max_gap"))

    return {
        "agg_shuffle": agg_shuffle,
        "rank_two_pass": rank_two_pass,
        "neardup_band": neardup_band,
        "window_sessions": window_sessions,
    }


def _run_child(cores: int) -> dict[str, float]:
    from calorista_spark.session import build_session

    spark = build_session(
        app_name=f"core-scaling-{cores}",
        master=f"local[{cores}]",
        # a fresh child process launches its own JVM, so driver.memory
        # is still settable here: 32 concurrent 10M-row sort tasks
        # blow the 1g default heap (local mode holds every task's
        # buffers in the one driver JVM)
        extra_conf={"spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM so probe 1 is not charged codegen startup
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    out: dict[str, float] = {}
    for name, build in _probes(spark).items():
        spark.sparkContext.setJobDescription(f"core-scaling: {name}")
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            from calorista_spark.cache import release_caches

            release_caches(spark)  # rank ops' staged persist
        out[name] = round(min(samples), 3)  # min: least-contended sample
    spark.stop()
    return out


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        print(json.dumps(_run_child(int(sys.argv[2]))))
        return
    results: dict[str, dict[str, float]] = {}
    for cores in (8, 32):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cores)],
            capture_output=True,
            text=True,
            check=True,
        )
        results[str(cores)] = json.loads(proc.stdout.strip().splitlines()[-1])
    ratios = {
        name: round(results["8"][name] / results["32"][name], 2)
        for name in results["8"]
        if results["32"].get(name)
    }
    print(
        json.dumps(
            {
                "probe_rows": N_ROWS,
                "probe_docs": N_DOCS,
                "sec_8_cores": results["8"],
                "sec_32_cores": results["32"],
                "ratio_8_over_32": ratios,
                "note": (
                    "compute-bound synthetic probes (spark.range, no "
                    "testdata); ratio ~4.0 = perfect scaling at 4x cores"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
