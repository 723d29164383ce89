#!/usr/bin/env python
"""Whole-registry correctness sweep → CORRECTNESS_local_full.json.

The external driver checks a rotating 50-query window per round; this
sweep runs EVERY registered query against its DuckDB oracle through
the same contract (driver-style session — NOT the library's tuned
build_session — under a hostile non-UTC timezone) so the artifact
trail shows whole-registry freshness each round (r6 verdict item #9).

Output format mirrors the driver's CORRECTNESS_r{N}.json rows:
{name: {rows_match, schema_match, hash_match, spark_rows,
        oracle_rows, err}} plus a _meta record. "hash_match" here is
exact normalized-sorted-row equality + canonical arrow-dtype parity —
strictly stronger than the driver's order-insensitive value hash.

Run: python local_sweep.py [sf_dir] [session_tz]
     (defaults: /root/testdata/sf0.01, America/Los_Angeles)
Env: SWEEP_CONF="k=v;k=v"  extra Spark confs (e.g. the partition-count
     axis "spark.sql.shuffle.partitions=7;spark.default.parallelism=5"
     or the ANSI axis "spark.sql.ansi.enabled=true")
     SWEEP_MASTER   Spark master (default local[8])
     SWEEP_OUT      output JSON path (default CORRECTNESS_local_full.json)
     SWEEP_ONLY     comma-separated query names — targeted re-check of
                    just-touched queries (r9); default sweeps all

"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    tz = sys.argv[2] if len(sys.argv) > 2 else "America/Los_Angeles"

    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master(
            os.environ.get("SWEEP_MASTER", "local[8]")
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", tz)
        .config("spark.ui.enabled", "false")
        .appName("calorista-local-sweep")
    )
    extra = os.environ.get("SWEEP_CONF", "")
    conf_pairs = [kv.split("=", 1) for kv in extra.split(";") if "=" in kv]
    for k, v in conf_pairs:
        builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from calorista_spark.cache import release_caches
    from calorista_spark.queries import ORACLES, QUERIES
    from tests.oracle_compare import (
        compare_arrow_types,
        run_oracle,
        _norm_rows,
    )

    only = {
        q.strip()
        for q in os.environ.get("SWEEP_ONLY", "").split(",")
        if q.strip()
    }
    names = sorted(only & set(QUERIES)) if only else sorted(QUERIES)
    out: dict[str, dict] = {}
    t_start = time.time()
    for name in names:
        rec: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            df = QUERIES[name](spark, sf_dir)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
            rec["spark_rows"] = len(s_rows)
            if name not in ORACLES:
                rec["err"] = "no_oracle"
                # rows-only entries carry quantified error vs their
                # exact twins (r7 VERDICT #6) — see approx_bands.py
                from calorista_spark.approx_bands import APPROX_BANDS

                if name in APPROX_BANDS:
                    rec["approx_band"] = APPROX_BANDS[name](spark, sf_dir)
            else:
                o_cols, o_rows = run_oracle(ORACLES[name], sf_dir)
                rec["oracle_rows"] = len(o_rows)
                rec["rows_match"] = len(s_rows) == len(o_rows)
                rec["schema_match"] = sorted(s_cols) == sorted(o_cols)
                dtype_problems = compare_arrow_types(
                    df, ORACLES[name], sf_dir
                )
                rec["hash_match"] = (
                    rec["schema_match"]
                    and not dtype_problems
                    and _norm_rows(s_cols, s_rows)
                    == _norm_rows(o_cols, o_rows)
                )
                if dtype_problems:
                    rec["err"] = f"dtype: {dtype_problems[:2]}"
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
        out[name] = rec
        release_caches(spark)
        status = (
            "ok"
            if rec["hash_match"]
            else ("rows-only" if rec["err"] == "no_oracle" else "FAIL")
        )
        if status == "FAIL" and rec["err"] is None:
            status = "MISMATCH"
        print(f"{name}: {status}", file=sys.stderr)

    oracle_green = sum(1 for r in out.values() if r["hash_match"])
    rows_only = sum(1 for r in out.values() if r["err"] == "no_oracle")
    bad = [
        n
        for n, r in out.items()
        if not r["hash_match"] and r["err"] != "no_oracle"
    ]
    # a rows-only query whose quantified band blew its tolerance is a
    # failure too — rows-only must not mean unbounded
    bad += [
        n
        for n, r in out.items()
        if "approx_band" in r and not r["approx_band"]["within_tolerance"]
    ]
    out["_meta"] = {
        "sf_dir": sf_dir,
        "session_tz": tz,
        "extra_conf": dict(conf_pairs),
        "n_queries": len(names),
        "n_registered": len(QUERIES),
        "oracle_green": oracle_green,
        "rows_only": rows_only,
        "failures": bad,
        "elapsed_sec": round(time.time() - t_start, 1),
    }
    path = os.environ.get(
        "SWEEP_OUT",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "CORRECTNESS_local_full.json",
        ),
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(
        json.dumps(
            {"written": path, **out["_meta"]}
        )
    )
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
