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

from calorista_spark.cache import cached_rdd_count, release_caches  # noqa: E402
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
    try:
        QUERIES["daily_totals"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception as exc:  # noqa: BLE001 — warmup failure is non-fatal
        print(f"warmup failed: {exc!r}", file=sys.stderr)
    # r15 (VERDICT r14 #1, DISCLOSED methodology change — see
    # OPTIMIZATION_r15.md): the first parquet WRITE in a JVM pays
    # ~0.8-1 s of one-time write-path class loading that rounds 1-14
    # charged to whichever store_* fixture happened to run first
    # (alphabetical accident, not that query's cost). Absorb it here,
    # symmetric with the read-path warmup above. This writes 100
    # synthetic rows to a throwaway temp dir — no testdata-derived
    # result is persisted or reused.
    try:
        import shutil
        import tempfile

        wdir = tempfile.mkdtemp(prefix="bench_write_warmup_")
        spark.range(100).write.mode("overwrite").parquet(
            os.path.join(wdir, "w")
        )
        shutil.rmtree(wdir, ignore_errors=True)
    except Exception as exc:  # noqa: BLE001
        print(f"write warmup failed: {exc!r}", file=sys.stderr)

    # Fixed-cost calibration (r6, VERDICT advice): a data-independent
    # probe whose cost is pure engine+machine, so rounds can normalize
    # away environment drift (r3→r5 showed a ~1.4× uniform inflation
    # on untouched queries). r10 (VERDICT r9 #4): the r8→r9 comparison
    # showed a single-point probe is itself the weakest link — a
    # one-shot median-of-3 at startup swung 0.43↔0.63 across rounds
    # and produced a phantom uniform ~1.45× "regression" on every
    # untouched query. The probe is now INTERLEAVED through the bench
    # (one sample at start, one every PROBE_EVERY queries, one at the
    # end), so it samples the same machine-load regime the queries ran
    # under; the summary records every sample and the relative spread,
    # and cross-round normalized comparisons should be trusted only
    # when the spread is small (the samples agree on the regime).
    def _probe_once() -> float:
        t0 = time.perf_counter()
        spark.range(10_000_000).selectExpr(
            "count(distinct id % 1000) as c", "sum(id) as s"
        ).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # 3 warm startup samples (comparable to the r6-r9 probe) ...
    calibration_samples = [round(_probe_once(), 4) for _ in range(3)]

    PROBE_EVERY = 40  # ... plus ≥ (n_queries/40 + 1) interleaved ones

    # r11 (VERDICT r10 #3): every query runs N_PASSES times — one cold
    # pass (headline `value`, comparable to BENCH_r01..r10) plus warm
    # passes — and the summary carries per-query MEDIANS, so
    # cross-round regression calls no longer ride single samples
    # inside a noisy calibration band. One query crashing must never
    # abort the run: record the error, keep timing the rest, and emit
    # the summary line LAST so a tail-truncated capture still contains
    # the total.
    N_PASSES = 3
    # soft wall-clock budget: if a pass boundary finds the bench past
    # it (slow machine / bigger sf), later passes are skipped and the
    # medians simply ride fewer samples — the summary always ships
    budget_sec = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "1200"))
    bench_t0 = time.perf_counter()
    samples_by_query: dict[str, list[float]] = {}
    # `errors` and `queries`/n_ok stay DISJOINT (ADVICE r11): a query
    # that succeeded cold but failed on a warm pass keeps its cold
    # sample (it IS a valid headline measurement) and the later failure
    # is recorded under `warm_errors` instead — never in `errors`, so
    # n_ok + n_err never exceeds the registry size.
    errors: dict[str, str] = {}
    warm_errors: dict[str, str] = {}
    probe_tick = 0
    passes_run = 0
    for pass_no in range(N_PASSES):
        if pass_no > 0 and time.perf_counter() - bench_t0 > budget_sec:
            break
        passes_run += 1
        for name in sorted(QUERIES):
            if name in errors or name in warm_errors:
                continue
            probe_tick += 1
            if probe_tick % PROBE_EVERY == 0:
                calibration_samples.append(round(_probe_once(), 4))
            t0 = time.perf_counter()
            try:
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # noqa: BLE001
                msg = f"{type(exc).__name__}: {exc}"[:500]
                if name in samples_by_query:
                    warm_errors[name] = msg
                else:
                    errors[name] = msg
                print(f"FAILED {name}: {msg}", file=sys.stderr)
                release_caches(spark)
                continue
            samples_by_query.setdefault(name, []).append(
                round(time.perf_counter() - t0, 4)
            )
            # cache-hygiene epilogue (r7): the persisting ops (two-pass
            # ranks, doc_ccnet_buckets, iterative localCheckpoints) are
            # reclaimed after each materialization, so a full-registry
            # run carries no net cache growth (cached_rdds_end == 0).
            release_caches(spark)

    calibration_samples.append(round(_probe_once(), 4))
    # cold pass = sample[0] of each query: comparable to prior rounds
    timings = {n: s[0] for n, s in samples_by_query.items()}
    total = round(sum(timings.values()), 4)
    medians = {
        n: sorted(s)[len(s) // 2] for n, s in samples_by_query.items()
    }
    total_median = round(sum(medians.values()), 4)
    # r13 (VERDICT r12 #3): cold/warm split. The first sample of a
    # fixture-building query (store_* family) pays a one-time shared
    # fixture cost that polluted 3-sample medians under contention —
    # the warm median (first sample EXCLUDED, needs >= 2 passes)
    # isolates the steady-state read-path cost the plan audit talks
    # about, and the cold-warm delta is the attributable fixture cost.
    warm_medians = {
        n: sorted(s[1:])[len(s[1:]) // 2]
        for n, s in samples_by_query.items()
        if len(s) >= 2
    }
    total_warm_median = round(sum(warm_medians.values()), 4)
    fixture_overhead = {
        n: round(s[0] - warm_medians[n], 4)
        for n, s in samples_by_query.items()
        if n in warm_medians and s[0] - warm_medians[n] > 0.5
    }

    # Calibration normalization (r7 VERDICT item #5): the probe above
    # measures pure engine+machine cost; CALIBRATION_REF is the probe's
    # median on an unloaded builder run (r7 clean tree: 0.438-0.472
    # across rounds 5-7 → 0.45). value_normalized rescales the total
    # to that reference load, so round-over-round comparisons are
    # self-describing — a +9% raw delta with flat normalized value is
    # ambient load, not a plan regression.
    CALIBRATION_REF = 0.45
    samples = sorted(calibration_samples)
    calibration = round(samples[len(samples) // 2], 4)  # median of ALL
    spread = (
        round((samples[-1] - samples[0]) / calibration, 4)
        if calibration > 0
        else None
    )
    normalized = (
        round(total * CALIBRATION_REF / calibration, 4)
        if calibration > 0
        else None
    )

    # Key order matters: the driver may keep only the TAIL of stdout,
    # so the long per-query dict goes first and the headline
    # metric/value fields go last, surviving front-truncation.
    summary = {
        "queries": timings,
        "per_query_median_sec": medians,
        "per_query_warm_median_sec": warm_medians,
        "value_warm_median_sec": total_warm_median,
        # first-pass-minus-warm deltas > 0.5 s: one-time fixture/build
        # cost attribution (reads ~0 for pure scan queries)
        "fixture_overhead_sec": fixture_overhead,
        **({"errors": errors} if errors else {}),
        **({"warm_errors": warm_errors} if warm_errors else {}),
        "n_passes": passes_run,
        "value_median_sec": total_median,
        "metric": "total wall-clock for the SURVEY §2 query set",
        "unit": "sec",
        "calibration_sec": calibration,
        "calibration_samples": calibration_samples,
        "calibration_spread": spread,
        "calibration_ref": CALIBRATION_REF,
        "value_normalized": normalized,
        "cached_rdds_end": cached_rdd_count(spark),
        "sf": _sf_of(sf_dir),
        "n_ok": len(timings),
        "n_err": len(errors),
        "value": total,
    }
    spark.stop()
    # r14 (VERDICT r13 #5): the driver keeps only a 2000-char TAIL of
    # stdout, which silently discarded the per-query medians — persist
    # the COMPLETE summary as a tracked artifact so cross-round
    # per-query regression checks never require a re-run. The path is
    # overridable for tests; the repo copy is committed per round as
    # BENCH_full_r{N}.json.
    full_path = os.environ.get(
        "SPARK_GRAFT_BENCH_FULL",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH_full_latest.json",
        ),
    )
    try:
        with open(full_path, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:
        print(f"could not persist full bench JSON: {exc!r}", file=sys.stderr)
    sys.stdout.flush()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
