#!/usr/bin/env python
"""Scaling-exponent record for the heaviest queries (r7 VERDICT #4).

STRESS_r{N} proves correctness at 2× rows; nothing recorded HOW cost
grows. This harness builds row-duplicated datasets at 1×/2×/4× the
source sf (pure duplication with consistent key shifts — value
distributions untouched, so plans stay comparable), times the top-K
heaviest queries from the latest driver bench at each scale (min of 2
runs through the noop sink, cache-released between), and fits the
cost exponent

    alpha = slope of least-squares log(t) vs log(scale)

A shuffle-bounded plan should show alpha ≈ 1 (linear); alpha >> 1
flags a stage that would blow up at 100×  (all-pairs, data-sized
window, driver materialization). Queries that generate their own
input (the multimodal codec set) are excluded — their cost is
scale-independent by construction.

Heaviest-query selection is self-contained: a one-shot 1x timing
sweep of the full registry ranks the queries (the driver's
BENCH_r{N}.json keeps only a truncated stdout tail, which drops
alphabetically-early names), then only the top-K proceed to the
2x/4x fits.

Run: python scaling_exponents.py [src_sf_dir] [out_json]
     (defaults: /root/testdata/sf0.1, SCALING_r08.json)
Prints one JSON line; exits 1 if any exponent > ALPHA_MAX (1.6).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stress_audit import _SPEC, SHIFT  # noqa: E402

TOP_K = 10
SCALES = (1, 2, 4)
RUNS = 2
ALPHA_MAX = 1.6
# generated-input queries: cost does not depend on sf_dir by design
_SCALE_FREE = {
    "multimodal_image_features",
    "multimodal_png_features",
    "multimodal_resize_roundtrip",
    "multimodal_audio_features",
    "multimodal_video_frames",
    # PQ family: wall-clock is the ~3-4 s flat plan-compile cost of the
    # frozen-codebook projection (documented in COVERAGE), not data
    # cost — at 2k-8k embedding rows a fitted exponent would measure
    # the constant, displacing genuinely data-heavy queries from the
    # top-K record (bulk throughput is pinned in scale_smoke pq_assign
    # at 1M rows instead)
    "embedding_pq_codes",
    "embedding_topk_pq_adc",
    "embedding_topk_ivfpq",
    "embedding_pq_recall",
    "embedding_topk_pq_rerank",
}


def build_scaled(src: str, out: str, k: int) -> None:
    """Duplicate fact/corpus tables k× (shifted keys keep uniqueness
    and referential integrity); dimensions copy through — the same
    recipe as stress_audit's magnitude build minus the ×7.003 value
    scaling.

    Document TEXT is vocabulary-remapped per copy (every token gets a
    copy-tag prefix) instead of copied verbatim: verbatim copies make
    every doc k-way near-duplicate of itself, so pair-emitting queries
    (LSH/simhash near-dup) see OUTPUT grow ~k² — a recipe artifact,
    not a plan property. A real k× corpus holds near-dup density
    roughly constant; disjoint per-copy vocabularies model that while
    keeping word-count and length distributions intact."""
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, (dup, shift_cols, _scale_cols) in _SPEC.items():
        src_path = os.path.join(src, f"{table}.parquet")
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src_path}')"
            ).fetchall()
        ]

        def proj(i: int) -> str:
            out_cols = []
            for c in cols:
                if i and c in shift_cols:
                    out_cols.append(f"{c} + {i * SHIFT} AS {c}")
                elif i and table == "documents" and c == "text":
                    out_cols.append(
                        f"'c{i}' || replace(text, ' ', ' c{i}') AS text"
                    )
                else:
                    out_cols.append(c)
            return ", ".join(out_cols)

        copies = range(k) if dup else range(1)
        union = " UNION ALL ".join(
            f"SELECT {proj(i)} FROM read_parquet('{src_path}')"
            for i in copies
        )
        con.execute(
            f"COPY ({union}) TO '{os.path.join(out, table + '.parquet')}' "
            "(FORMAT PARQUET)"
        )
    con.close()


def fit_alpha(points: list[tuple[int, float]]) -> float:
    """Least-squares slope of log(t) on log(k)."""
    xs = [math.log(k) for k, _ in points]
    ys = [math.log(max(t, 1e-4)) for _, t in points]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    return round(sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 3)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SCALING_r08.json"

    from calorista_spark.cache import release_caches
    from calorista_spark.queries import QUERIES
    from calorista_spark.session import build_session

    spark = build_session(
        app_name="calorista-scaling-exponents",
        extra_conf={"spark.driver.memory": "10g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    dirs = {}
    for k in SCALES:
        if k == 1:
            dirs[k] = src
        else:
            d = f"/tmp/scale_{k}x_sf"
            build_scaled(src, d, k)
            dirs[k] = d

    # warm the JVM/codegen once per dataset so scale-1 doesn't carry
    # the whole compile cost and bias the slope downward
    for k in SCALES:
        try:
            QUERIES["daily_totals"](spark, dirs[k]).write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:  # noqa: BLE001
            pass
        release_caches(spark)

    # rank by a self-contained one-shot 1x sweep (see module docstring)
    sweep: dict[str, float] = {}
    for name in sorted(QUERIES):
        if name in _SCALE_FREE:
            continue
        t0 = time.perf_counter()
        try:
            QUERIES[name](spark, src).write.format("noop").mode(
                "overwrite"
            ).save()
            sweep[name] = time.perf_counter() - t0
        except Exception as exc:  # noqa: BLE001
            print(f"rank sweep skip {name}: {exc}", file=sys.stderr)
        release_caches(spark)
    heavy = sorted(sweep, key=sweep.get, reverse=True)[:TOP_K]
    print(
        "heaviest:",
        [(n, round(sweep[n], 2)) for n in heavy],
        file=sys.stderr,
        flush=True,
    )

    record = {}
    for name in heavy:
        points = []
        timings = {}
        for k in SCALES:
            best = None
            for _ in range(RUNS):
                t0 = time.perf_counter()
                QUERIES[name](spark, dirs[k]).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                release_caches(spark)
                best = dt if best is None else min(best, dt)
            timings[f"{k}x"] = round(best, 3)
            points.append((k, best))
        alpha = fit_alpha(points)
        record[name] = {"sec": timings, "alpha": alpha}
        print(f"{name}: {timings} alpha={alpha}", file=sys.stderr, flush=True)

    worst = max(record.values(), key=lambda r: r["alpha"])["alpha"]
    summary = {
        "src": src,
        "rank_sweep_sec": {n: round(t, 3) for n, t in sweep.items()},
        "scales": list(SCALES),
        "queries": record,
        "alpha_max_observed": worst,
        "alpha_gate": ALPHA_MAX,
        "pass": worst <= ALPHA_MAX,
    }
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in summary.items() if k != "queries"}))
    spark.stop()
    sys.exit(0 if worst <= ALPHA_MAX else 1)


if __name__ == "__main__":
    main()
