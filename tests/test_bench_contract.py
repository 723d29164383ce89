"""Pin bench.py's driver contract — the two failure modes that cost
rounds 3 and 4 their perf signal:

- r3: the summary JSON line printed before other output / with the
  headline value at the FRONT of a long line, so the driver's
  tail-truncated capture lost it;
- r4: no per-query isolation, so one crashing query aborted the whole
  run with zero timings recorded.

The test runs bench.main() against a patched registry containing a
healthy query and a crashing one, and asserts the contract directly
on captured stdout.
"""

from __future__ import annotations

import json

import pytest

import bench


class _NoStopSession:
    """Proxy handing bench the shared test session but swallowing
    stop() so the session-scoped fixture survives."""

    def __init__(self, spark):
        self._spark = spark

    def stop(self):
        pass

    def __getattr__(self, name):
        return getattr(self._spark, name)


def test_bench_isolates_failures_and_prints_summary_last(
    spark, sf_dir, tmp_path, monkeypatch, capsys
):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FULL", str(tmp_path / "b.json"))
    def ok(s, d):
        return s.range(5).selectExpr("id", "id * 2 AS doubled")

    def boom(s, d):
        raise RuntimeError("synthetic query failure")

    # 'aaa_boom' sorts FIRST: proves a leading crash can't abort the run
    monkeypatch.setattr(
        bench, "QUERIES", {"aaa_boom": boom, "daily_totals": ok, "zzz_ok": ok}
    )
    monkeypatch.setattr(bench, "build_session", lambda app_name: _NoStopSession(spark))
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", sf_dir)

    bench.main()
    out = capsys.readouterr().out.strip().splitlines()

    # contract: the summary is the LAST stdout line and parses alone
    summary = json.loads(out[-1])
    assert summary["n_ok"] == 2 and summary["n_err"] == 1
    assert set(summary["queries"]) == {"daily_totals", "zzz_ok"}
    # r6: fixed-cost calibration probe for cross-round drift attribution
    assert summary["calibration_sec"] > 0
    assert "synthetic query failure" in summary["errors"]["aaa_boom"]
    assert summary["value"] == pytest.approx(
        sum(summary["queries"].values()), abs=1e-3
    )
    # tail-truncation safety: the headline value is the LAST key of the
    # serialized line, after the long per-query dict
    line = out[-1]
    assert line.rstrip("}").rsplit(",", 1)[-1].strip().startswith('"value":')


def test_bench_normalization_and_medians(
    spark, sf_dir, tmp_path, monkeypatch, capsys
):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FULL", str(tmp_path / "b.json"))
    """r8/r11: the summary must be self-describing for load drift —
    value_normalized rescales by the calibration probe, and (VERDICT
    r10 #3) every query carries a median over n_passes runs so
    cross-round comparisons don't ride single noisy samples."""
    import json

    import bench

    def ok(s, d):
        return s.range(5).selectExpr("id")

    monkeypatch.setattr(bench, "QUERIES", {f"q{i}": ok for i in range(7)})
    monkeypatch.setattr(
        bench, "build_session", lambda app_name: _NoStopSession(spark)
    )
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", sf_dir)
    bench.main()
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["calibration_ref"] == 0.45
    assert summary["value_normalized"] == pytest.approx(
        summary["value"] * 0.45 / summary["calibration_sec"], abs=1e-3
    )
    # r11 medians: every timed query has one; their sum is the median
    # headline; the cold `value` stays comparable to earlier rounds
    assert summary["n_passes"] == 3
    assert set(summary["per_query_median_sec"]) == set(summary["queries"])
    assert summary["value_median_sec"] == pytest.approx(
        sum(summary["per_query_median_sec"].values()), abs=1e-3
    )

def test_bench_persists_full_summary_json(
    spark, sf_dir, tmp_path, monkeypatch, capsys
):
    """r14 (VERDICT r13 #5): the driver's 2000-char stdout tail
    discards per-query medians; bench must persist the COMPLETE
    summary to a JSON artifact whose schema matches the stdout line."""
    import json
    import os

    import bench

    def ok(s, d):
        return s.range(5).selectExpr("id")

    monkeypatch.setattr(bench, "QUERIES", {"q0": ok, "q1": ok})
    monkeypatch.setattr(
        bench, "build_session", lambda app_name: _NoStopSession(spark)
    )
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", sf_dir)
    full = str(tmp_path / "BENCH_full_test.json")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FULL", full)
    bench.main()
    stdout_summary = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    )
    assert os.path.isfile(full)
    with open(full) as fh:
        persisted = json.load(fh)
    # identical content: the artifact IS the full summary
    assert persisted == stdout_summary
    # schema pin: the keys cross-round comparisons rely on
    for key in (
        "queries",
        "per_query_median_sec",
        "per_query_warm_median_sec",
        "fixture_overhead_sec",
        "value_warm_median_sec",
        "value_median_sec",
        "calibration_sec",
        "calibration_samples",
        "value",
        "sf",
        "n_ok",
        "n_err",
    ):
        assert key in persisted, key
