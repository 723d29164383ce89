"""The driver oracle-checks only a fixed-size prefix of ``queries()``;
``__spark_entry__`` must rotate that prefix so every registered query
eventually gets a hard CORRECTNESS row (VERDICT r01 top action)."""

import json
from pathlib import Path

import __spark_entry__ as entry_mod

REPO = Path(__file__).resolve().parent.parent


def _latest_correctness() -> dict:
    paths = sorted(REPO.glob("CORRECTNESS_r*.json"))
    merged: dict = {}
    for p in paths:
        merged.update(json.loads(p.read_text()))
    return merged


def test_never_verified_queries_sort_first():
    checked = set(_latest_correctness())
    names = list(entry_mod.queries())
    unchecked = [n for n in names if n not in checked]
    # every never-verified query must precede every green one
    if unchecked:
        last_unchecked = max(names.index(n) for n in unchecked)
        assert last_unchecked == len(unchecked) - 1, (
            "verified query interleaved before an unverified one"
        )


def test_rotation_is_complete_and_stable():
    from calorista_spark.queries import QUERIES

    names = list(entry_mod.queries())
    assert sorted(names) == sorted(QUERIES), "rotation dropped/added names"
    # deterministic: two calls agree
    assert names == list(entry_mod.queries())


def test_red_rows_rank_before_green(tmp_path, monkeypatch):
    ranks = entry_mod._verification_rank.__wrapped__ if hasattr(
        entry_mod._verification_rank, "__wrapped__"
    ) else entry_mod._verification_rank
    # synthesize: a=never, b=red in r01, c=green in r01
    fake = {
        "b": {"rows_match": False, "schema_match": True, "hash_match": False,
              "spark_rows": 1, "oracle_rows": 2, "err": None},
        "c": {"rows_match": True, "schema_match": True, "hash_match": True,
              "spark_rows": 1, "oracle_rows": 1, "err": None},
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(fake))
    (tmp_path / "__spark_entry__.py").write_text("")  # anchor for Path(__file__)
    monkeypatch.setattr(entry_mod, "__file__", str(tmp_path / "__spark_entry__.py"))
    out = ranks(["c", "b", "a"])
    ordered = sorted(["a", "b", "c"], key=out.__getitem__)
    assert ordered == ["a", "b", "c"]
