"""The stress_audit.py dataset builders must stay well-formed: the
round gates rely on them to certify the registry, so a silent build
regression (wrong row counts, lost schema) would hollow out the
certifications without failing anything."""

from __future__ import annotations

import duckdb

import stress_audit


def _count(path: str) -> int:
    return duckdb.sql(f"SELECT COUNT(*) FROM read_parquet('{path}')").fetchone()[0]


def test_stress_build_doubles_facts_and_keeps_dims(tmp_path):
    out = str(tmp_path / "stress")
    stress_audit.build("/root/testdata/sf0.001", out)
    base = _count("/root/testdata/sf0.001/orders.parquet")
    assert _count(f"{out}/orders.parquet") == 2 * base
    assert _count(f"{out}/nation.parquet") == _count(
        "/root/testdata/sf0.001/nation.parquet"
    )
    # duplicated keys shifted, originals intact
    lo, hi = duckdb.sql(
        f"SELECT MIN(o_orderkey), MAX(o_orderkey) FROM read_parquet('{out}/orders.parquet')"
    ).fetchone()
    assert lo < stress_audit.SHIFT <= hi
    # prices gained magnitude and extra decimals
    mx = duckdb.sql(
        f"SELECT MAX(o_totalprice) FROM read_parquet('{out}/orders.parquet')"
    ).fetchone()[0]
    base_mx = duckdb.sql(
        "SELECT MAX(o_totalprice) FROM read_parquet('/root/testdata/sf0.001/orders.parquet')"
    ).fetchone()[0]
    assert mx > base_mx * 6.9


def test_empty_build_is_zero_rows_same_schema(tmp_path):
    out = str(tmp_path / "empty")
    stress_audit.build("/root/testdata/sf0.001", out, empty=True)
    for t in stress_audit._SPEC:
        assert _count(f"{out}/{t}.parquet") == 0
    cols = duckdb.sql(
        f"DESCRIBE SELECT * FROM read_parquet('{out}/documents.parquet')"
    ).fetchall()
    assert [c[0] for c in cols] == ["doc_id", "text", "lang", "source", "n_chars"]


def test_nulls_build_injects_bounded_null_fraction(tmp_path):
    out = str(tmp_path / "nulls")
    stress_audit.build("/root/testdata/sf0.001", out, nulls=True)
    n, nn = duckdb.sql(
        f"SELECT COUNT(*), COUNT(text) FROM read_parquet('{out}/documents.parquet')"
    ).fetchone()
    assert n == _count("/root/testdata/sf0.001/documents.parquet")
    assert 0 < n - nn < n * 0.2  # ~1/16 nulled, never all


def test_unicode_build_appends_multibyte(tmp_path):
    out = str(tmp_path / "uni")
    stress_audit.build("/root/testdata/sf0.001", out, unicode_=True)
    hit = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out}/documents.parquet') "
        "WHERE text LIKE '%漢字%'"
    ).fetchone()[0]
    assert hit > 0


def test_whitespace_build_decorates_documents(tmp_path):
    out = str(tmp_path / "ws")
    stress_audit.build("/root/testdata/sf0.001", out, whitespace=True)
    hit = duckdb.sql(
        f"SELECT COUNT(*) FROM read_parquet('{out}/documents.parquet') "
        "WHERE text LIKE '  %' AND text LIKE '%' || chr(10) || '%'"
    ).fetchone()[0]
    assert hit > 0
