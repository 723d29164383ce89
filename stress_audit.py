#!/usr/bin/env python
"""Magnitude-stress oracle audit: rebuild the adversarial dataset the
round-5/6 boundary audits used ad hoc, then sweep the FULL oracle
registry (Spark vs DuckDB) on it.

The stress transform, applied to a source sf dir:

- fact/corpus tables self-union to 2× rows (duplicated rows get their
  primary key shifted by +10_000_000, foreign keys to other duplicated
  facts shifted consistently; dimension tables stay as-is so
  referential integrity holds);
- monetary/value doubles scale by ×7.003 — this both (a) multiplies
  aggregate magnitudes ~14× (accumulation-order noise amplifier) and
  (b) produces >2-decimal per-row values (round-half boundary
  amplifier). Quantities, ratios, dates, text, embeddings unchanged.

Both engines read the SAME stressed parquet, so any divergence is
engine arithmetic — exactly what the registry's determinism
conventions (quantized sums, FLOOR-quantize, integer thresholds)
claim to prevent. Running ALL oracle queries (not just the 22
SF-unbounded ones of the manual audits) makes the audit future-proof
for new queries.

Run: python stress_audit.py [src_sf_dir] [out_dir]
     (defaults: /root/testdata/sf0.1  /tmp/stress_sf)
     python stress_audit.py --nulls [src_sf_dir] [out_dir]
     (NULL-inject ~6% of rows in text/value/props/priority/discount/
      phone/embedding — the null-handling divergence audit; default
      out /tmp/nulls_sf.)
     python stress_audit.py --unicode [src_sf_dir] [out_dir]
     (append multibyte text — accents/CJK/emoji — to ~6% of documents;
      the codepoint-semantics audit. Default out /tmp/unicode_sf.)
     python stress_audit.py --whitespace [src_sf_dir] [out_dir]
     (decorate ~6% of documents with leading/trailing spaces, tabs,
      newlines — the tokenizer-edge audit. Default out /tmp/ws_sf.)
     python stress_audit.py --empty [src_sf_dir] [out_dir]
     (LIMIT 0 tables — the empty-input totality audit; default out
     /tmp/empty_sf. First r6 run found 3 real edge bugs: cube/rollup
     dropping the SQL-required grand-total row on empty input, and a
     null-vs-0 parent count in the integrity audit.)
Prints one JSON line: {"built": ..., "checked": N, "mismatches": [...]}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SHIFT = 10_000_000
SCALE = 7.003

# --nulls mode: (column, row-key) pairs per table; ~1/16 of rows get
# the column NULLed (md5-prefix predicate on the key, deterministic).
_NULL_SPEC = {
    "documents": [("text", "doc_id")],
    "events": [("value", "event_id"), ("props", "event_id")],
    "orders": [("o_orderpriority", "o_orderkey")],
    "lineitem": [("l_discount", "l_orderkey")],
    "customer": [("c_phone", "c_custkey")],
    "embeddings": [("embedding", "vec_id")],
}

# table -> (duplicate?, key-shift columns, price-scale columns)
_SPEC = {
    "region": (False, [], []),
    "nation": (False, [], []),
    "customer": (False, [], ["c_acctbal"]),
    "supplier": (False, [], ["s_acctbal"]),
    "part": (False, [], ["p_retailprice"]),
    "orders": (True, ["o_orderkey"], ["o_totalprice"]),
    "lineitem": (True, ["l_orderkey"], ["l_extendedprice"]),
    "events": (True, ["event_id"], ["value"]),
    "documents": (True, ["doc_id"], []),
    "embeddings": (True, ["vec_id"], []),
}


_WS_DECOR = ("  ", " \t x\n\n y  ")
# r8: extended with Cyrillic (segmented, case-mapped), kana and Thai
# (unsegmented \u2192 codepoint-fallback path of the BPE-family tokenizer).
# Deliberately excludes final-sigma/\u0130: those two Java-vs-utf8proc
# lowercase divergences are canonicalized only inside the BPE family
# (operators/bpe.py) \u2014 the whitespace-tokenizer family documents
# codepoint-lowercase sensitivity instead.
_UNICODE_SUFFIX = (
    " h\u00e9llo w\u00f6rld \u6f22\u5b57 \U0001f642 \u00f1a\u00efve"
    " \u041f\u0440\u0438\u0432\u0435\u0442"
    " \u3053\u3093\u306b\u3061\u306f \u0e14\u0e35\u0e21\u0e32\u0e01"
)


def build(
    src: str,
    out: str,
    empty: bool = False,
    nulls: bool = False,
    unicode_: bool = False,
    whitespace: bool = False,
) -> None:
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, (dup, shift_cols, scale_cols) in _SPEC.items():
        src_path = os.path.join(src, f"{table}.parquet")
        if empty:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src_path}') LIMIT 0) "
                f"TO '{os.path.join(out, table + '.parquet')}' "
                "(FORMAT PARQUET)"
            )
            continue
        if whitespace:
            if table == "documents":
                pre, post = _WS_DECOR
                con.execute(
                    f"COPY (SELECT doc_id, "
                    f"CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)"
                    f" = 'c' THEN '{pre}' || text || e'{post}' ELSE text END"
                    f" AS text, lang, source, n_chars "
                    f"FROM read_parquet('{src_path}')) "
                    f"TO '{os.path.join(out, table + '.parquet')}' "
                    "(FORMAT PARQUET)"
                )
            else:
                con.execute(
                    f"COPY (SELECT * FROM read_parquet('{src_path}')) "
                    f"TO '{os.path.join(out, table + '.parquet')}' "
                    "(FORMAT PARQUET)"
                )
            continue
        if unicode_:
            if table == "documents":
                con.execute(
                    f"COPY (SELECT doc_id, "
                    f"CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)"
                    f" = 'b' THEN text || '{_UNICODE_SUFFIX}' ELSE text END"
                    f" AS text, lang, source, n_chars "
                    f"FROM read_parquet('{src_path}')) "
                    f"TO '{os.path.join(out, table + '.parquet')}' "
                    "(FORMAT PARQUET)"
                )
            else:
                con.execute(
                    f"COPY (SELECT * FROM read_parquet('{src_path}')) "
                    f"TO '{os.path.join(out, table + '.parquet')}' "
                    "(FORMAT PARQUET)"
                )
            continue
        if nulls:
            null_cols = dict(
                (c, k) for c, k in _NULL_SPEC.get(table, [])
            )
            cols0 = [
                r[0]
                for r in con.sql(
                    f"DESCRIBE SELECT * FROM read_parquet('{src_path}')"
                ).fetchall()
            ]
            proj_n = ", ".join(
                (
                    f"CASE WHEN substr(md5(CAST({null_cols[c]} AS VARCHAR)),"
                    f" 1, 1) = 'a' THEN NULL ELSE {c} END AS {c}"
                )
                if c in null_cols
                else c
                for c in cols0
            )
            con.execute(
                f"COPY (SELECT {proj_n} FROM read_parquet('{src_path}')) "
                f"TO '{os.path.join(out, table + '.parquet')}' "
                "(FORMAT PARQUET)"
            )
            continue
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src_path}')"
            ).fetchall()
        ]

        def proj(shifted: bool) -> str:
            parts = []
            for c in cols:
                expr = c
                if shifted and c in shift_cols:
                    expr = f"{c} + {SHIFT}"
                if c in scale_cols:
                    # FLOOR to 4 decimals so parquet carries the exact
                    # value both engines then aggregate
                    expr = f"FLOOR(({expr}) * {SCALE} * 1e4 + 0.5) / 1e4"
                parts.append(f"{expr} AS {c}")
            return ", ".join(parts)

        base = f"SELECT {proj(False)} FROM read_parquet('{src_path}')"
        if dup:
            base += (
                f" UNION ALL SELECT {proj(True)} "
                f"FROM read_parquet('{src_path}')"
            )
        con.execute(
            f"COPY ({base}) TO '{os.path.join(out, table + '.parquet')}' "
            "(FORMAT PARQUET)"
        )
    con.close()


def sweep(out: str) -> tuple[int, list]:
    import duckdb

    import __spark_entry__ as e
    from calorista_spark.session import build_session

    spark = build_session(
        app_name="calorista-stress-audit",
        extra_conf={"spark.driver.memory": "10g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in _SPEC:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(out, t + '.parquet')}')"
        )
    only = {
        q.strip()
        for q in os.environ.get("STRESS_ONLY", "").split(",")
        if q.strip()
    }
    names = sorted(only & set(osql)) if only else sorted(osql)
    bad = []
    for i, name in enumerate(names):
        try:
            sdf = qs[name](spark, out)
            srows = sorted(
                tuple(str(x) for x in r) for r in sdf.collect()
            )
            orows = sorted(
                tuple(str(x) for x in r)
                for r in con.sql(osql[name]).fetchall()
            )
            if srows != orows:
                diff = sum(1 for a, b in zip(srows, orows) if a != b)
                bad.append(
                    {
                        "query": name,
                        "spark_rows": len(srows),
                        "oracle_rows": len(orows),
                        "first_diffs": diff,
                    }
                )
                print(f"MISMATCH {name}", file=sys.stderr, flush=True)
        except Exception as ex:  # noqa: BLE001 — audit must not abort
            bad.append({"query": name, "error": repr(ex)[:200]})
            print(f"ERROR {name}: {ex!r}"[:200], file=sys.stderr, flush=True)
        if i % 20 == 0:
            spark.catalog.clearCache()
            print(f"... {i}/{len(names)}", file=sys.stderr, flush=True)
    spark.stop()
    return len(names), bad


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    empty = "--empty" in sys.argv[1:]
    nulls = "--nulls" in sys.argv[1:]
    unicode_ = "--unicode" in sys.argv[1:]
    whitespace = "--whitespace" in sys.argv[1:]
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    default_out = (
        "/tmp/empty_sf"
        if empty
        else (
            "/tmp/nulls_sf"
            if nulls
            else (
                "/tmp/unicode_sf"
                if unicode_
                else ("/tmp/ws_sf" if whitespace else "/tmp/stress_sf")
            )
        )
    )
    out = args[1] if len(args) > 1 else default_out
    build(
        src, out, empty=empty, nulls=nulls, unicode_=unicode_,
        whitespace=whitespace,
    )
    checked, bad = sweep(out)
    print(json.dumps({"built": out, "checked": checked, "mismatches": bad}))


if __name__ == "__main__":
    main()
