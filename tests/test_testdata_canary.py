"""Testdata-drift canary: pin the parquet physical layouts the engine
assumes, so a silent driver-side regeneration of /root/testdata fails
ONE obvious test instead of breaking dozens of opaque queries.

Round-4 lesson: events.parquet flipped from TIMESTAMP(NANOS) to
TIMESTAMP(MICROS) mid-round and took out 29 queries + the bench. The
reader (catalog._read_events) now handles both layouts; this test
asserts every assumption it makes, using pyarrow footers only (no
Spark jobs).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from calorista_spark.catalog import TABLES, table_path

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

# Columns whose arrow types the engine hard-depends on (readers,
# streaming schemas, UDF signatures). Values are sets of acceptable
# arrow type strings.
PINNED = {
    "events": {
        # catalog._read_events branches on exactly these two layouts
        "ts": {"timestamp[ns]", "timestamp[us]", "int64"},
        "event_id": {"int64"},
        "user_id": {"int64"},
        "event_type": {"string", "large_string"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "orders": {
        "o_orderkey": {"int64"},
        # date semantics, physically timestamp[us] in current testdata
        "o_orderdate": {"timestamp[us]", "date32[day]"},
        "o_totalprice": {"double"},
    },
    "lineitem": {
        "l_orderkey": {"int64"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_shipdate": {"timestamp[us]", "date32[day]"},
    },
    "documents": {
        "doc_id": {"int64"},
        "text": {"string", "large_string"},
    },
    "embeddings": {
        "vec_id": {"int64"},
        # array<float> — list element must stay float32 for the
        # Arrow-batched similarity UDFs
        "embedding": {"list<element: float>", "large_list<element: float>"},
        "label": {"int32", "int64"},
    },
}


@pytest.mark.parametrize("sf" , SF_DIRS, ids=lambda d: os.path.basename(d))
def test_all_tables_present(sf):
    missing = [t for t in TABLES if not os.path.exists(table_path(sf, t))]
    assert not missing, f"{sf}: missing tables {missing}"


@pytest.mark.parametrize("table", sorted(PINNED))
@pytest.mark.parametrize("sf", SF_DIRS, ids=lambda d: os.path.basename(d))
def test_pinned_column_types(sf, table):
    schema = pq.read_schema(table_path(sf, table))
    got = {name: str(schema.field(name).type) for name in schema.names}
    for col, allowed in PINNED[table].items():
        assert col in got, f"{sf}/{table}: column {col!r} vanished ({got})"
        assert got[col] in allowed, (
            f"{sf}/{table}.{col}: arrow type {got[col]!r} not in the "
            f"pinned set {sorted(allowed)} — testdata layout drifted; "
            f"audit calorista_spark/catalog.py readers before trusting "
            f"any query results"
        )
