"""Nested day-payload normalizer (SURVEY §2.1 S10; FIXTURES.md A2).

Wire shape (reference main.py:77-95):

    {"food_entries": {"food_entry": X}}

where ``X`` is a LIST of entries on multi-entry days but a SINGLE
OBJECT on single-entry days (main.py:88-89), and the whole envelope
may be null/missing on empty days (main.py:82-85). Malformed rows and
rows missing key fields are skipped, matching the reference's guards
(main.py:91-95, 121-128) — but via declarative permissive parsing, not
row loops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from calorista_spark.functions.dates import epoch_days_to_date
from calorista_spark.functions.numeric import coerce_double
from calorista_spark.functions.text import fingerprint
from calorista_spark.schemas import FOOD_ENTRY_WIRE

_NUTRIENTS = ("calories", "carbohydrate", "fat", "protein", "fiber", "sugar", "sodium")


def _payload_schema(inner: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField(
                "food_entries",
                T.StructType([T.StructField("food_entry", inner, True)]),
                True,
            )
        ]
    )


def extract_entries(payload: Column | str) -> Column:
    """Normalize the dict-vs-list ambiguity: parse twice (array schema
    and single-struct schema) and coalesce — a single object becomes a
    1-element array. Unparseable payloads → null (day skipped)."""
    c = F.col(payload) if isinstance(payload, str) else payload
    as_array = F.from_json(c, _payload_schema(T.ArrayType(FOOD_ENTRY_WIRE)))
    as_single = F.from_json(c, _payload_schema(FOOD_ENTRY_WIRE))
    arr = as_array.getField("food_entries").getField("food_entry")
    single = as_single.getField("food_entries").getField("food_entry")
    return F.coalesce(arr, F.when(single.isNotNull(), F.array(single)))


def normalize_day_payloads(
    raw: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Raw (…, payload json string) rows → typed, fingerprinted entry
    rows (schemas.FOOD_ENTRY minus the derived columns the caller may
    add).

    - explode of the normalized entry array (empty/malformed days
      vanish — the reference's skip-and-continue, api.py:230-231)
    - validity filter: entries need ``food_entry_id`` and a parseable
      ``date_int`` (O-F3, main.py:121-128)
    - numeric coercion with 0.0 default (O-S11); optional nutrients
      keep the ``or 0`` default from models.py:53-55
    - fingerprint = id_dateint_timestamp (O-S9, main.py:54-60)
    """
    exploded = raw.select(
        *[c for c in raw.columns if c != payload_col],
        F.explode(extract_entries(payload_col)).alias("e"),
    )
    e = F.col("e")
    derived_date = epoch_days_to_date(e.getField("date_int"))
    valid = exploded.filter(
        e.getField("food_entry_id").isNotNull() & derived_date.isNotNull()
    )
    return valid.select(
        e.getField("food_entry_id").alias("food_entry_id"),
        derived_date.alias("date"),
        e.getField("date_int").try_cast("double").cast("int").alias("date_int"),
        e.getField("timestamp").alias("timestamp"),
        e.getField("meal").alias("meal"),
        e.getField("food_entry_name").alias("food_entry_name"),
        e.getField("food_entry_description").alias("food_entry_description"),
        *[coerce_double(e.getField(n)).alias(n) for n in _NUTRIENTS],
        e.getField("number_of_units").try_cast("double").alias("number_of_units"),
        fingerprint(
            e.getField("food_entry_id"),
            e.getField("date_int").try_cast("double").cast("int"),
            e.getField("timestamp"),
        ).alias("fingerprint"),
    )
