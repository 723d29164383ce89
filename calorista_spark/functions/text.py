"""String / fingerprint / hash expressions (O-S3, O-S9, O-S10; §4.2.3)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fingerprint(*cols: Column | str, sep: str = "_") -> Column:
    """O-S9: row fingerprint ``f"{id}_{date_int}_{timestamp}"``
    (reference main.py:54-60, ``entry.get(..., '')`` convention).
    Every null component yields an *empty* segment — ``concat_ws``
    alone would skip it entirely, letting key tuples that differ only
    in which field is null collide (e.g. (1,null,2) vs (1,2,null))."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.concat_ws(
        sep, *[F.coalesce(c.cast("string"), F.lit("")) for c in cs]
    )


def fingerprint_hash(*cols: Column | str) -> Column:
    """Stable 256-bit fingerprint for MERGE keys at scale: collision-
    safe join key that stays short regardless of field width."""
    return F.sha2(fingerprint(*cols, sep="\x1f"), 256)


def row_hash(*cols: Column | str) -> Column:
    """§4.2.3 changed-row detection: the reference compares whole dicts
    (``entry != existing``, main.py:151); we reduce the row to one hash
    so the MERGE update condition is a single comparison. Column order
    must be canonical — callers pass a sorted column list."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.sha2(F.to_json(F.struct(*cs)), 256)


def key_date(col: Column | str) -> Column:
    """O-S3: extract the date from a storage key like
    ``food_entries:2025-05-08`` (reference streamlit_app.py:85-91);
    unparseable suffix → null (try_cast semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_date(F.element_at(F.split(c, ":"), -1), "yyyy-MM-dd")


def capitalize(col: Column | str) -> Column:
    """Python ``str.capitalize()``: first char upper, rest lower —
    exactly what the reference applies to measure names
    (streamlit_app.py:452 ``.capitalize()``), distinct from initcap."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.upper(F.substring(c, 1, 1)), F.lower(F.substring(c, 2, 0x7FFFFFFF)))


def pretty_measure_name(col: Column | str) -> Column:
    """O-S10: strip ``total_`` / ``_ratio`` affixes and capitalize
    (reference streamlit_app.py:452,476,577)."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(F.regexp_replace(c, "^total_", ""), "_ratio$", "")
    return capitalize(stripped)
