"""Per-file Bloom-filter sidecars for the commit-log table format
(r14): file skipping for EQUALITY predicates on high-cardinality
columns, where min/max footer stats are useless (a `user_id = X`
point lookup against files whose id ranges all overlap scans every
file; the 100 TB case is a needle query over a whole table).

Design — a MAINTENANCE face, not a write-path tax:

- ``CommitLogStore.build_bloom(spark, cols)`` computes one Bloom
  filter per (data file, column) in EXECUTORS (``mapInPandas`` over
  the file list; each task reads only its files' target columns) and
  writes them as content-keyed sidecars under ``<store>/_bloom/``.
  Data files are IMMUTABLE by the format's contract, so a sidecar
  keyed by file path is valid forever: rebuilds skip files already
  covered, and DML rewrites produce NEW files that simply lack
  sidecars until the next build (missing sidecar = cannot skip =
  always correct, never stale).
- ``files_for`` / ``read_where`` probe the sidecars AFTER min/max and
  partition pruning, only for ``==`` / ``in`` predicates on covered
  columns, and only for files that survived — the probe is
  O(candidate files) tiny JSON reads on the driver, cached per store
  instance. A file is dropped only when EVERY probed value is
  definitely absent; false positives cost IO, false negatives are
  impossible (the invariant the oracle query and the property test
  pin).

Hashing is the standard double-hashing scheme (Kirsch-Mitzenmacher):
two 64-bit halves of one md5 over a canonical text encoding of the
value, ``bit_i = (h1 + i*h2) mod m``. The canonical encoding is
type-strict (ints, strings, dates, naive-datetimes); a probe value
whose python type doesn't match the column's family never consults
the bloom (a float literal against a bigint column keeps the file —
conservative, never wrong).
"""

from __future__ import annotations

import base64
import hashlib
import json
import math
import os
import uuid
import datetime as _dt

_BLOOM_DIR = "_bloom"
_META_FILE = "meta.json"
# bound the per-(file, col) filter: ~9.6 bits/value at 1% fpp → the
# 32M-bit (4 MiB) cap covers ~3.3M distinct values per file-column —
# beyond a 128 MB parquet file's realistic cardinality. Past the cap
# the filter saturates gracefully (higher fpp, never a false
# negative).
_MAX_BITS = 32 << 20


def bloom_size(n_values: int, fpp: float) -> tuple[int, int]:
    """(m bits, k hashes) for ``n_values`` at target ``fpp``."""
    if n_values <= 0:
        return 8, 1
    m = int(-n_values * math.log(fpp) / (math.log(2) ** 2)) + 1
    m = min(m, _MAX_BITS)
    k = max(1, round(m / n_values * math.log(2)))
    return m, min(k, 16)


def canon(value) -> str | None:
    """Canonical text encoding shared by build and probe. ``None`` =
    not bloom-encodable (the caller must treat the file as a keep)."""
    if value is None or isinstance(value, bool):
        return None
    if isinstance(value, int):
        return f"i:{value}"
    if isinstance(value, str):
        return f"s:{value}"
    if isinstance(value, _dt.datetime):
        if value.tzinfo is not None:
            return None  # tz-aware probes don't bloom (kind ambiguity)
        return f"t:{value.isoformat()}"
    if isinstance(value, _dt.date):
        return f"d:{value.isoformat()}"
    return None


def _hash_pair(col: str, canon_text: str) -> tuple[int, int]:
    d = hashlib.md5(f"{col}\x00{canon_text}".encode()).digest()
    return (
        int.from_bytes(d[:8], "little"),
        int.from_bytes(d[8:], "little") | 1,
    )


def bloom_add(bits: bytearray, m: int, k: int, col: str, c: str) -> None:
    h1, h2 = _hash_pair(col, c)
    for i in range(k):
        b = (h1 + i * h2) % m
        bits[b >> 3] |= 1 << (b & 7)


def bloom_maybe_contains(
    blob: bytes, m: int, k: int, col: str, c: str
) -> bool:
    h1, h2 = _hash_pair(col, c)
    for i in range(k):
        b = (h1 + i * h2) % m
        if not (blob[b >> 3] >> (b & 7)) & 1:
            return False
    return True


def sidecar_name(file_rel: str) -> str:
    return hashlib.md5(file_rel.encode()).hexdigest() + ".json"


def bloom_dir(store_path: str) -> str:
    return os.path.join(store_path, _BLOOM_DIR)


def load_meta(store_path: str) -> dict | None:
    p = os.path.join(bloom_dir(store_path), _META_FILE)
    try:
        with open(p) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def write_meta(store_path: str, cols: list[str], fpp: float) -> None:
    d = bloom_dir(store_path)
    os.makedirs(d, exist_ok=True)
    prev = load_meta(store_path)
    merged_cols = sorted(set(cols) | set((prev or {}).get("cols", [])))
    tmp = os.path.join(d, f".meta-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as fh:
        json.dump({"cols": merged_cols, "fpp": fpp, "version": 1}, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(d, _META_FILE))


def load_sidecar(store_path: str, file_rel: str) -> dict | None:
    p = os.path.join(bloom_dir(store_path), sidecar_name(file_rel))
    try:
        with open(p) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def write_sidecar(store_path: str, file_rel: str, cols: dict) -> None:
    """Atomic, idempotent sidecar publish (executor-side): racing
    builders write identical content for an immutable file, so
    last-write-wins replace is harmless."""
    d = bloom_dir(store_path)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, sidecar_name(file_rel))
    tmp = final + ".tmp-" + uuid.uuid4().hex[:8]
    with open(tmp, "w") as fh:
        json.dump({"file": file_rel, "cols": cols}, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, final)


def build_file_bloom(
    store_path: str, file_rel: str, phys_cols: list[str], fpp: float
) -> int:
    """Read ONE parquet file's target columns and publish its sidecar.
    Returns the number of columns indexed. Runs in executors."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(store_path, file_rel), columns=phys_cols
    )
    out: dict[str, dict] = {}
    for col in phys_cols:
        vals = set()
        for v in tbl[col].to_pylist():
            c = canon(v)
            if c is not None:
                vals.add(c)
        m, k = bloom_size(len(vals), fpp)
        bits = bytearray((m + 7) >> 3)
        for c in vals:
            bloom_add(bits, m, k, col, c)
        out[col] = {
            "m": m,
            "k": k,
            "bits": base64.b64encode(bytes(bits)).decode(),
        }
    write_sidecar(store_path, file_rel, out)
    return len(out)


def probe_keep(
    sidecar: dict | None, preds: list[tuple]
) -> bool:
    """True = the file may contain a match (keep); False = every
    equality-probed value is definitely absent (skip). ``preds`` are
    (physical_col, op, value) with op in {'==', 'in'} pre-filtered to
    bloom-covered columns."""
    if sidecar is None:
        return True
    cols = sidecar.get("cols", {})
    for col, op, value in preds:
        ent = cols.get(col)
        if ent is None:
            continue
        blob = base64.b64decode(ent["bits"])
        m, k = ent["m"], ent["k"]
        values = value if op == "in" else [value]
        texts = [canon(v) for v in values]
        if any(t is None for t in texts):
            continue  # un-encodable probe value: conservative keep
        if not any(
            bloom_maybe_contains(blob, m, k, col, t) for t in texts
        ):
            return False  # ALL probed values definitely absent
    return True
