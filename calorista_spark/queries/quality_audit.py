"""Corpus calibration + warehouse data-quality audits (r6).

Two corpus ops and two relational audit ops every large pipeline runs
before committing to a 100 TB job:

- **Per-source length calibration**
  (`doc_length_percentile_by_source`): a doc's token-count percentile
  WITHIN its source, so one global threshold ("drop the shortest
  quartile") doesn't silently erase short-form sources — the
  per-domain calibration trick quality filters need. Built on the
  tie-aware distributed rank (:func:`operators.ranks.
  grouped_cume_counts`): no per-source single-task window.
- **Source overlap** (`source_overlap_jaccard`): pairwise Jaccard of
  the sources' distinct 3-word-shingle sets — "which feeds are
  near-copies of each other" (mirror detection at feed granularity,
  complementing doc-level near-dup). A shingle-keyed equi-join:
  nothing all-pairs over docs; only the |sources|² result is
  quadratic, in the handful-of-feeds dimension. Pairs with an empty
  intersection are omitted (they'd carry jaccard 0).
- **Referential integrity** (`referential_integrity_audit`): orphan
  FK counts + parent-key uniqueness for the star schema's four
  child→parent edges, each a single left join against the parent's
  distinct keys (no row explosion) — the load-validation step before
  joins are trusted.
- **Join-key skew profile** (`join_key_skew_profile`): the top-10
  heaviest `l_partkey` values with their share of all rows and the
  ratio to the median key frequency — the diagnosis that decides
  between a plain shuffle join, AQE skew handling, or salting. Key
  counts are map-side combinable; the exact median runs over |keys|
  rows (key cardinality, not row count).

Determinism: ratios are bounded (shares, percentiles) → plain
``round(x, 4/6)``; counts are BIGINT-cast in the oracles per the
arrow-dtype convention; ties in the top-10 break on the key id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from calorista_spark.catalog import read_table
from calorista_spark.operators.ranks import grouped_cume_counts
from calorista_spark.operators.similarity import shingles
from calorista_spark.operators.textstats import token_count
from calorista_spark.queries.registry import query

_TOKENS = """
  SELECT doc_id, source,
         CASE WHEN length(trim(COALESCE(text, ''))) = 0 THEN 0
              ELSE len(string_split_regex(trim(COALESCE(text, '')), '\\s+')) END AS n_tokens
  FROM documents
"""

_LENGTH_PCT_ORACLE = f"""
WITH t AS ({_TOKENS})
SELECT doc_id, source, n_tokens,
       ROUND(percent_rank() OVER (PARTITION BY source ORDER BY n_tokens), 6)
         AS pct_rank,
       ROUND(cume_dist() OVER (PARTITION BY source ORDER BY n_tokens), 6)
         AS cume_dist,
       CAST(CASE WHEN cume_dist() OVER (PARTITION BY source ORDER BY n_tokens)
                      >= 0.25 THEN 1 ELSE 0 END AS INTEGER) AS keep_flag
FROM t
ORDER BY doc_id
"""


@query("doc_length_percentile_by_source", _LENGTH_PCT_ORACLE)
def doc_length_percentile_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Token-count percentile within each source + the calibrated
    keep decision (drop the per-source shortest quartile). Tie-aware
    cumulative counts at the distinct (source, n_tokens) level via
    the two-pass grouped rank, joined back per doc — a whole source
    never funnels through one task."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", token_count("text").cast("long").alias("n_tokens")
    )
    cume = grouped_cume_counts(toks, "source", "n_tokens")
    rank = F.col("cum_le") - F.col("cnt") + 1
    per_value = cume.select(
        F.col("source").alias("__src"),
        F.col("n_tokens").alias("__nt"),
        F.round(
            F.when(
                F.col("n_total") > 1, (rank - 1) / (F.col("n_total") - 1)
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("pct_rank"),
        F.round(F.col("cum_le") / F.col("n_total"), 6).alias("cume_dist"),
        F.when(F.col("cum_le") / F.col("n_total") >= 0.25, F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("keep_flag"),
    )
    return (
        toks.join(
            per_value,
            (F.col("source") == F.col("__src"))
            & (F.col("n_tokens") == F.col("__nt")),
        )
        .select(
            "doc_id", "source", "n_tokens", "pct_rank", "cume_dist", "keep_flag"
        )
        .orderBy("doc_id")
    )


_WORDS = "string_split_regex(lower(COALESCE(text, '')), '\\s+')"
_SHINGLES = (
    f"CASE WHEN len({_WORDS}) >= 3 THEN "
    f"list_transform(range(1, len({_WORDS}) - 1), "
    f"i -> array_to_string(list_slice({_WORDS}, i, i + 2), ' ')) "
    f"ELSE [] END"
)

_OVERLAP_ORACLE = f"""
WITH sh AS (
  SELECT DISTINCT source, unnest({_SHINGLES}) AS shingle FROM documents
),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT i.src_a, i.src_b, i.n_inter,
       ROUND(i.n_inter * 1.0 / (sa.n + sb.n - i.n_inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.source = i.src_a
JOIN sizes sb ON sb.source = i.src_b
ORDER BY src_a, src_b
"""


@query("source_overlap_jaccard", _OVERLAP_ORACLE)
def source_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-level Jaccard over distinct 3-word shingles.
    ONE groupBy per shingle with a bounded ``collect_set(source)``
    (≤ |sources| elements, map-side combinable — this also dedups
    (source, shingle), so no separate distinct pass), then the
    C(k,2) source pairs explode from the sorted set. Replaces the
    original shingle-keyed self-join: same pair rows out, but no
    second shuffle of the full shingle set and no join build side —
    measured 7.0 s → ~1.5 s at sf0.1. The only quadratic dimension
    is |sources|²; sizes broadcast back for inclusion–exclusion."""
    docs = read_table(spark, sf_dir, "documents", fan_out=True)
    sh = docs.select("source", F.explode(shingles("text")).alias("shingle"))
    by_shingle = sh.groupBy("shingle").agg(
        F.array_sort(F.collect_set("source")).alias("srcs")
    )
    sizes = by_shingle.select(F.explode("srcs").alias("source")).groupBy(
        "source"
    ).agg(F.count(F.lit(1)).alias("n"))
    pairs = by_shingle.select(
        F.explode(
            F.expr(
                "flatten(transform(srcs, (x, i) -> "
                "transform(slice(srcs, i + 2, size(srcs) - i - 1), "
                "y -> struct(x AS src_a, y AS src_b))))"
            )
        ).alias("p")
    ).select("p.src_a", "p.src_b")
    inter = pairs.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).alias("n_inter")
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_inter",
            F.round(
                F.col("n_inter")
                * 1.0
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


_EDGES = [
    # (label, child table, child key, parent table, parent key)
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
]


def _integrity_oracle() -> str:
    parts = []
    for label, child, ckey, parent, pkey in _EDGES:
        parts.append(f"""
SELECT '{label}' AS relation,
       CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS n_child,
       CAST((SELECT COUNT(*) FROM {child} c
             WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                               WHERE p.{pkey} = c.{ckey})) AS BIGINT)
         AS n_orphan,
       CAST((SELECT COUNT(*) FROM {parent}) AS BIGINT) AS n_parent,
       CAST((SELECT COUNT(*) FROM (
             SELECT {pkey} FROM {parent} GROUP BY {pkey}
             HAVING COUNT(*) > 1)) AS BIGINT) AS n_dup_parent_keys""")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY relation"


_INTEGRITY_ORACLE = _integrity_oracle()


@query("referential_integrity_audit", _INTEGRITY_ORACLE)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK orphan + parent-uniqueness audit for the four star-schema
    edges. Per edge: one left join of the child against the parent's
    DISTINCT keys (orphans = misses, no duplicate-key row explosion)
    and one groupBy on the parent key — both map-side combinable;
    dimension key sets broadcast."""
    rows = []
    for label, child, ckey, parent, pkey in _EDGES:
        c = read_table(spark, sf_dir, child).select(ckey)
        p = read_table(spark, sf_dir, parent).select(pkey)
        pk = p.groupBy(pkey).agg(F.count(F.lit(1)).alias("__cnt"))
        # r14 (guide §2.3 — aggregate before you shuffle): the child
        # side joins at the DISTINCT-key level with a map-side
        # combinable count, so the exchange carries |distinct child
        # keys| rows instead of |child rows| (lineitem edges: 4x fewer
        # rows into the join at sf0.1, |orders|/|lineitem| at scale).
        # Orphan accounting is unchanged: a null/missing key group
        # misses the join and contributes its full row count.
        ck = c.groupBy(ckey).agg(F.count(F.lit(1)).alias("__ccnt"))
        child_side = (
            ck.join(
                pk.select(pkey, F.lit(1).alias("__hit")),
                ck[ckey] == F.col(pkey),
                "left",
            )
            .agg(
                F.coalesce(F.sum("__ccnt"), F.lit(0)).alias("n_child"),
                F.coalesce(
                    F.sum(F.when(F.col("__hit").isNull(), F.col("__ccnt"))),
                    F.lit(0),
                ).alias("n_orphan"),
            )
        )
        parent_side = pk.agg(
            # coalesce: SUM over an EMPTY parent is null; the audit
            # must report 0 rows, not null (r6 empty-input audit)
            F.coalesce(F.sum("__cnt"), F.lit(0)).alias("n_parent"),
            F.count(F.when(F.col("__cnt") > 1, 1)).alias("n_dup_parent_keys"),
        )
        rows.append(
            child_side.join(parent_side).select(
                F.lit(label).alias("relation"),
                F.col("n_child").cast("bigint"),
                F.col("n_orphan").cast("bigint"),
                F.col("n_parent").cast("bigint"),
                F.col("n_dup_parent_keys").cast("bigint"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("relation")


_SKEW_ORACLE = """
WITH counts AS (
  SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY l_partkey
),
stats AS (
  SELECT quantile_cont(cnt, 0.5) AS med,
         CAST(SUM(cnt) AS BIGINT) AS total
  FROM counts
)
SELECT key, cnt,
       ROUND(cnt * 100.0 / total, 4) AS share_pct,
       ROUND(cnt / med, 4) AS x_median
FROM counts, stats
ORDER BY cnt DESC, key
LIMIT 10
"""


@query("join_key_skew_profile", _SKEW_ORACLE)
def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 heaviest join keys on ``lineitem.l_partkey`` with their
    row share and ratio to the median key frequency — the pre-join
    skew diagnosis. Per-key counts are one combinable groupBy; the
    exact median aggregates |keys| counts (key cardinality); the
    top-10 is a TakeOrdered, never a full sort."""
    li = read_table(spark, sf_dir, "lineitem").select("l_partkey")
    counts = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = counts.agg(
        F.percentile("cnt", F.lit(0.5)).alias("__med"),
        F.sum("cnt").alias("__total"),
    )
    return (
        counts.join(F.broadcast(stats))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt") * 100.0 / F.col("__total"), 4).alias(
                "share_pct"
            ),
            F.round(F.col("cnt") / F.col("__med"), 4).alias("x_median"),
        )
        .orderBy(F.col("cnt").desc(), F.col("key"))
        .limit(10)
    )
