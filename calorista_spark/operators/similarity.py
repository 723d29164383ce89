"""Near-duplicate detection + similarity search (SURVEY §2.11 L2/L3).

Everything is built from Catalyst higher-order functions and hash
joins — no Python in the hot path, every stage map-side combinable:

- MinHash: shingle explode → per-(doc, seed) min of md5(seed:shingle).
  md5 gives a deterministic, engine-portable hash; min over hex strings
  is the signature. At 100 TB the explode is the standard minhash cost
  and the min() aggregate combines map-side before the shuffle.
- LSH banding: signatures grouped into bands; docs sharing a band key
  hash-join into candidate pairs (no cartesian). Candidates are then
  exactly verified with n-gram Jaccard — the classic
  shingle→minhash→band→bucket-join pipeline.
- SimHash: 32-bit sign-of-weighted-sum fingerprint via an explicit
  (doc × word × bit) grid — shuffle-light (two partial-agg groupBys).
- Cosine top-k: brute-force crossJoin + window for exact small-N;
  IVF (centroid-bucketed) variant restricts the candidate set for the
  scale path.

Reference tie-in: the reference's only dedup is exact fingerprinting
(main.py:54-60); L2/L3 are the north-star generalizations
(BASELINE.json) for LLM-corpus curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from calorista_spark.functions.vectors import dot, l2_norm


def words_of(text: Column | str) -> Column:
    """Lowercased whitespace tokens. TOTAL on null: null text behaves
    as the empty document (r6 null-injection audit convention) —
    mirrored by COALESCE(text, '') in every oracle tokenizer."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.coalesce(c, F.lit(""))), r"\s+")


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles; < n words → empty array (not null), so
    set algebra downstream stays total."""
    w = words_of(text)
    cnt = F.size(w)
    return F.when(
        cnt >= n,
        F.transform(
            F.sequence(F.lit(1), cnt - n + 1),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


# Universal-hash family for MinHash: perm_i(h) = (A[i]*h + B[i]) mod P.
# P = 1e9+7; A[i], B[i] < P keeps A[i]*h + B[i] inside int64
# ((P-1)^2 + P ≈ 1.0e18 < 2^63).
#
# r12 scale fix: the constants were previously LINEAR in the seed
# (A[i] = 1000003 + 37i) — seeds were affinely related, so one shingle
# whose base hash was small enough that A[i]*h + B[i] never wrapped
# mod P stayed the MINIMUM under every seed at once. Two documents
# sharing any such small-hash shingle (inevitable once the corpus has
# ~10M distinct shingles reduced into a 1e9 space) then agreed on most
# of their signature and band keys — false near-duplicates, observed
# at a measurable ~0.002% rate in a 1M-doc / 100k-batch admission run
# (scale_smoke incremental_admit). Per-seed md5-derived constants
# break the cross-seed correlation: each seed's permutation wraps
# independently, so a small base hash dominates at most a few seeds by
# chance. Deterministic (hashlib over a fixed tag), mirrored literally
# into every DuckDB oracle via MINHASH_CONSTS_SQL below.
MINHASH_P = 1_000_000_007


def _minhash_const(tag: str, i: int) -> int:
    import hashlib as _hl

    return (
        int(_hl.md5(f"calorista-minhash-{tag}-{i}".encode()).hexdigest()[:15], 16)
        % MINHASH_P
    )


MINHASH_A = tuple(_minhash_const("A", i) or 1 for i in range(64))
MINHASH_B = tuple(_minhash_const("B", i) for i in range(64))


def minhash_consts_sql(num_hashes: int = 16) -> str:
    """``(seed, a, b)`` VALUES rows for DuckDB oracles — the literal
    constant table every oracle joins instead of re-deriving the
    (now non-linear) per-seed coefficients in SQL."""
    return ", ".join(
        f"({i}, {MINHASH_A[i]}, {MINHASH_B[i]})" for i in range(num_hashes)
    )


def shingle_base_hash(shingle: Column) -> Column:
    """One md5 per shingle → 60-bit int → reduced mod P. All seed
    permutations derive from this single digest (16× fewer md5s than
    hashing per seed)."""
    return (
        F.conv(F.substring(F.md5(shingle), 1, 15), 16, 10).cast("long") % MINHASH_P
    )


def shingle_sets(
    docs: DataFrame, id_col: str, text_col: str, n: int = 3, materialize: bool = False
) -> DataFrame:
    """(id, sh: array<string>) distinct-shingle sets — the shared
    input of the whole near-dup pipeline. ``materialize=True`` local-
    checkpoints it so queries using the sets in TWO branches (minhash
    signatures AND jaccard verification) tokenize each document once
    instead of once per branch."""
    from calorista_spark.catalog import fan_out

    sets = fan_out(docs).select(
        F.col(id_col), F.array_distinct(shingles(text_col, n)).alias("sh")
    )
    if materialize:
        from calorista_spark.operators.checkpoint import stage_checkpoint

        sets = stage_checkpoint(sets, eager=False)
    return sets


def _minhash_wide_cols(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    n: int,
    sets: DataFrame | None,
) -> DataFrame:
    """(id, mh_0..mh_{k-1}) — the single minhash aggregation every
    formulation below derives from: each shingle row computes one md5
    and ``num_hashes`` integer permutations; one groupBy runs
    ``num_hashes`` min() aggregates (map-side combined, no seed×shingle
    row explosion). The shuffle payload is ≤ num_hashes longs/doc."""
    if sets is None:
        # inline expression (NOT via shingle_sets): keeping the explode
        # fused with the shingle projection measurably beats the
        # two-step select (2.3x at sf0.1)
        from calorista_spark.catalog import fan_out

        sh = fan_out(docs).select(
            F.col(id_col),
            F.explode(F.array_distinct(shingles(text_col, n))).alias("shingle"),
        )
    else:
        sh = sets.select(F.col(id_col), F.explode("sh").alias("shingle"))
    h = shingle_base_hash(F.col("shingle"))
    per_shingle = sh.select(id_col, h.alias("h"))
    return per_shingle.groupBy(id_col).agg(
        *[
            F.min(
                (F.lit(MINHASH_A[i]) * F.col("h") + F.lit(MINHASH_B[i])) % MINHASH_P
            ).alias(f"mh_{i}")
            for i in range(num_hashes)
        ]
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    n: int = 3,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Long-format MinHash signatures: (id, seed, minhash) — an unpivot
    over the wide aggregate (:func:`_minhash_wide_cols`)."""
    wide = _minhash_wide_cols(docs, id_col, text_col, num_hashes, n, sets)
    long = wide.unpivot(
        [id_col], [f"mh_{i}" for i in range(num_hashes)], "seed_name", "minhash"
    )
    return long.select(
        id_col,
        F.substring("seed_name", 4, 10).cast("int").alias("seed"),
        "minhash",
    )


def minhash_wide(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    n: int = 3,
    sets: DataFrame | None = None,
) -> DataFrame:
    """(id, sig array<long>) — the doc's minhashes in seed order, from
    ONE aggregation (r15, guide §2.4): the long→wide round trip the
    index storage format previously paid (unpivot to (id, seed,
    minhash), then a second groupBy + sorted collect_list back to an
    array) is a pure projection over the wide aggregate's columns."""
    wide = _minhash_wide_cols(docs, id_col, text_col, num_hashes, n, sets)
    return wide.select(
        id_col,
        F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_band_keys(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    n: int = 3,
    rows_per_band: int = 4,
    sets: DataFrame | None = None,
) -> DataFrame:
    """(id, band, band_key) directly from the wide minhash aggregate
    (r15, guide §2.4 "remove shuffles outright"): band keys are a pure
    per-row projection over mh_0..mh_{k-1} — the long-format detour
    (unpivot to k rows/doc, a SECOND Exchange on (id, band), a sorted
    collect_list per band) drops out of every LSH consumer's plan. Key
    text is byte-identical to :func:`lsh_band_keys`' output (minhashes
    in seed order, '|'-joined), the equivalence NearDupIndex.band_keys
    already pins in tests."""
    wide = _minhash_wide_cols(docs, id_col, text_col, num_hashes, n, sets)
    n_bands = num_hashes // rows_per_band
    entries = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"mh_{b * rows_per_band + j}").cast("string")
                        for j in range(rows_per_band)
                    ],
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return wide.select(id_col, F.explode(entries).alias("e")).select(
        id_col, "e.band", "e.band_key"
    )


def lsh_band_keys(signatures: DataFrame, id_col: str, rows_per_band: int) -> DataFrame:
    """Collapse signatures into per-(doc, band) keys. Band key = the
    band's minhashes concatenated in seed order (deterministic via
    sorted struct collect)."""
    banded = signatures.withColumn(
        "band", (F.col("seed") / rows_per_band).cast("int")
    )
    return banded.groupBy(id_col, "band").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                lambda s: s.getField("minhash").cast("string"),
            ),
            "|",
        ).alias("band_key")
    )


def lsh_candidate_pairs(
    band_keys: DataFrame, id_col: str, materialize_bands: bool = False
) -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing at least one band key —
    a self equi-join on (band, band_key): pure hash join, no cartesian.

    ``materialize_bands`` (r10) stage-checkpoints the band-key frame
    before the self-join, so the shingle→minhash→band pipeline that
    produced it executes exactly ONCE regardless of AQE's exchange-
    reuse decisions: both join branches read the same tiny checkpoint
    (bands/doc rows), the same both-branches pattern simhash's
    signature checkpoint uses. Measured without it (SCALING_r10 first
    runs): AQE replanning drops subtree reuse as inputs grow, so the
    signature aggregation re-executed 2×/3×/4× at 1×/4×/16× scale —
    a phantom superlinear record exponent on a linear pipeline.
    Standalone queries pass True; composed DAGs with their own stage
    boundaries (corpus_e2e) keep the default.
    """
    if materialize_bands:
        from calorista_spark.operators.checkpoint import stage_checkpoint

        band_keys = stage_checkpoint(band_keys, eager=True)
    a = band_keys.select(
        F.col(id_col).alias("id_a"), "band", F.col("band_key").alias("k_a")
    )
    b = band_keys.select(
        F.col(id_col).alias("id_b"), "band", F.col("band_key").alias("k_b")
    )
    # SHUFFLE_HASH pin (r10): the band frame is corpus-sized (bands/doc
    # rows), so broadcasting it is only ever possible at toy scale —
    # AQE does exactly that at small SF and tips to a shuffle join as
    # estimates grow, a per-scale strategy flip that read as
    # superlinear record growth in the scaling gate. Pinning the
    # 100 TB-honest strategy makes the plan identical at every scale:
    # both sides shuffle once on (band, key), records = 2·bands/doc·n.
    return (
        a.join(
            b.hint("shuffle_hash"),
            (a["band"] == b["band"])
            & (a["k_a"] == b["k_b"])
            & (a["id_a"] < b["id_b"]),
        )
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    sets: DataFrame | None = None,
    materialize_pairs: bool = False,
) -> DataFrame:
    """Exact Jaccard over distinct word n-grams for candidate pairs
    (the verify stage after LSH banding).

    r10 (VERDICT r9 #7): the pair side carries an explicit broadcast
    hint in BOTH lookups. Post-banding candidate pairs are O(true
    near-dups) — orders of magnitude below the corpus (329 pairs per
    5000 docs on the synthetic corpus; the bound is a property of
    banding, not of scale) — so the shingle-set side NEVER shuffles,
    at any scale. Without the hint, AQE broadcasts at small SF and
    tips to a shuffle join as size estimates grow, which is both a
    needless corpus shuffle and a measurement discontinuity in the
    record-volume scaling gate (the r9 exception list existed solely
    to explain it).

    ``materialize_pairs`` stage-checkpoints the candidate frame before
    it fans out into the two broadcasts (plus any downstream
    consumers): the minhash→band→bucket-join pipeline that produced it
    then executes exactly ONCE, however many consumers the final plan
    has. Without it, exchange reuse is left to the optimizer, and AQE's
    per-stage replanning drops reuse non-deterministically as inputs
    grow (measured: the band shuffle ran 2× at sf0.1 and 4× at 4×sf0.1
    — the residual superlinearity in SCALING_r10's first run).
    Standalone near-dup queries pass True; composed DAGs that manage
    their own stage boundaries (corpus_e2e) keep the default."""
    if materialize_pairs:
        from calorista_spark.operators.checkpoint import stage_checkpoint

        pairs = stage_checkpoint(pairs, eager=True)
    if sets is None:
        from calorista_spark.catalog import fan_out

        sets = fan_out(docs).select(
            F.col(id_col), F.array_distinct(shingles(text_col, n)).alias("sh")
        )
    with_a = sets.select(
        F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")
    ).join(F.broadcast(pairs), "id_a")
    with_b = sets.select(
        F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")
    ).join(F.broadcast(with_a), "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return with_b.select(
        "id_a",
        "id_b",
        F.when(union > 0, inter.cast("double") / union).alias("jaccard"),
    )


def simhash_32(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit SimHash per document.

    Word hash = first 8 hex chars of md5 as uint32 (engine-portable);
    per-bit contribution ±1 over distinct words; fingerprint bit b set
    iff the bit-b sum is positive.

    Columnar formulation: 32 conditional-sum aggregates over the word
    rows (bit positions are literals, so ``shiftright`` stays in
    codegen) and a single fold to the fingerprint — one groupBy, no
    word×bit row grid.
    """
    from calorista_spark.catalog import fan_out

    word_rows = fan_out(docs).select(
        F.col(id_col),
        F.explode(F.array_distinct(words_of(text_col))).alias("word"),
    )
    h = F.conv(F.substring(F.md5(F.col("word")), 1, 8), 16, 10).cast("long")
    hashed = word_rows.select(id_col, h.alias("h"))
    per_doc = hashed.groupBy(id_col).agg(
        *[
            F.sum((F.shiftright(F.col("h"), b) % 2) * 2 - 1).alias(f"s_{b}")
            for b in range(32)
        ]
    )
    fingerprint = None
    for b in range(32):
        term = F.when(F.col(f"s_{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fingerprint = term if fingerprint is None else fingerprint + term
    return per_doc.select(F.col(id_col), fingerprint.alias("simhash"))


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach the L2 norm once so top-k joins compute one dot product
    per pair instead of three."""
    return emb.withColumn("norm", l2_norm(vec_col))


def cosine_topk_bruteforce(
    queries: DataFrame,
    candidates: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k by cosine: crossJoin + per-query window.

    Correct at any N but O(|Q|·|C|) — the baseline the IVF variant is
    measured against. Ranking is on (rounded sim DESC, candidate id)
    for a deterministic total order.
    """
    from pyspark.sql import Window

    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("norm").alias("q_norm"),
    )
    from calorista_spark.catalog import fan_out

    c = with_norm(fan_out(candidates), vec_col).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("norm").alias("c_norm"),
    )
    # r14/r15 note (guide §1.2 "measure first"): an Arrow-vectorized
    # pair scorer (a numpy cumsum fold, bit-identical to `dot`) was
    # measured here twice and finally DELETED in r15 — slower on the
    # ~10k-pair brute anchors (warm 1.6 s → 3.7 s, r14) AND on the
    # 400k-pair cosine-neardup block (0.51 s → 0.72 s, r15). The
    # 64-dim JVM codegen fold wins at every pair count this engine
    # reaches; see functions/vectors.py for the full record.
    sim = F.round(
        dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")), round_digits
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("q_id") != F.col("cand_id"))
        .select("q_id", "cand_id", sim.alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_centroids(
    emb: DataFrame,
    bucket_col: str = "label",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Per-bucket centroid vectors via posexplode + per-dimension mean.

    Rounding the centroid components pins them across engines (and
    across partial-aggregation orders), so downstream distance ranks
    are deterministic. At scale this is one partial-agg shuffle of
    |buckets|×dims rows — negligible next to the data pass.
    """
    dims = emb.select(
        F.col(bucket_col), F.posexplode(F.col(vec_col)).alias("dim", "val")
    )
    per_dim = dims.groupBy(bucket_col, "dim").agg(
        F.round(F.avg(F.col("val").cast("double")), round_digits).alias("cval")
    )
    return per_dim.groupBy(bucket_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cval"))),
            lambda s: s.getField("cval"),
        ).alias("centroid")
    )


def cosine_topk_ivf(
    emb: DataFrame,
    query_filter: Column,
    bucket_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 6,
    nprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: assign each query to its ``nprobe`` nearest
    centroids, then rank only within those buckets.

    The scale path for L3: candidate set shrinks from |C| to
    nprobe·|C|/|buckets|, and the bucket lookup is a hash join on the
    bucket key instead of a crossJoin. Recall < 1.0 by construction
    (higher nprobe trades candidates for recall — measured by
    ``embedding_ivf_recall``); the exact ``cosine_topk_bruteforce``
    is the correctness baseline.
    """
    from pyspark.sql import Window

    # fan out the vector side only — ivf_centroids below must keep its
    # original partitioning (rounded avg chains into downstream ranks)
    from calorista_spark.catalog import fan_out

    norms = with_norm(fan_out(emb), vec_col)
    q = norms.filter(query_filter).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("norm").alias("q_norm"),
    )
    cents = ivf_centroids(emb, bucket_col, vec_col, round_digits).withColumn(
        "c_norm", l2_norm("centroid")
    )
    csim = F.round(
        dot("q_vec", "centroid") / (F.col("q_norm") * F.col("c_norm")), round_digits
    )
    wq = Window.partitionBy("q_id").orderBy(F.col("c_sim").desc(), F.col(bucket_col))
    assigned = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("c_sim", csim)
        .withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("q_id", "q_vec", "q_norm", F.col(bucket_col).alias("probe_bucket"))
    )
    c = norms.select(
        F.col(id_col).alias("cand_id"),
        F.col(bucket_col).alias("c_bucket"),
        F.col(vec_col).alias("c_vec"),
        F.col("norm").alias("c_norm"),
    )
    sim = F.round(
        dot("q_vec", "c_vec") / (F.col("q_norm") * F.col("c_norm")), round_digits
    )
    scored = (
        assigned.join(c, assigned["probe_bucket"] == c["c_bucket"])
        .filter(F.col("q_id") != F.col("cand_id"))
        .select("q_id", "probe_bucket", "cand_id", sim.alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
