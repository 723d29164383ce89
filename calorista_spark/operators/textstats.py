"""Text analysis for LLM-corpus curation (SURVEY §2.11 L4).

Language-ID (stopword-hit heuristic), quality scoring, token counting,
and document fingerprinting — all as native column expressions over the
``documents`` table, engine-portable so the DuckDB oracle can compute
the identical result.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from calorista_spark.operators.similarity import words_of

# Small per-language marker lists (function words). Deliberately tiny:
# the operator is a deterministic scoring rule, not a trained model —
# the scale story (one pass, no shuffle) is what matters at 100 TB.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "une", "que", "dans"),
    "es": ("el", "la", "los", "y", "es", "una", "que", "en"),
}

# English stopword list for the quality score's stopword ratio.
EN_STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "are",
    "was", "that", "this", "it", "for", "on", "with", "as", "at",
)


def token_count(text: Column | str) -> Column:
    """Whitespace token count; null/empty/blank text → 0 (TOTAL —
    null text is the empty document, r6 convention)."""
    c = F.coalesce(
        F.col(text) if isinstance(text, str) else text, F.lit("")
    )
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), r"\s+"))
    )


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count: runs of letters, runs of digits, and
    single punctuation marks each count as one token (a regex stand-in
    for BPE segmentation — deliberately simple and deterministic)."""
    c = F.coalesce(
        F.col(text) if isinstance(text, str) else text, F.lit("")
    )
    return F.size(F.regexp_extract_all(c, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0))


def marker_hits(
    text: Column | str, markers: tuple[str, ...], words: Column | None = None
) -> Column:
    """How many tokens are in the marker list. Pass a pre-tokenized
    ``words`` column to share one split across several marker lists
    (Catalyst does not CSE repeated regex splits across expressions)."""
    w = words if words is not None else words_of(text)
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(w, lambda x: F.array_contains(arr, x)))


def lang_scores(
    text: Column | str, words: Column | None = None
) -> dict[str, Column]:
    return {
        lang: marker_hits(text, ms, words=words)
        for lang, ms in LANG_MARKERS.items()
    }


def predict_lang(text: Column | str, words: Column | None = None) -> Column:
    """Argmax language by marker hits; ties broken by language code
    order (deterministic); zero hits → 'und' (undetermined)."""
    scores = lang_scores(text, words=words)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
            for lang in sorted(LANG_MARKERS)
        ]
    )
    # left fold with strict > : among equal scores the alphabetically-
    # first language code wins (codes are sorted above) — deterministic.
    first_max = F.reduce(
        pairs,
        F.struct(F.lit(-1).alias("score"), F.lit("und").alias("lang")),
        lambda acc, p: F.when(
            p.getField("score") > acc.getField("score"), p
        ).otherwise(acc),
    )
    return F.when(first_max.getField("score") > 0, first_max.getField("lang")).otherwise(
        F.lit("und")
    )


def quality_features(text: Column | str) -> dict[str, Column]:
    """Deterministic quality signals (length / punctuation / stopword
    ratios — the classic pre-training corpus filters)."""
    c = F.coalesce(
        F.col(text) if isinstance(text, str) else text, F.lit("")
    )
    n_chars = F.length(c)
    n_tok = token_count(c)
    w = words_of(c)
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x)))
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), 0))
    avg_word_len = F.when(
        n_tok > 0, (F.length(F.regexp_replace(c, r"\s+", "")).cast("double") / n_tok)
    )
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "stopword_ratio": F.when(n_tok > 0, n_stop.cast("double") / n_tok),
        "punct_ratio": F.when(n_chars > 0, n_punct.cast("double") / n_chars),
        "avg_word_len": avg_word_len,
    }


def quality_score(text: Column | str) -> Column:
    """Single [0,1]-ish score combining the features — higher is
    better. The exact weights are arbitrary but fixed; what the gate
    verifies is the deterministic computation."""
    f = quality_features(text)
    length_ok = F.when(
        (f["n_tokens"] >= 10) & (f["n_tokens"] <= 100000), F.lit(0.4)
    ).otherwise(F.lit(0.0))
    stop_ok = F.when(
        F.coalesce(f["stopword_ratio"], F.lit(0.0)) >= 0.01, F.lit(0.3)
    ).otherwise(F.lit(0.0))
    punct_ok = F.when(
        F.coalesce(f["punct_ratio"], F.lit(0.0)) <= 0.2, F.lit(0.3)
    ).otherwise(F.lit(0.0))
    return length_ok + stop_ok + punct_ok


def bag_fingerprint(text: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted
    distinct token bag. Two documents with identical vocabulary sets
    collide — the cheap first-pass dedup key before MinHash."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(words_of(text))), " "))


def rolling_hash(text: Column | str, base: int = 31, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over character codes (order-SENSITIVE
    counterpart to ``bag_fingerprint``). aggregate() folds left-to-
    right so the result is deterministic and engine-portable. TOTAL on
    null: null text hashes like the empty string (0)."""
    c = F.coalesce(
        F.col(text) if isinstance(text, str) else text, F.lit("")
    )
    chars = F.split(c, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )
