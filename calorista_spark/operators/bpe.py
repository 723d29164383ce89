"""BPE merge learning (Sennrich et al., "Neural Machine Translation
of Rare Words with Subword Units") — the tokenizer-training step of a
pretraining data pipeline, done Spark-first.

The classic algorithm trains on the WORD-FREQUENCY table, not the raw
corpus: one corpus pass builds ``(word, count)`` (map-side-combined
groupBy — the only stage that scales with data volume), then every
merge iteration runs over the vocabulary-sized symbol table:

1. explode adjacent symbol pairs, weighted by word count;
2. pick the most frequent pair (ties: lexicographic (left, right) —
   deterministic across engines/cluster sizes);
3. rewrite each word's symbol array, merging non-overlapping
   occurrences left-to-right (a single ``aggregate`` fold — no
   Python in the loop).

The winning pair is a ONE-ROW collect per iteration — the learned
artifact itself, not data (same class as the broadcast offsets of the
two-pass rank). The vocab table is localCheckpointed each round to
truncate the iterative lineage, mirroring
:func:`operators.graph.connected_components`.

At 100 TB you'd train on the hash-sampled slice
(``doc_hash_sample``) — the algorithm is identical; only the first
groupBy sees the full corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from calorista_spark.operators.similarity import words_of

# end-of-word marker, kept out of the corpus alphabet
EOW = "▁"


def word_freq_symbols(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, symbols) — symbols = characters + end-of-word
    marker appended to the final character, per the classic setup."""
    words = docs.select(F.explode(words_of(text_col)).alias("word")).filter(
        F.length("word") > 0
    )
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    chars = F.split(F.col("word"), "")
    n = F.size(chars)
    symbols = F.concat(
        F.slice(chars, 1, n - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit(EOW))),
    )
    return freq.select(
        "word", "cnt", F.when(n > 0, symbols).otherwise(chars).alias("symbols")
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the symbol table, weighted by
    word count: ``(left, right, pair_count)``."""
    pairs = F.zip_with(
        F.slice("symbols", 1, F.size("symbols") - 1),
        F.slice("symbols", 2, F.size("symbols") - 1),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        vocab.filter(F.size("symbols") >= 2)
        .select("cnt", F.explode(pairs).alias("p"))
        .groupBy("p.left", "p.right")
        .agg(F.sum("cnt").alias("pair_count"))
    )


def merge_pair_expr(left: str, right: str) -> Column:
    """Rewrite ``symbols`` with non-overlapping left-to-right merges
    of (left, right) — the exact reference semantics — as one fold:
    carry the previous unmerged symbol; when it is ``left`` and the
    current is ``right``, emit the merged token and clear the carry."""
    la, rb = F.lit(left), F.lit(right)
    step = lambda acc, s: F.when(  # noqa: E731
        acc.getField("prev").isNotNull()
        & (acc.getField("prev") == la)
        & (s == rb),
        F.struct(
            F.concat(acc.getField("out"), F.array(F.concat(la, rb))).alias(
                "out"
            ),
            F.lit(None).cast("string").alias("prev"),
        ),
    ).otherwise(
        F.struct(
            F.when(
                acc.getField("prev").isNotNull(),
                F.concat(acc.getField("out"), F.array(acc.getField("prev"))),
            )
            .otherwise(acc.getField("out"))
            .alias("out"),
            s.alias("prev"),
        )
    )
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )
    return F.aggregate(
        F.col("symbols"),
        init,
        step,
        lambda acc: F.when(
            acc.getField("prev").isNotNull(),
            F.concat(acc.getField("out"), F.array(acc.getField("prev"))),
        ).otherwise(acc.getField("out")),
    )


def learn_bpe_merges(
    docs: DataFrame, num_merges: int, text_col: str = "text"
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``num_merges`` BPE merges; returns (merges, final vocab).

    ``merges`` is ``[(left, right, pair_count), ...]`` in learning
    order. Stops early when no pair repeats (pair_count < 2 would
    only memorize single words)."""
    vocab = word_freq_symbols(docs, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for it in range(num_merges):
        top = (
            pair_counts(vocab)
            .orderBy(
                F.col("pair_count").desc(), F.col("left"), F.col("right")
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] < 2:
            break
        left, right, cnt = (
            top[0]["left"],
            top[0]["right"],
            int(top[0]["pair_count"]),
        )
        merges.append((left, right, cnt))
        vocab = vocab.withColumn("symbols", merge_pair_expr(left, right))
        # checkpoint every 2nd merge: lineage depth 2 is safe, and
        # each eager localCheckpoint is a full job — halving them cut
        # the 8-merge train ~25% at sf0.1
        if it % 2 == 1 or it == num_merges - 1:
            vocab = vocab.localCheckpoint(eager=True)
    return merges, vocab
