"""BPE merge learning vs a pure-python reference implementation."""

from __future__ import annotations

import re
from collections import Counter


def _ref_bpe(texts, num_merges):
    """Sennrich reference: word-freq dict, chars + EOW on last char,
    best pair by (count desc, pair asc), non-overlapping LTR merge."""
    from calorista_spark.operators.bpe import EOW

    freq = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if w:
                freq[w] += 1
    vocab = {
        w: tuple(list(w[:-1]) + [w[-1] + EOW]) for w in freq
    }
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < 2:
            break
        merges.append((a, b, cnt))
        new_vocab = {}
        for w, syms in vocab.items():
            out, prev = [], None
            for s in syms:
                if prev is not None and prev == a and s == b:
                    out.append(a + b)
                    prev = None
                else:
                    if prev is not None:
                        out.append(prev)
                    prev = s
            if prev is not None:
                out.append(prev)
            new_vocab[w] = tuple(out)
        vocab = new_vocab
    return merges, vocab


def test_learn_bpe_matches_reference(spark):
    from calorista_spark.operators.bpe import learn_bpe_merges

    texts = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "wider wider new new",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], ["text"])
    got_merges, got_vocab = learn_bpe_merges(docs, 8)
    want_merges, want_vocab = _ref_bpe(texts, 8)
    assert got_merges == want_merges
    got = {
        r.word: tuple(r.symbols)
        for r in got_vocab.select("word", "symbols").collect()
    }
    assert got == want_vocab


def test_merge_handles_overlapping_runs(spark):
    # "aaaa" + (a,a) must merge LTR non-overlapping: [aa, aa], not 3
    from pyspark.sql import functions as F

    from calorista_spark.operators.bpe import merge_pair_expr

    df = spark.createDataFrame(
        [(["a", "a", "a", "a", "a"],)], ["symbols"]
    )
    out = df.select(merge_pair_expr("a", "a").alias("m")).first().m
    assert out == ["aa", "aa", "a"]


def test_learn_bpe_deterministic_rerun(spark, sf_dir):
    from calorista_spark.catalog import read_table
    from calorista_spark.operators.bpe import learn_bpe_merges

    docs = read_table(spark, sf_dir, "documents").limit(100)
    m1, _ = learn_bpe_merges(docs, 4)
    m2, _ = learn_bpe_merges(docs, 4)
    assert m1 == m2 and len(m1) == 4
