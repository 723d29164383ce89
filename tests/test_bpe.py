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


def test_driver_trainer_matches_spark_loop(spark):
    """The real-vocab driver loop must produce the IDENTICAL merge
    sequence and final vocab as the all-Spark loop on a shared
    prefix — the r7 acceptance pin for swapping the registered
    queries onto the driver path."""
    from calorista_spark.operators.bpe import (
        learn_bpe_merges,
        learn_bpe_merges_driver,
    )

    texts = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest newest",
        "wider wider new new",
        "aaaa aaaa aa baaab",  # overlapping-run edge
    ]
    docs = spark.createDataFrame([(t,) for t in texts], ["text"])
    m_spark, v_spark = learn_bpe_merges(docs, 8)
    m_driver, v_driver = learn_bpe_merges_driver(docs, 8)
    assert m_driver == m_spark
    vs = {r.word: tuple(r.symbols) for r in v_spark.collect()}
    vd = {r.word: tuple(r.symbols) for r in v_driver.collect()}
    assert vd == vs


def test_driver_trainer_matches_reference_at_depth(spark):
    """Deep-vocab check: 200 merges vs the pure-python reference —
    exercises the lazy-deletion heap through count increases,
    decreases, and pair re-creation."""
    from calorista_spark.operators.bpe import learn_bpe_merges_driver

    texts = [
        " ".join(f"w{i % 37}x{i % 11}" for i in range(200)),
        " ".join(f"pre{i % 13}fix" for i in range(150)),
        "banana bandana ananas banana banana bandana",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], ["text"])
    got, _ = learn_bpe_merges_driver(docs, 200)
    want, _ = _ref_bpe(texts, 200)
    assert got == want


def test_driver_trainer_max_words_cap(spark):
    """max_words keeps only the top-N (cnt desc, word asc) words —
    the 100 TB frequency-truncation path."""
    from calorista_spark.operators.bpe import learn_bpe_merges_driver

    texts = ["aa aa aa bb bb cc"]
    docs = spark.createDataFrame([(t,) for t in texts], ["text"])
    merges, vocab = learn_bpe_merges_driver(docs, 8, max_words=2)
    assert sorted(r.word for r in vocab.collect()) == ["aa", "bb"]
    # 'cc' dropped: only (a,a▁) cnt 3 and (b,b▁) cnt 2 are learnable
    assert merges == [("a", "a▁", 3), ("b", "b▁", 2)]


def test_learn_bpe_deterministic_rerun(spark, sf_dir):
    from calorista_spark.catalog import read_table
    from calorista_spark.operators.bpe import learn_bpe_merges

    docs = read_table(spark, sf_dir, "documents").limit(100)
    m1, _ = learn_bpe_merges(docs, 4)
    m2, _ = learn_bpe_merges(docs, 4)
    assert m1 == m2 and len(m1) == 4


def test_string_pipeline_matches_fold_chain(spark):
    """The double-separator replace() rendering used by
    corpus_bpe_compression (both engines) must tokenize identically to
    the merge_pair_expr array-fold chain — including overlapping runs
    and merges that cascade into each other."""
    from pyspark.sql import functions as F

    from calorista_spark.operators.bpe import EOW, merge_pair_expr
    from calorista_spark.queries.corpus_lm import (
        _N_SYM,
        _TOK_EXPR_SPARK,
        BPE_FIXED_MERGES,
    )

    words = [
        "aaaaa", "low", "lower", "newest", "to", "ato", "terrrer",
        "er", "a", "tttooo", "water", "lulu", "asinerer", "tolu",
        "erer", "inin", "as", "lu",
    ]
    df = spark.createDataFrame([(w,) for w in words], ["word"])
    chars = F.split(F.col("word"), "")
    n = F.size(chars)
    v = df.select(
        "word",
        F.concat(
            F.slice(chars, 1, n - 1),
            F.array(F.concat(F.element_at(chars, -1), F.lit(EOW))),
        ).alias("symbols"),
    )
    for left, right in BPE_FIXED_MERGES:
        v = v.withColumn("symbols", merge_pair_expr(left, right))
    fold = {r.word: len(r.symbols) for r in v.collect()}
    pipe = {
        r.word: r.n_sym
        for r in df.select(
            "word", F.expr(_N_SYM.format(t=_TOK_EXPR_SPARK)).alias("n_sym")
        ).collect()
    }
    assert pipe == fold
