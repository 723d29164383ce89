"""BPE merge learning vs a pure-python reference implementation."""

from __future__ import annotations

from collections import Counter


def _ref_bpe(texts, num_merges):
    """Sennrich reference: word-freq dict, chars + EOW on last char,
    best pair by (count desc, pair asc), non-overlapping LTR merge.
    Tokenizes with the pure-python twin of the r8 Unicode tokenizer."""
    from calorista_spark.operators.bpe import EOW, py_bpe_words

    freq = Counter()
    for t in texts:
        for w in py_bpe_words(t):
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


def test_unicode_tokenizer_cross_impl_parity(spark):
    """The Spark tokenizer, the DuckDB rendering, and the pure-python
    twin must tokenize a hostile multilingual battery identically —
    incl. the two Java-vs-utf8proc lowercase divergences (final sigma,
    İ → i+combining-dot), kana/han/thai codepoint fallback, combining
    marks, and astral separators."""
    import duckdb
    from pyspark.sql import functions as F

    from calorista_spark.operators.bpe import (
        bpe_words_of,
        bpe_words_sql,
        py_bpe_words,
    )

    texts = [
        "Hello, 世界! Ça va? こんにちは ดีมาก",
        "İstanbul STRASSE ße ΣΊΣΥΦΟΣ ΟΔΟΣ",
        "日本語のテキスト処理 中文分词",
        "ПРИВЕТ мир 한국어 텍스트",
        "covid19 abc123def emoji 😀 ﬁnal",
        "", "  ", "字", None,
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    spark_out = [
        r.w
        for r in df.select(
            F.filter(
                bpe_words_of("text"), lambda w: F.length(w) > 0
            ).alias("w")
        ).collect()
    ]
    con = duckdb.connect()
    sql = bpe_words_sql("?")
    duck_out = [
        con.execute(
            f"SELECT list_filter({sql}, w -> length(w) > 0)", [t]
        ).fetchone()[0]
        for t in texts
    ]
    py_out = [py_bpe_words(t) for t in texts]
    assert spark_out == duck_out == py_out
    # the fallback actually fires: CJK text char-tokenizes
    assert "世" in spark_out[0] and "こ" in spark_out[0]
    # segmented non-Latin scripts keep whole words
    assert "привет" in spark_out[3] and "한국어" in spark_out[3]


def test_unicode_trainer_matches_reference(spark):
    """BPE training over a multilingual corpus: driver trainer vs the
    pure-python reference — non-Latin words must reach the vocabulary
    (the r7 gap: the [^a-z]+ splitter silently dropped them all)."""
    from calorista_spark.operators.bpe import learn_bpe_merges_driver

    texts = [
        "привет мир привет мир привет",
        "das straße straße über über",
        "你好 世界 你好 你好",  # chars: merge (你, 好▁) learnable
        "καλημέρα κόσμε καλημέρα",
        "ดี มาก ดี มาก",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], ["text"])
    got, vocab = learn_bpe_merges_driver(docs, 12)
    want, _ = _ref_bpe(texts, 12)
    assert got == want and len(got) > 0
    words = {r.word for r in vocab.collect()}
    assert "привет" in words and "straße" in words
    # unsegmented fallback: han chars enter as single-codepoint words
    assert "你" in words and "好" in words


def test_fertility_sees_non_latin_langs(spark):
    """r7 verdict acceptance pin: the fertility report must produce
    rows with n_words > 0 for non-Latin languages instead of dropping
    them at the tokenizer."""
    from calorista_spark.queries.corpus_lm import _fertility_report

    docs = spark.createDataFrame(
        [
            ("zh", "数据 处理 系统 数据"),
            ("ru", "обработка данных система"),
            ("en", "the data processing system"),
            ("el", "ΟΔΟΣ οδος"),  # sigma canonicalization: one word
        ],
        ["lang", "text"],
    )
    rows = {r.lang: r for r in _fertility_report(docs).collect()}
    assert set(rows) == {"zh", "ru", "en", "el"}
    assert rows["zh"].n_words == 8  # 8 han codepoint-words
    assert rows["zh"].tokens_per_word == 1.0  # single-char words
    assert rows["ru"].n_words == 3 and rows["ru"].n_bpe_tokens > 0
    # final-sigma fold: both spellings count as the same word
    assert rows["el"].n_words == 2


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


def test_driver_trainer_min_count_floor_and_stats(spark):
    """r11 (VERDICT r10 #7): min_count drops hapax-tail words BEFORE
    the driver collect (the web-scale OOM guard), composes with
    max_words, and the opt-in stats dict records the truncation so a
    capped train can't read as a full one."""
    from calorista_spark.operators.bpe import learn_bpe_merges_driver

    docs = spark.createDataFrame(
        [("aaa aaa aaa bbb bbb ccc",)], "text string"
    )
    st: dict = {}
    merges, vocab = learn_bpe_merges_driver(
        docs, 4, min_count=2, stats=st
    )
    kept = {r.word for r in vocab.select("word").collect()}
    assert kept == {"aaa", "bbb"}  # ccc (cnt 1) dropped by the floor
    assert st == {"words_total": 3, "words_kept": 2, "words_dropped": 1}
    # floor + cap compose: floor first, then top-N of the survivors
    st2: dict = {}
    _, vocab2 = learn_bpe_merges_driver(
        docs, 4, min_count=2, max_words=1, stats=st2
    )
    assert {r.word for r in vocab2.select("word").collect()} == {"aaa"}
    assert st2["words_kept"] == 1 and st2["words_dropped"] == 2
    # merges learned under the floor still only see surviving words
    assert all(cnt >= 2 for _, _, cnt in merges)
