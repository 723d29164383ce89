"""Incremental near-dup admission against a persisted signature index
(operators/incremental_dedup.py): admission statuses, exactly-once
replay, the no-near-dups-in-index invariant, and the empty-shingle
convention."""

from __future__ import annotations

import itertools

from calorista_spark.operators.incremental_dedup import NearDupIndex

_T1 = "the quick brown fox jumps over the lazy dog tonight"
_T2 = "completely different text about spark execution engines and plans"
_T3 = "novel unique content streaming incremental admission test alpha beta"
_T4 = "third unrelated passage regarding columnar storage formats and stats"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_admission_statuses_and_index_growth(spark, tmp_path):
    idx = NearDupIndex(str(tmp_path / "idx"))
    r1 = idx.admit(spark, _docs(spark, [(1, _T1), (2, _T2)]), batch_id=1)
    assert {(r.doc_id, r.status) for r in r1.collect()} == {
        (1, "admitted"),
        (2, "admitted"),
    }
    r2 = idx.admit(
        spark,
        _docs(
            spark,
            [
                (10, _T1),  # duplicates indexed doc 1
                (11, _T3),  # fresh
                (12, _T3),  # duplicates 11 within the batch
                (13, "xy z"),  # < 3 words: no shingles, admitted
            ],
        ),
        batch_id=2,
    )
    assert {(r.doc_id, r.status) for r in r2.collect()} == {
        (10, "corpus_dup"),
        (11, "admitted"),
        (12, "batch_dup"),
        (13, "admitted"),
    }
    # index holds signatures for admitted SIGNED docs only: 13 has no
    # shingles, so it is admitted but never indexed
    indexed = {r.doc_id for r in idx.index_signatures(spark).collect()}
    assert indexed == {1, 2, 11}
    # a later batch duplicating 11 is now a corpus_dup
    r3 = idx.admit(spark, _docs(spark, [(20, _T3)]), batch_id=3)
    assert [(r.doc_id, r.status) for r in r3.collect()] == [
        (20, "corpus_dup")
    ]


def test_replayed_batch_is_exactly_once(spark, tmp_path):
    idx = NearDupIndex(str(tmp_path / "idx"))
    idx.admit(spark, _docs(spark, [(1, _T1)]), batch_id=1)
    idx.admit(spark, _docs(spark, [(2, _T2)]), batch_id=2)
    v = idx.store.latest_version()
    # replay of batch 2 (e.g. a restarted sync): IDENTICAL report — a
    # doc must not match its own indexed signature — and no new index
    # version
    r = idx.admit(spark, _docs(spark, [(2, _T2)]), batch_id=2)
    assert [(x.doc_id, x.status) for x in r.collect()] == [
        (2, "admitted")
    ]
    assert idx.store.latest_version() == v


def test_index_never_holds_near_duplicates(spark, tmp_path):
    """Invariant: no two indexed docs are band-candidates agreeing on
    >= threshold of positions — every admission proved disjointness
    against the index as of its commit, and the index only grows."""
    idx = NearDupIndex(str(tmp_path / "idx"))
    batches = [
        [(1, _T1), (2, _T2), (3, _T1)],
        [(10, _T2), (11, _T3), (12, _T3 + " gamma")],
        [(20, _T4), (21, _T1), (22, _T4)],
    ]
    for i, b in enumerate(batches):
        idx.admit(spark, _docs(spark, b), batch_id=i + 1)
    sigs = {
        r.doc_id: list(r.sig)
        for r in idx.index_signatures(spark).collect()
    }
    rpb = idx.rows_per_band
    for a, b in itertools.combinations(sorted(sigs), 2):
        sa, sb = sigs[a], sigs[b]
        shares_band = any(
            sa[i * rpb : (i + 1) * rpb] == sb[i * rpb : (i + 1) * rpb]
            for i in range(idx.num_hashes // rpb)
        )
        agree = sum(x == y for x, y in zip(sa, sb)) / idx.num_hashes
        assert not (shares_band and agree >= idx.threshold), (a, b, agree)


def test_incremental_matches_batch_rule_on_ordered_batches(spark, tmp_path):
    """On id-ordered batches with no cross-batch transitive chains,
    incremental admission equals the one-shot lowest-id-wins rule over
    the union (the doc_neardup_dedup_survivors semantic, with the
    signature-agreement verifier)."""
    rows = [
        (1, _T1),
        (2, _T2),
        (3, _T1),  # dup of 1
        (4, _T3),
        (5, _T2),  # dup of 2
        (6, _T4),
        (7, _T4),  # dup of 6
    ]
    inc = NearDupIndex(str(tmp_path / "inc"))
    inc.admit(spark, _docs(spark, rows[:3]), batch_id=1)
    inc.admit(spark, _docs(spark, rows[3:]), batch_id=2)
    got = {r.doc_id for r in inc.index_signatures(spark).collect()}

    one = NearDupIndex(str(tmp_path / "one"))
    one.admit(spark, _docs(spark, rows), batch_id=1)
    want = {r.doc_id for r in one.index_signatures(spark).collect()}
    assert got == want == {1, 2, 4, 6}
