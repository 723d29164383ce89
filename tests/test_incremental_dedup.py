"""Incremental near-dup admission against a persisted signature index
(operators/incremental_dedup.py): admission statuses, exactly-once
replay, the no-near-dups-in-index invariant, and the empty-shingle
convention."""

from __future__ import annotations

import itertools

from calorista_spark.operators.incremental_dedup import NearDupIndex
from calorista_spark.sources.commitlog import CommitLogStore

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


def test_streaming_admission_exactly_once(spark, tmp_path):
    """start_neardup_admission: micro-batches admit in order with
    batch_id = epoch, a crash between the index commit and the
    admitted-docs commit replays exactly-once, and the final admitted
    store equals what sequential admit() calls produce."""
    import os
    import time

    import pytest

    root = str(tmp_path)
    feed = [
        _docs(spark, [(1, _T1), (2, _T2)]),
        _docs(spark, [(10, _T1), (11, _T3), (12, _T3)]),
        _docs(spark, [(20, _T4), (21, _T3)]),
    ]
    src = os.path.join(root, "src")
    os.makedirs(src)
    schema = feed[0].schema
    for i, f in enumerate(feed):
        d = os.path.join(src, f"f{i}")
        f.coalesce(1).write.parquet(d)
        t = time.time() - 10 + i
        for name in os.listdir(d):
            os.utime(os.path.join(d, name), (t, t))

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )

    from calorista_spark.operators.incremental_dedup import (
        start_neardup_admission,
    )

    idx_path = os.path.join(root, "idx")
    adm_path = os.path.join(root, "admitted")
    ckpt = os.path.join(root, "ckpt")
    flag = os.path.join(root, "bomb")
    open(flag, "w").close()

    def bomb(batch_id: int) -> None:
        if batch_id == 1 and os.path.exists(flag):
            os.unlink(flag)
            raise RuntimeError("injected failure on batch 1")

    q = start_neardup_admission(
        stream(), idx_path, ckpt, admitted_path=adm_path, on_batch=bomb
    )
    with pytest.raises(Exception):
        q.awaitTermination()
    q2 = start_neardup_admission(
        stream(), idx_path, ckpt, admitted_path=adm_path
    )
    q2.awaitTermination()

    adm = CommitLogStore(adm_path)
    got = {(r.doc_id, r.text) for r in adm.read(spark).collect()}
    # 10 dups 1, 12 dups 11, 21 dups 11(indexed): all dropped
    assert got == {(1, _T1), (2, _T2), (11, _T3), (20, _T4)}
    idx = NearDupIndex(idx_path)
    assert {r.doc_id for r in idx.index_signatures(spark).collect()} == {
        1, 2, 11, 20,
    }
    # both ledgers applied batches 0..2 exactly once
    assert adm.last_batch_id() == 2
    assert idx.store.last_batch_id() == 2


def test_family_params_are_stamped_and_validated(spark, tmp_path):
    """r13 (ADVICE r12): the hash-family parameters are stamped into
    the store on first open; reopening with different parameters (or
    different constants — covered by the digest) fails loudly instead
    of silently not matching persisted signatures."""
    import json
    import os

    import pytest

    p = str(tmp_path / "idx")
    idx = NearDupIndex(p, num_hashes=16, rows_per_band=4)
    idx.admit(spark, _docs(spark, [(1, _T1)]), batch_id=1)
    # same params reopen: fine
    NearDupIndex(p, num_hashes=16, rows_per_band=4)
    # different family: loud failure
    with pytest.raises(ValueError, match="parameter mismatch"):
        NearDupIndex(p, num_hashes=8, rows_per_band=4)
    with pytest.raises(ValueError, match="parameter mismatch"):
        NearDupIndex(p, num_hashes=16, rows_per_band=4, threshold=0.9)
    # a constants change (r12's fix was one) trips the digest even
    # with identical named parameters
    sp = os.path.join(p, "_neardup_family.json")
    stamped = json.load(open(sp))
    stamped["constants_digest"] = "0" * 16
    json.dump(stamped, open(sp, "w"))
    with pytest.raises(ValueError, match="constants_digest"):
        NearDupIndex(p, num_hashes=16, rows_per_band=4)


def test_doc_id_reuse_with_changed_text_rejected(spark, tmp_path):
    """r13 (ADVICE r12): re-ingesting an EXISTING doc_id with changed
    text in a new batch is rejected (immutability), while identical
    resends and ledger replays pass."""
    import pytest

    idx = NearDupIndex(str(tmp_path / "idx"))
    idx.admit(spark, _docs(spark, [(1, _T1), (2, _T2)]), batch_id=1)
    # identical resend without a ledger entry: allowed, report stable
    r = idx.admit(spark, _docs(spark, [(1, _T1)]))
    assert [(x.doc_id, x.status) for x in r.collect()] == [
        (1, "admitted")
    ]
    # changed text under a reused id in a NEW batch: rejected
    with pytest.raises(ValueError, match="immutable"):
        idx.admit(spark, _docs(spark, [(1, _T4)]), batch_id=2)
    # the index is untouched by the rejected batch
    assert {r.doc_id for r in idx.index_signatures(spark).collect()} == {
        1,
        2,
    }
    # a REPLAY of batch 1 (ledger high-water mark) still passes even
    # though its ids are all indexed
    r1 = idx.admit(spark, _docs(spark, [(1, _T1), (2, _T2)]), batch_id=1)
    assert {(x.doc_id, x.status) for x in r1.collect()} == {
        (1, "admitted"),
        (2, "admitted"),
    }


def test_retract_then_admit_and_compact(spark, tmp_path):
    """r13 (VERDICT r12 #8): a retracted doc stops blocking future
    admissions; compaction physically purges the retracted signature
    and bin-packs the accreted per-batch files without changing the
    index contents."""
    idx = NearDupIndex(str(tmp_path / "idx"))
    idx.admit(spark, _docs(spark, [(1, _T1), (2, _T2)]), batch_id=1)
    idx.admit(spark, _docs(spark, [(3, _T3)]), batch_id=2)
    # 10 duplicates indexed doc 1 -> rejected
    r = idx.admit(spark, _docs(spark, [(10, _T1)]), batch_id=3)
    assert [x.status for x in r.collect()] == ["corpus_dup"]
    idx.retract(spark, [1])
    assert {r.doc_id for r in idx.index_signatures(spark).collect()} == {
        2,
        3,
    }
    # the retracted doc no longer blocks: 11 (same text) admits
    r = idx.admit(spark, _docs(spark, [(11, _T1)]), batch_id=4)
    assert [x.status for x in r.collect()] == ["admitted"]
    before = {
        (r.doc_id, tuple(r.sig))
        for r in idx.index_signatures(spark).collect()
    }
    n_files_before = len(
        idx.store.manifest(idx.store.latest_version())["files"]
    )
    idx.compact(spark)
    after = {
        (r.doc_id, tuple(r.sig))
        for r in idx.index_signatures(spark).collect()
    }
    assert after == before
    m = idx.store.manifest(idx.store.latest_version())
    assert len(m["files"]) <= n_files_before
    assert not m.get("dv")  # retracted signature physically erased
    # replay ledger survived maintenance: batch 4 still skips
    r = idx.admit(spark, _docs(spark, [(11, _T1)]), batch_id=4)
    assert [x.status for x in r.collect()] == ["admitted"]
    assert {r.doc_id for r in idx.index_signatures(spark).collect()} == {
        2,
        3,
        11,
    }


def test_rebuild_under_new_params_matches_fresh_index(spark, tmp_path):
    """r13 (VERDICT r12 #8): rebuilding an index under CHANGED family
    parameters yields exactly the state a fresh index with those
    parameters would reach over the same corpus — old-family state is
    fully discarded."""
    corpus = _docs(
        spark,
        [(1, _T1), (2, _T2), (3, _T1 + " extra"), (4, _T3), (5, _T3)],
    )
    p_old = str(tmp_path / "old")
    idx = NearDupIndex(p_old, num_hashes=16, rows_per_band=4)
    idx.admit(spark, corpus, batch_id=1)
    report = idx.rebuild(
        spark, corpus, num_hashes=8, rows_per_band=2, threshold=0.6
    )
    statuses = {(r.doc_id, r.status) for r in report.collect()}
    # fresh index under the NEW parameters over the same corpus
    fresh = NearDupIndex(
        str(tmp_path / "fresh"),
        num_hashes=8,
        rows_per_band=2,
        threshold=0.6,
    )
    fr = fresh.admit(spark, corpus, batch_id=1)
    fresh_statuses = {
        (r.doc_id, r.status) for r in fr.collect()
    }
    assert statuses == fresh_statuses
    got = {
        (r.doc_id, tuple(r.sig))
        for r in idx.index_signatures(spark).collect()
    }
    want = {
        (r.doc_id, tuple(r.sig))
        for r in fresh.index_signatures(spark).collect()
    }
    assert got == want
    # the stamp was rewritten: old params now fail, new ones open
    import pytest

    with pytest.raises(ValueError, match="parameter mismatch"):
        NearDupIndex(p_old, num_hashes=16, rows_per_band=4)
    NearDupIndex(p_old, num_hashes=8, rows_per_band=2, threshold=0.6)
