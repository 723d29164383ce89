"""Stage-committed, RESUMABLE composed pretraining job (r9) — the two
round-9 features composed: the end-to-end corpus DAG
(queries/corpus_e2e.py) with every stage boundary published as an
ATOMIC VERSION of a commit-log store (sources/commitlog.py).

Why this exists: ``run_corpus_e2e`` is the single-job shape — fast,
but a crash loses everything since its stage commits (localCheckpoint
blocks) die with the session. A production curation run over weeks of
data wants STAGE-GRANULAR durability: if the job dies after dedup but
before packing, the rerun must reuse the deduped corpus, not
re-tokenize the world. That is exactly what the commit-log manifests
provide for free — each stage's output is an immutable, fsync'd,
atomically-published snapshot, so

- a rerun REUSES every stage whose store already holds a commit for
  this input (resume),
- a crash mid-stage leaves the previous stage's snapshot intact (the
  torn-write window is structurally gone),
- every historical run stays time-travel readable for audits
  ("which exact training set did run #3 pack?").

Stage stores under ``store_root``: ``flags`` (the fully-flagged
corpus — quality/dedup/decontam/sampling verdicts as columns),
``sampled`` (the training subset), ``shards`` (the packed manifest
with BPE token counts). Commits are tagged with a fingerprint of the
input path, so pointing the runner at different data never reuses a
stale stage.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from calorista_spark.sources.commitlog import CommitLogStore

STAGES = ("flags", "sampled", "shards")


def _input_tag(sf_dir: str) -> str:
    """Identity of the input corpus for stage-reuse decisions.

    r10 (ADVICE r9): the tag folds in a cheap CONTENT fingerprint of
    the documents parquet (file names + sizes + mtimes), not just the
    path — regenerating or mutating the files under ``sf_dir`` in
    place now invalidates every cached stage, so a rerun can never
    serve flags/sampled/shards computed from the old corpus. Cost is
    one directory listing, no data read.
    """
    h = hashlib.md5(sf_dir.encode())
    doc_path = os.path.join(sf_dir, "documents.parquet")
    entries = []
    if os.path.isdir(doc_path):
        for name in sorted(os.listdir(doc_path)):
            st = os.stat(os.path.join(doc_path, name))
            entries.append(f"{name}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.isfile(doc_path):
        st = os.stat(doc_path)
        entries.append(f"documents.parquet:{st.st_size}:{st.st_mtime_ns}")
    h.update("\n".join(entries).encode())
    return h.hexdigest()[:12]


def _latest_for(store: CommitLogStore, op_tag: str) -> int | None:
    """Newest committed version whose op matches this stage+input."""
    for v in reversed(store.versions()):
        if store.manifest(v).get("op") == op_tag:
            return v
    return None


def run_corpus_e2e_committed(
    spark: SparkSession,
    sf_dir: str,
    store_root: str,
    force: tuple[str, ...] = (),
) -> tuple[DataFrame, dict]:
    """Run the composed job with durable stage commits and resume.

    Returns ``(shards_df, report)`` where ``report[stage] =
    {"action": "computed" | "reused", "version": N}``. ``force``
    recomputes the named stages (and, through the data dependency,
    everything downstream of them gets fresh inputs but still reuses
    its own commit only if not forced — pass all three to rebuild).
    """
    from calorista_spark.queries.corpus_e2e import (
        build_e2e_stages,
        pack_and_tokenize,
        _shard_manifest,
    )

    tag = _input_tag(sf_dir)
    stores = {
        s: CommitLogStore(os.path.join(store_root, s)) for s in STAGES
    }
    report: dict = {}

    def _stage(name: str, compute, parent_version: int | None = None) -> DataFrame:
        # the commit tag chains the PARENT stage's version, so forcing
        # (or otherwise recomputing) an upstream stage automatically
        # invalidates every stage downstream of it — a stale "sampled"
        # can never be served against a fresh "flags"
        parent = "" if parent_version is None else f":p{parent_version}"
        op_tag = f"e2e-{name}:{tag}{parent}"
        store = stores[name]
        v = None if name in force else _latest_for(store, op_tag)
        if v is None:
            df = compute()
            v = store.commit(df, op=op_tag)
            report[name] = {"action": "computed", "version": v}
        else:
            report[name] = {"action": "reused", "version": v}
        return store.read(spark, v)

    def _compute_flags() -> DataFrame:
        frames, _ = build_e2e_stages(spark, sf_dir)
        return frames["flags"]

    flags = _stage("flags", _compute_flags)
    sampled = _stage(
        "sampled",
        lambda: flags.filter("samp").select(
            "doc_id", "source", "text", "n_tokens"
        ),
        parent_version=report["flags"]["version"],
    )
    shards = _stage(
        "shards",
        lambda: _shard_manifest(
            dict(zip(("packed", "words"), pack_and_tokenize(sampled)))
        ),
        parent_version=report["sampled"]["version"],
    )
    return shards, report
