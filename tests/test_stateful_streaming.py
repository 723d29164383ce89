"""applyInPandasWithState: per-key state carried ACROSS micro-batches
(the custom-stateful-operator surface, SURVEY §2.10)."""

from __future__ import annotations

from calorista_spark.streaming.incremental import running_totals_with_state
from tests.test_streaming import EVENT_SCHEMA, _ts, _write_batch

# foreachBatch sink (memory sink can't recover from a checkpoint);
# updates accumulate here across passes
_UPDATES: list[tuple] = []


def _collect_batch(batch, batch_id):
    _UPDATES.extend((r.key, r.n_events, r.total) for r in batch.collect())


def test_state_accumulates_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _UPDATES.clear()

    def run_pass():
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
        totals = running_totals_with_state(stream, "user_id", "value", "ts")
        q = (
            totals.writeStream.foreachBatch(_collect_batch)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_batch(spark, src, [(1, _ts(0), 10, 2.0), (2, _ts(1), 10, 3.0)])
    run_pass()
    latest = {k: (n, t) for k, n, t in _UPDATES}
    assert latest[10] == (2, 5.0)

    # second batch: state must resume from the checkpoint (n=2 → n=3)
    _write_batch(spark, src, [(3, _ts(2), 10, 4.0), (4, _ts(2), 11, 1.0)])
    run_pass()
    latest = {}
    for k, n, t in _UPDATES:  # keep the max-n update per key
        if k not in latest or n > latest[k][0]:
            latest[k] = (n, t)
    assert latest[10] == (3, 9.0)
    assert latest[11] == (1, 1.0)
