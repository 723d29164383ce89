"""Streaming over the REAL events testdata (whatever ts layout the
driver generated — micros today, nanos historically): the streamed
tumbling aggregation must equal the batch query the oracle gate
already verifies."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from calorista_spark.queries.streaming_windows import events_tumbling_daily
from calorista_spark.streaming.incremental import read_events_stream, tumbling_agg


def test_streamed_tumbling_equals_batch_on_real_events(spark, sf_dir):
    # no watermark: complete-mode agg doesn't need one, and watermarks
    # require TIMESTAMP (ltz) — the ntz repair keeps values tz-stable
    # for the oracle comparison instead
    from calorista_spark.functions.numeric import quantized_sum

    stream = read_events_stream(spark, sf_dir)
    agg = tumbling_agg(
        stream,
        "ts",
        "1 day",
        [
            F.count(F.lit(1)).alias("n_events"),
            # same quantized form as the batch query: stream-vs-batch
            # accumulation orders differ, so round(sum) could diverge
            quantized_sum("value").alias("total_value"),
        ],
    ).select(
        F.col("win.start").alias("win_start"), "n_events", "total_value"
    )
    name = f"real_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        r.win_start: (r.n_events, r.total_value)
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    batch = {
        r.win_start: (r.n_events, r.total_value)
        for r in events_tumbling_daily(spark, sf_dir).collect()
    }
    assert streamed == batch and len(batch) >= 28  # ~30 days of events
