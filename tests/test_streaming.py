"""Structured Streaming operators: the custom stateful sessionizer must
agree with the batch window-algebra sessionizer on every session the
watermark has flushed (§2.10; applyInPandasWithState + EventTimeTimeout)."""

from pyspark.sql import functions as F

from goprowl_spark import streaming
from goprowl_spark.operators import sessions

SF_DIR = "/root/testdata/sf0.001"


def test_stream_sessionize_matches_batch_flushed_prefix(spark):
    path = f"{SF_DIR}/events.parquet"
    got = streaming.sessionize_stream(
        spark, path, gap_minutes=30, watermark="30 minutes",
        query_name="t_sessions",
    )
    batch = sessions.sessionize(
        spark.read.parquet(path), gap_minutes=30
    )
    # the stream can only have flushed sessions whose (end + gap) the final
    # watermark passed; everything it DID emit must match batch exactly
    got_rows = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["session_start"], r["session_end"])
        for r in got.collect()
    }
    assert got_rows, "stream emitted no sessions — watermark never advanced?"
    batch_rows = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["session_start"], r["session_end"])
        for r in batch.collect()
    }
    for k, v in got_rows.items():
        assert k in batch_rows, f"stream emitted session {k} unknown to batch"
        assert batch_rows[k] == v, f"session {k}: stream {v} != batch {batch_rows[k]}"
    # and it must have flushed a meaningful share (events span >> watermark)
    assert len(got_rows) >= 0.5 * len(batch_rows)
