"""Streaming checkpoint/resume: a stateful burst query stopped after half the
input and restarted on the same checkpoint must produce exactly the batch/
oracle results — per-key deque state (including mid-burst trims) survives the
restart."""

import pandas as pd


def test_streaming_burst_resume(spark, fixture_df, oracle_result, tmp_path):
    from intelligent_log_analysis_anomaly_detection_tool_spark.streaming.pipeline import (
        read_transcript_stream,
        streaming_burst,
    )

    in_dir = str(tmp_path / "in")
    cp_dir = str(tmp_path / "cp")
    out_dir = str(tmp_path / "out")

    # half 1: early turns of every conversation
    fixture_df.filter("turn_idx < 40").repartition(4, "conv_id").write.mode(
        "overwrite"
    ).parquet(in_dir)

    def run_once():
        q = (
            streaming_burst(read_transcript_stream(spark, in_dir))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()

    # half 2: the remaining turns arrive as NEW files; restart on the same
    # checkpoint — only the new files are processed, state carries over
    fixture_df.filter("turn_idx >= 40").repartition(4, "conv_id").write.mode(
        "append"
    ).parquet(in_dir)
    run_once()

    got = (
        spark.read.parquet(out_dir)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    oa = oracle_result["anomalies"]
    want = (
        oa[oa["detector"] == "burst"]
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    assert len(got) == len(want)
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["turn_idx"].astype(int).tolist() == want["turn_idx"].astype(int).tolist()
    assert got["window_start"].tolist() == want["window_start"].tolist()
    assert got["score"].tolist() == want["score"].tolist()
