"""Kill-and-resume: interrupted run + resume == uninterrupted run."""

import pandas as pd
import pytest


def _read_anoms(spark, out):
    return (
        spark.read.parquet(f"{out}/anomalies_routed")
        .drop("bucket")
        .toPandas()
        .sort_values(
            ["detector", "conv_id", "turn_idx", "description", "window_start"],
            ignore_index=True,
            na_position="first",
        )
    )


def test_resume_after_injected_failure(spark, fixture_df, oracle_result, tmp_path):
    from intelligent_log_analysis_anomaly_detection_tool_spark.checkpoint import (
        completed_buckets,
        run_resumable,
    )

    out1 = str(tmp_path / "full")
    run_resumable(spark, fixture_df, out1, n_buckets=8, buckets_per_batch=3)
    assert completed_buckets(out1) == set(range(8))

    out2 = str(tmp_path / "crashy")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_resumable(
            spark, fixture_df, out2, n_buckets=8, buckets_per_batch=3,
            fail_after_buckets=4,
        )
    done_mid = completed_buckets(out2)
    assert 0 < len(done_mid) < 8

    resumed = run_resumable(spark, fixture_df, out2, n_buckets=8,
                            buckets_per_batch=3)
    assert set(resumed) == set(range(8)) - done_mid
    assert completed_buckets(out2) == set(range(8))

    a = _read_anoms(spark, out1)
    b = _read_anoms(spark, out2)
    pd.testing.assert_frame_equal(a.drop(columns=["score"]), b.drop(columns=["score"]))

    # lineage totals == oracle totals
    import json, os

    lineage = []
    for f in os.listdir(f"{out2}/_checkpoints"):
        with open(f"{out2}/_checkpoints/{f}") as fh:
            lineage.append(json.load(fh))
    assert sum(x["parsed"] for x in lineage) == (
        (~oracle_result["parsed"]["malformed"]).sum()
    )
    assert sum(x["malformed"] for x in lineage) == (
        oracle_result["parsed"]["malformed"].sum()
    )
    total_anoms = sum(
        sum(x["anomalies_by_detector"].values()) for x in lineage
    )
    assert total_anoms == len(oracle_result["anomalies"])
