"""Synthesizer determinism + shape checks (FIXTURES.md §1)."""

import pandas as pd

from intelligent_log_analysis_anomaly_detection_tool_spark.synth import (
    synth_conv_pdf,
    synth_local,
)


def test_deterministic_per_conv():
    a = synth_conv_pdf(42, 7, 50)
    b = synth_conv_pdf(42, 7, 50)
    pd.testing.assert_frame_equal(a, b)


def test_hot_conv_share():
    pdf = synth_local(42, 50)
    share = (pdf["conv_id"] == "conv-000000").mean()
    assert 0.05 < share < 0.2  # ~10% skew fixture


def test_shapes_present():
    pdf = synth_local(42, 50)
    txt = pdf["text"]
    assert (txt == "").any()  # empties
    assert txt.str.startswith("{").any()  # json
    assert txt.str.match(r"\d{4}-\d{2}-\d{2} ").any()  # plain
    assert txt.isin(["?????", "null null null"]).any()  # malformed


def test_spark_matches_local(spark):
    local = synth_local(42, 10)
    from intelligent_log_analysis_anomaly_detection_tool_spark.synth import synth_spark

    dist = (
        synth_spark(spark, 42, 10, partitions=4)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(local, dist)
