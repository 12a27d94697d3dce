"""Routed-row equality: every detector branch vs the pure-Python oracle on
the t_small fixture (50 convs, ~5k turns, every scenario injected)."""

import numpy as np
import pandas as pd
import pytest

from intelligent_log_analysis_anomaly_detection_tool_spark.functions.parse import (
    parse_stage,
)

SORT_COLS = ["detector", "conv_id", "turn_idx", "description",
             "window_start", "window_end"]


@pytest.fixture(scope="session")
def parsed_df(fixture_df):
    df = parse_stage(fixture_df).persist()
    df.count()
    return df


def _norm_engine(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    for c in ("window_start", "window_end"):
        out[c] = (
            pd.to_datetime(out[c]).astype("int64") // 10**9
        ).where(out[c].notna()).astype("Int64")
    out["turn_idx"] = out["turn_idx"].astype("Int64")
    out["severity"] = out["severity"].astype("int64")
    out["anomaly_type"] = out["anomaly_type"].astype("int64")
    out["source"] = out["source"].astype(object).where(out["source"].notna(), None)
    return out.sort_values(SORT_COLS, ignore_index=True)


def _norm_oracle(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    for c in ("window_start", "window_end"):
        out[c] = out[c].astype("Int64")
    out["turn_idx"] = out["turn_idx"].astype("Int64")
    out["severity"] = out["severity"].astype("int64")
    out["anomaly_type"] = out["anomaly_type"].astype("int64")
    out["source"] = out["source"].astype(object).where(out["source"].notna(), None)
    return out.sort_values(SORT_COLS, ignore_index=True)


def _compare(engine_pdf, oracle_pdf, score_tol=1e-9):
    got = _norm_engine(engine_pdf)
    want = _norm_oracle(oracle_pdf)
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    cols = ["conv_id", "turn_idx", "detector", "anomaly_type", "severity",
            "window_start", "window_end", "source", "description"]
    pd.testing.assert_frame_equal(
        got[cols].reset_index(drop=True), want[cols].reset_index(drop=True)
    )
    np.testing.assert_allclose(
        got["score"].to_numpy(float), want["score"].to_numpy(float),
        rtol=score_tol, atol=score_tol,
    )


def _oracle_det(oracle_result, name):
    a = oracle_result["anomalies"]
    return a[a["detector"] == name].reset_index(drop=True)


def test_rare_ip(parsed_df, oracle_result):
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.detectors.rare_ip import (
        rare_ip_anomalies,
    )

    got = rare_ip_anomalies(parsed_df).toPandas()
    want = _oracle_det(oracle_result, "rare_ip")
    assert len(want) > 0, "fixture must exercise W4"
    _compare(got, want)


def test_spike(parsed_df, oracle_result):
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.detectors.spike import (
        spike_anomalies,
    )

    got = spike_anomalies(parsed_df).toPandas()
    want = _oracle_det(oracle_result, "spike")
    assert len(want) > 0, "fixture must exercise W1"
    _compare(got, want)


def test_statistical(parsed_df, oracle_result):
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.detectors.statistical import (
        statistical_anomalies,
    )

    got = statistical_anomalies(parsed_df).toPandas()
    want = _oracle_det(oracle_result, "statistical")
    assert len(want) > 0, "fixture must exercise W2"
    _compare(got, want, score_tol=1e-6)


def test_fused_spike_statistical(parsed_df, oracle_result):
    """The fused W1+W2 pass (one shared sort, used by online_anomalies) must
    emit exactly the union of the standalone detectors' oracle rows."""
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.detectors.online_fused import (
        spike_statistical_anomalies,
    )

    got = spike_statistical_anomalies(parsed_df).toPandas()
    a = oracle_result["anomalies"]
    want = a[a["detector"].isin(["spike", "statistical"])].reset_index(drop=True)
    assert len(want) > 0
    _compare(got, want, score_tol=1e-6)


def test_burst(parsed_df, oracle_result):
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.detectors.burst import (
        burst_anomalies,
    )

    got = burst_anomalies(parsed_df).toPandas()
    want = _oracle_det(oracle_result, "burst")
    assert len(want) > 0, "fixture must exercise W3"
    _compare(got, want)


def test_timewindow(parsed_df, oracle_result):
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.detectors.timewindow import (
        timewindow_anomalies,
    )

    got = timewindow_anomalies(parsed_df).toPandas()
    want = _oracle_det(oracle_result, "timewindow")
    assert len(want) > 0, "fixture must exercise W5"
    _compare(got, want)


def test_frequency(parsed_df, oracle_result):
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.detectors.frequency import (
        frequency_anomalies,
    )

    got = frequency_anomalies(parsed_df).toPandas()
    want = _oracle_det(oracle_result, "frequency")
    assert len(want) > 0, "fixture must exercise A8"
    _compare(got, want)


def test_pattern(parsed_df, oracle_result):
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.detectors.pattern import (
        pattern_anomalies,
    )

    got = pattern_anomalies(parsed_df).toPandas()
    want = _oracle_det(oracle_result, "pattern")
    assert len(want) > 0, "fixture must exercise A10/A11"
    _compare(got, want)


def test_parser_malformed(parsed_df, oracle_result):
    from intelligent_log_analysis_anomaly_detection_tool_spark.plans.pipeline import (
        parser_anomalies,
    )

    got = parser_anomalies(parsed_df).toPandas()
    want = _oracle_det(oracle_result, "parser").copy()
    assert len(want) > 0
    # engine uses NULL windows for malformed (reference: wall-clock now)
    want["window_start"] = None
    want["window_end"] = None
    _compare(got, want)
