"""Row-equality checks for the rows-only driver-gate queries, pinned to the
EXACT input the gate runs (the __spark_entry__ transcript renderings of
/root/testdata/sf0.001/events.parquet).

CORRECTNESS_r02 recorded burst_detector / statistical_detector /
pattern_novel as rows-only (no SQL oracle by design); these tests back those
rows with full-frame equality against the python reference oracle on the
driver's own rendering, so a regression that silently changes (or empties)
their output cannot pass unnoticed.
"""

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

SORT_COLS = ["conv_id", "turn_idx", "description", "window_start", "window_end"]
CMP_COLS = ["conv_id", "turn_idx", "detector", "anomaly_type", "severity",
            "window_start", "window_end", "source", "description"]


def _spark_frame(df):
    got = df.toPandas()
    for c in ("window_start", "window_end"):
        got[c] = (
            (pd.to_datetime(got[c]).astype("int64") // 10**9)
            .where(got[c].notna())
            .astype("Int64")
        )
    got["turn_idx"] = got["turn_idx"].astype("Int64")
    got["severity"] = got["severity"].astype("int64")
    got["anomaly_type"] = got["anomaly_type"].astype("int64")
    return got


def _oracle_frame(want):
    want = want.copy()
    for c in ("window_start", "window_end"):
        want[c] = want[c].astype("Int64")
    want["turn_idx"] = want["turn_idx"].astype("Int64")
    want["severity"] = want["severity"].astype("int64")
    want["anomaly_type"] = want["anomaly_type"].astype("int64")
    return want


def _assert_equal(got, want):
    assert len(want) > 0, "oracle produced no rows — the check is vacuous"
    got = got.sort_values(SORT_COLS, ignore_index=True, na_position="first")
    want = want.sort_values(SORT_COLS, ignore_index=True, na_position="first")
    assert len(got) == len(want), f"{len(got)} != {len(want)}"
    for frame in (got, want):
        frame["source"] = frame["source"].astype(object).where(
            frame["source"].notna(), None
        )
    pd.testing.assert_frame_equal(
        got[CMP_COLS].reset_index(drop=True),
        want[CMP_COLS].reset_index(drop=True),
    )
    np.testing.assert_allclose(
        got["score"].to_numpy(float), want["score"].to_numpy(float),
        rtol=1e-6, atol=1e-9,
    )


@pytest.fixture(scope="module")
def driver_oracle(spark):
    """Oracle anomalies over the SPARSE driver rendering (real event times)."""
    import __spark_entry__ as em
    from oracle.reference_oracle import run_table

    pdf = em.events_as_transcripts(spark, SF_DIR).toPandas()
    return run_table(pdf)["anomalies"]


def test_burst_detector_driver_row_nonvacuous_and_oracle_equal(spark):
    """VERDICT r2 item 1: q_burst_detector (dense rendering, min_repeats=5)
    fires and matches the python oracle row-for-row on the same input."""
    import __spark_entry__ as em
    from oracle.reference_oracle import run_table

    got = _spark_frame(em.q_burst_detector(spark, SF_DIR))
    assert len(got) > 0, "burst_detector driver row is vacuous again"

    pdf = em.events_as_transcripts(
        spark, SF_DIR, step_s=em.BURST_DRIVER_STEP_S
    ).toPandas()
    want = run_table(
        pdf, cfg={"burst_min_repeats": em.BURST_DRIVER_MIN_REPEATS}
    )["anomalies"]
    want = _oracle_frame(want[want["detector"] == "burst"])
    _assert_equal(got, want)


def test_pattern_novel_driver_rendering_oracle_equal(spark, driver_oracle):
    """VERDICT r2 item 5: pattern_novel on the driver's sf0.001 rendering
    equals the python oracle frame-for-frame."""
    import __spark_entry__ as em

    got = _spark_frame(em.q_pattern_novel(spark, SF_DIR))
    want = _oracle_frame(driver_oracle[driver_oracle["detector"] == "pattern"])
    _assert_equal(got, want)


def test_statistical_detector_driver_rendering_oracle_equal(spark, driver_oracle):
    """VERDICT r2 item 5: statistical_detector on the driver's sf0.001
    rendering equals the python oracle frame-for-frame."""
    import __spark_entry__ as em

    got = _spark_frame(em.q_statistical_detector(spark, SF_DIR))
    want = _oracle_frame(
        driver_oracle[driver_oracle["detector"] == "statistical"]
    )
    _assert_equal(got, want)
