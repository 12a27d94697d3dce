"""The operator registry must stay importable and callable — COVERAGE.md's
programmatic twin."""


def test_registry_complete_and_callable():
    from intelligent_log_analysis_anomaly_detection_tool_spark.registry import (
        all_operators,
    )

    ops = all_operators()
    assert len(ops) >= 50
    names = [o.name for o in ops]
    assert len(names) == len(set(names))
    for o in ops:
        assert callable(o.fn), o.name
        assert o.survey_ids and o.verified_by, o.name
