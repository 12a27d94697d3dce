"""Per-job derived input-split sizing (round 4): the scaling-efficiency fix
must stay a pure function with the documented clamps."""

from intelligent_log_analysis_anomaly_detection_tool_spark.session import (
    derive_max_partition_bytes,
)

MIB = 1024 * 1024


def test_cap_at_stock_default():
    # 100 TB on 1000 executors x 8 cores: formula >> cap -> stock 128 MB
    assert derive_max_partition_bytes(100 * 1024**4, 8000, waves=4) == 128 * MIB


def test_floor_guards_small_inputs():
    # 200 MB input at 32 cores: raw 1.6 MB would shatter into tiny python
    # stages (catastrophic at local[32], BENCH.md round 3) -> floored to 8 MB
    assert derive_max_partition_bytes(200 * MIB, 32, waves=4) == 8 * MIB


def test_mid_range_targets_waves():
    # 820 MB at 8 cores -> ~32 tasks (4 waves) instead of ~7 stragglers
    got = derive_max_partition_bytes(820 * MIB, 8, waves=4)
    assert abs((820 * MIB) / got - 32) < 2


def test_degenerate_inputs_fall_back_to_cap():
    assert derive_max_partition_bytes(0, 8, waves=4) == 128 * MIB
    assert derive_max_partition_bytes(10 * MIB, 0, waves=4) == 128 * MIB
