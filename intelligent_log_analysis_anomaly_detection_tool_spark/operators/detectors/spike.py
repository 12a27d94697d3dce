"""W1 SpikeDetector: short-vs-baseline event-rate ratio per (conv, source).

Reference semantics (/root/reference/src/anomaly/SpikeDetector.cpp:24-85,
158-213; defaults include/anomaly/SpikeDetector.hpp:143-146):

- per source, trailing event-time windows of 60s (short) and 600s (baseline),
  both including the current row; eviction strictly ``age > W``
- currentRate = cur/60, baselineRate = base/600, ratio = currentRate/baselineRate
- fire iff ratio > 3.0 && cur >= 5 && base >= 10
- severity = min(1, (ratio-1)/(threshold-1)) -> with ratio > 3 this is always
  1.0, so main.cpp:295-309 always maps it to Critical
- rows with empty source are skipped (SpikeDetector.cpp:32-37)
- rateOfChange is dead code (previousCount never written,
  SpikeDetector.cpp:177-180) -> ROC=0.00 constant in descriptions
- anomaly: type FrequencySpike, window [ts-60s, ts], score = ratio

Spark-first: pure window expressions, no state, no UDF in the hot path; only
the firing rows' descriptions are formatted in an Arrow-batched pandas UDF
(printf-style half-even rounding to match C++ iostreams).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ...config import SpikeConfig
from .common import S_CRIT, S_HIGH, S_MED, T_FREQ_SPIKE, as_anomaly, with_epoch


def _fmt_factory(window_s: int):
    @pandas_udf("string")
    def fmt(source: pd.Series, cur: pd.Series, ratio: pd.Series) -> pd.Series:
        return pd.Series(
            [
                f"Spike detected: {s} ({int(c)} events in {window_s}s, "
                f"{r:.1f}x baseline, ROC=0.00"
                for s, c, r in zip(source, cur, ratio)
            ],
            index=source.index,
        )

    return fmt


def spike_anomalies(parsed: DataFrame, cfg: SpikeConfig = SpikeConfig()) -> DataFrame:
    df = parsed.filter((~F.col("malformed")) & (F.col("source") != ""))
    df = with_epoch(df)

    # rank ordered by (epoch, turn_idx) — identical to file order under the
    # monotonic-ts invariant (common.event_order_window) — so the rank window
    # and both range counts share ONE sort: 1 sort, 1 exchange (plan audit)
    from .common import event_order_window, older_than_window

    keys = ("conv_id", "source")
    df = df.withColumn("rn", F.row_number().over(event_order_window(*keys)))
    df = df.withColumn(
        "cur",
        F.col("rn")
        - F.count(F.lit(1)).over(older_than_window(cfg.short_window_s, *keys)),
    ).withColumn(
        "base",
        F.col("rn")
        - F.count(F.lit(1)).over(older_than_window(cfg.baseline_window_s, *keys)),
    )

    ratio = (F.col("cur") / F.lit(float(cfg.short_window_s))) / (
        F.col("base") / F.lit(float(cfg.baseline_window_s))
    )
    df = df.withColumn("ratio", ratio).filter(
        (F.col("ratio") > cfg.threshold)
        & (F.col("cur") >= cfg.min_current)
        & (F.col("base") >= cfg.min_baseline)
    )

    sev = F.least(F.lit(1.0), (F.col("ratio") - 1.0) / (cfg.threshold - 1.0))
    sev_ord = (
        F.when(sev >= 0.9, S_CRIT).when(sev >= 0.6, S_HIGH).otherwise(S_MED)
    )
    fmt = _fmt_factory(cfg.short_window_s)
    out = df.select(
        "conv_id",
        "turn_idx",
        F.lit("spike").alias("detector"),
        F.lit(T_FREQ_SPIKE).alias("anomaly_type"),
        sev_ord.alias("severity"),
        F.timestamp_seconds(F.col("epoch") - cfg.short_window_s).alias("window_start"),
        F.col("ts_parsed").alias("window_end"),
        F.col("ratio").alias("score"),
        F.when(F.col("source") == "", None).otherwise(F.col("source")).alias("source"),
        fmt(F.col("source"), F.col("cur"), F.col("ratio")).alias("description"),
    )
    return as_anomaly(out)
