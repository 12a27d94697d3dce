"""W5 TimeWindowAnalyzer: first-event-aligned tumbling 60s buckets per conv.

Reference semantics (/root/reference/src/analysis/TimeWindowAnalyzer.cpp:
144-285; defaults include/analysis/TimeWindowAnalyzer.hpp:105-109):

- windows aligned to the FIRST event's timestamp (not wall minutes); advancing
  pushes completed windows (including empty ones) into a 12-deep history
- at end of run, the current window + the 12 history slots are checked:
  error-rate > 0.5 -> "Error spike" (score min(1, 2*rate), i.e. always 1.0),
  totalEvents > 100 -> "Event burst" (score min(1, total/100), always 1.0)
- silence (gap > 300s between history.back().end and current.start) is
  PROVABLY unreachable in the batch path: windows are contiguous by
  construction, the gap is always 0 (SURVEY.md W5). Reproduced as never-firing.
- severity mapping by score (main.cpp:393-408): >=0.9 High, >=0.6 Medium,
  else Low -> always High here; type FrequencySpike (desc never contains
  "Silence")

Spark-first: anchor = min(ts) per conv; bucket = floor((ts-anchor)/60);
groupBy(conv, bucket) counts; only buckets with index >= max_index - 12
participate (empty buckets occupy history slots but can never fire).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ...config import TimeWindowConfig
from .common import S_HIGH, S_LOW, S_MED, T_FREQ_SPIKE, as_anomaly, with_epoch


def _fmt_error_spike():
    # lazy: pandas_udf registration needs an active session (Spark 4)
    def fmt(rate: pd.Series, start: pd.Series, end: pd.Series) -> pd.Series:
        s = pd.to_datetime(start, unit="s").dt.strftime("%H:%M:%S")
        e = pd.to_datetime(end, unit="s").dt.strftime("%H:%M:%S")
        return pd.Series(
            [f"Error spike: {r * 100:.1f}% errors in [{a}-{b}]"
             for r, a, b in zip(rate, s, e)],
            index=rate.index,
        )

    return pandas_udf(fmt, "string")


def timewindow_anomalies(
    parsed: DataFrame, cfg: TimeWindowConfig = TimeWindowConfig()
) -> DataFrame:
    df = with_epoch(parsed.filter(~F.col("malformed")))
    # anchor via partial-agg + broadcast join (NOT a conv-partition window):
    # a hot conversation never funnels through a single window task
    anchors = df.groupBy("conv_id").agg(F.min("epoch").alias("anchor"))
    df = df.join(F.broadcast(anchors), "conv_id")
    df = df.withColumn(
        "bucket", F.floor((F.col("epoch") - F.col("anchor")) / cfg.window_s)
    )

    agg = df.groupBy("conv_id", "anchor", "bucket").agg(
        F.count(F.lit(1)).alias("total"),
        F.count_if(F.col("level_ord").isin(4, 5)).alias("errors"),
    )
    # history depth: current bucket + max_history_windows slots behind it
    w_max = Window.partitionBy("conv_id")
    agg = agg.withColumn("max_bucket", F.max("bucket").over(w_max)).filter(
        F.col("bucket") >= F.col("max_bucket") - cfg.max_history_windows
    )

    agg = agg.withColumn(
        "w_start", F.col("anchor") + F.col("bucket") * cfg.window_s
    ).withColumn("w_end", F.col("w_start") + cfg.window_s)
    rate = F.col("errors") / F.col("total")

    # ONE pass over the bucket aggregate: the error-spike row and the
    # event-burst row are emitted via a filtered-array explode (r6; same
    # shape as pattern_anomalies' two descriptions) — the former
    # err/burst UNION consumed the whole anchors+agg subtree twice, i.e.
    # two extra passes over the parsed cache and two duplicate shuffles.
    # Row multiset is unchanged (a bucket matching both still emits both).
    err_struct = F.when(
        rate > cfg.error_rate_threshold,
        F.struct(
            F.least(F.lit(1.0), rate * 2.0).alias("score"),
            _fmt_error_spike()(rate, F.col("w_start"), F.col("w_end")).alias(
                "description"
            ),
        ),
    )
    burst_struct = F.when(
        F.col("total") > cfg.burst_threshold,
        F.struct(
            F.least(
                F.lit(1.0), F.col("total") / F.lit(float(cfg.burst_threshold))
            ).alias("score"),
            F.concat(
                F.lit("Event burst: "),
                F.col("total").cast("string"),
                F.lit(f" events in {cfg.window_s}s window"),
            ).alias("description"),
        ),
    )
    out = agg.select(
        "conv_id",
        F.lit(None).cast("int").alias("turn_idx"),
        F.lit("timewindow").alias("detector"),
        F.lit(T_FREQ_SPIKE).alias("anomaly_type"),
        F.timestamp_seconds("w_start").alias("window_start"),
        F.timestamp_seconds("w_end").alias("window_end"),
        F.lit(None).cast("string").alias("source"),
        F.explode(
            F.filter(F.array(err_struct, burst_struct), lambda x: x.isNotNull())
        ).alias("fire"),
    ).select(
        "conv_id", "turn_idx", "detector", "anomaly_type",
        F.col("fire.score").alias("score"),
        "window_start", "window_end", "source",
        F.col("fire.description").alias("description"),
    )
    sev_ord = (
        F.when(F.col("score") >= 0.9, S_HIGH)
        .when(F.col("score") >= 0.6, S_MED)
        .otherwise(S_LOW)
    )
    out = out.withColumn("severity", sev_ord)
    return as_anomaly(out)
