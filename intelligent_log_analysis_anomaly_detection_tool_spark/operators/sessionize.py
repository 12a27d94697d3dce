"""Sessionization: gap-based session assignment over an event stream.

The reference's Silence concept (TimeWindowAnalyzer silence gap > 300s,
provably unreachable in its batch path — SURVEY.md W5) generalizes to the
standard log-pipeline operator: a new session starts when the gap since the
previous event of the same key exceeds the threshold. Classic lag + running
sum over a per-key window; in Structured Streaming the same semantics are
``session_window(ts, gap)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(df: DataFrame, key: str, ts_col: str, gap_s: int = 300,
               order_cols: list[str] | None = None) -> DataFrame:
    """Adds ``session_idx`` (0-based per key) to every row."""
    order = order_cols or [ts_col]
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(F.unix_timestamp(F.col(ts_col))).over(w)
    new_sess = F.when(
        prev.isNull() | ((F.unix_timestamp(F.col(ts_col)) - prev) > gap_s), 1
    ).otherwise(0)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_idx", F.sum(new_sess).over(w_run) - 1)


def session_stats(df: DataFrame, key: str, ts_col: str, gap_s: int = 300,
                  order_cols: list[str] | None = None) -> DataFrame:
    """One row per (key, session): event count + bounds + duration."""
    s = sessionize(df, key, ts_col, gap_s, order_cols)
    return s.groupBy(key, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))).alias(
            "duration_s"
        ),
    )
