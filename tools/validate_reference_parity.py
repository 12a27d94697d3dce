"""Build the reference C++ tool from /root/reference, run it on its own
corpus under TZ=UTC, and diff its sinks against this engine field-by-field.

Reproduces the round-1 validation recorded in BENCH.md:
- entries.csv (S7): 21,015 rows x 4 fields, zero mismatches
- timeseries_per_minute.csv (S6): 467/468 minutes identical on all 10
  columns; the single extra row is the reference's wall-clock bucket for
  malformed lines seen before any parsed line (we use NULL — documented)
- anomaly counts: engine 42,038 == python oracle; reference 42,065 of which
  27 are uninitialized-memory artifacts (TimeWindowAnalyzer.hpp:32 UB)

Usage: python tools/validate_reference_parity.py
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
CORPUS = f"{REF}/data-set/mixed_format_log_2_3MB.log"
BUILD = "/tmp/ref_parity_build"


def build_and_run() -> None:
    os.makedirs(BUILD, exist_ok=True)
    if not os.path.exists(f"{BUILD}/logtool"):
        srcs = subprocess.run(
            ["find", f"{REF}/src", "-name", "*.cpp"],
            capture_output=True, text=True, check=True,
        ).stdout.split()
        subprocess.run(
            ["g++", "-std=c++17", "-O2", "-I", f"{REF}/include", *srcs,
             "-o", f"{BUILD}/logtool"],
            check=True,
        )
    env = dict(os.environ, TZ="UTC")
    subprocess.run(
        [f"{BUILD}/logtool", "--graphs", CORPUS],
        cwd=BUILD, env=env, capture_output=True, text=True,
    )


def main() -> None:
    import pandas as pd

    from intelligent_log_analysis_anomaly_detection_tool_spark.functions.parse import (
        parse_stage,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.aggregates import (
        minute_stats,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.plans.pipeline import (
        all_anomalies,
        online_anomalies,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.session import get_spark
    from intelligent_log_analysis_anomaly_detection_tool_spark.sinks import (
        parsed_turns_view,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.sources.transcripts import (
        read_raw_log_file,
    )

    build_and_run()

    spark = get_spark(master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    df = read_raw_log_file(spark, CORPUS, conv_id="run")
    parsed = parse_stage(df).persist()

    ours = parsed_turns_view(parsed).toPandas().sort_values(
        "turn_idx", ignore_index=True
    )
    ref = pd.read_csv(f"{BUILD}/entries.csv", dtype=str, keep_default_na=False)
    assert len(ours) == len(ref) == 21015, (len(ours), len(ref))
    mism = 0
    for a, b in [("ts_iso", "timestamp_iso"), ("level_name", "level"),
                 ("source", "source"), ("message", "message")]:
        mism += sum(
            x != y for x, y in zip(ours[a].fillna("").astype(str), ref[b])
        )
    print(f"entries.csv: {len(ref)} rows, field mismatches = {mism}")
    assert mism == 0

    ts_ours = minute_stats(parsed, online_anomalies(parsed)).toPandas()
    ts_ours["minute_iso"] = pd.to_datetime(ts_ours["minute"]).dt.strftime(
        "%Y-%m-%dT%H:%M:%S"
    )
    ts_ref = pd.read_csv(f"{BUILD}/timeseries_per_minute.csv")
    merged = ts_ref.merge(ts_ours, on="minute_iso", how="inner")
    cols = ["total", "trace", "debug", "info", "warn", "error", "critical",
            "unknown", "anomalies", "malformed"]
    bad = sum(
        int((merged[f"{c}_x"].astype("int64") != merged[f"{c}_y"].astype("int64")).sum())
        for c in cols
    )
    print(f"timeseries: {len(merged)}/{len(ts_ref)} minutes compared, "
          f"cell mismatches = {bad} (1 wall-clock bucket excluded by design)")
    assert bad == 0
    assert len(merged) >= len(ts_ref) - 1

    n = all_anomalies(parsed).count()
    print(f"anomalies: engine={n} (reference publishes 42065 incl. 27 UB artifacts)")
    assert n == 42038
    print("PARITY OK")


if __name__ == "__main__":
    main()
