"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <sec>, "unit": "sec", "queries": {...}, "sf": ...}

The headline number is the full parse->enrich->route->aggregate pipeline wall
time over a transcript rendering of the events table (the engine's real DAG:
Arrow pandas-UDF parse, five detector branches, minute pivot, routing join),
plus per-operator query timings. Scaling-efficiency runs (local[8] vs
local[32]) live in bench/scaling.py and are reported in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from intelligent_log_analysis_anomaly_detection_tool_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="bench",
        shuffle_partitions=max(8, int(CPUS)),
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # --- headline: full pipeline over transcripts rendered from events ---
    from intelligent_log_analysis_anomaly_detection_tool_spark.functions.parse_select import (
        parse_stage,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.aggregates import (
        minute_stats,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.plans.pipeline import (
        offline_anomalies,
        online_anomalies,
    )

    tr = events_rows = None
    t0 = time.time()
    tr = entrymod.events_as_transcripts(spark, SF_DIR)
    tr = tr.persist()
    events_rows = tr.count()
    timings["prepare_input"] = time.time() - t0

    t0 = time.time()
    parsed = parse_stage(tr).persist()
    parsed.count()
    timings["parse"] = time.time() - t0

    t0 = time.time()
    online = online_anomalies(parsed).persist()
    online.count()
    timings["detect_online"] = time.time() - t0

    t0 = time.time()
    _noop_write(offline_anomalies(parsed))
    timings["detect_offline"] = time.time() - t0

    t0 = time.time()
    _noop_write(minute_stats(parsed, online))
    timings["aggregate_minutes"] = time.time() - t0

    timings["pipeline_stage_sum"] = (
        timings["parse"]
        + timings["detect_online"]
        + timings["detect_offline"]
        + timings["aggregate_minutes"]
    )
    parsed.unpersist()
    online.unpersist()

    # headline: the REAL job shape — fresh end-to-end wall with the two
    # post-parse branches submitted concurrently (same DAG bench/scaling.py
    # measures); the sequential per-stage numbers above stay as diagnostics
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.time()
    parsed2 = parse_stage(tr).persist()
    parsed2.count()
    online2 = online_anomalies(parsed2).persist()

    def _online_then_minutes():
        online2.count()
        _noop_write(minute_stats(parsed2, online2))

    def _offline():
        _noop_write(offline_anomalies(parsed2))

    with ThreadPoolExecutor(max_workers=2) as ex:
        for f in [ex.submit(_online_then_minutes), ex.submit(_offline)]:
            f.result()
    pipeline_sec = time.time() - t0
    timings["pipeline_total"] = pipeline_sec
    parsed2.unpersist()
    online2.unpersist()
    tr.unpersist()

    # --- per-operator paired queries (same set the correctness gate runs) ---
    for name, fn in entrymod.queries().items():
        t0 = time.time()
        _noop_write(fn(spark, SF_DIR))
        timings[name] = time.time() - t0

    out = {
        "metric": "e2e_parse_route_aggregate_sec",
        "value": round(pipeline_sec, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": SF_DIR,
        "rows": events_rows,
        "throughput_rows_per_sec": round(events_rows / pipeline_sec, 1),
        "cpus": CPUS,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
