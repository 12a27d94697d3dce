"""Driver job-submission-gap profiler (round 5).

Measures how much of the concurrent pipeline's wall clock the driver spends
with NO Spark job in flight — planning, Arrow collects, python control flow
between actions. This is the "~10 sequential job submissions x 1-3 s each"
overhead identified in round 4 as the one honest driver-side lever on the
2->8 scaling ratio: gap time is pure serial fraction (it does not shrink
with cores), so at local[8] it costs the ratio roughly gap/wall.

Method: after the pipeline completes (same concurrent per-branch submission
as bench/scaling.py), read the Spark status REST API's per-job
submissionTime/completionTime, take the union of the closed intervals, and
report wall - union = gap. Intervals are merged, so overlapping concurrent
jobs are not double-counted.

Usage:
    python bench/job_gaps.py [input_dir] [master]
    # defaults: /tmp/bench_transcripts local[8]
"""
import datetime
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from intelligent_log_analysis_anomaly_detection_tool_spark.plans.pipeline import run_concurrent_dag
from intelligent_log_analysis_anomaly_detection_tool_spark.session import get_spark


def _ts(s: str) -> float:
    return datetime.datetime.strptime(
        s, "%Y-%m-%dT%H:%M:%S.%f%Z"
    ).timestamp()


def main() -> None:
    input_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_transcripts"
    master = sys.argv[2] if len(sys.argv) > 2 else "local[8]"
    # the shipped session disables the UI (perf); this profiler needs the
    # status REST API it serves, so re-enable just for this measurement
    spark = get_spark(
        master=master,
        input_path=input_dir,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    tr = spark.read.parquet(input_dir)

    t0 = time.time()
    run_concurrent_dag(tr)
    wall = time.time() - t0

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs") as r:
        jobs_meta = json.load(r)
    # clip to the measured pipeline window so jobs outside it (e.g. the
    # row-count job below) cannot leak into the coverage union
    ivals = sorted(
        (max(s, t0), min(e, t0 + wall))
        for s, e in (
            (_ts(j["submissionTime"]), _ts(j["completionTime"]))
            for j in jobs_meta
            if "completionTime" in j
        )
        if e > t0 and s < t0 + wall
    )
    covered, cur_s, cur_e = 0.0, None, None
    for s, e in ivals:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        covered += cur_e - cur_s
    span = ivals[-1][1] - ivals[0][0] if ivals else 0.0
    print(
        json.dumps(
            {
                "metric": "driver_job_submission_gap",
                "master": master,
                "rows": tr.count(),
                "wall_sec": round(wall, 1),
                "n_jobs": len(ivals),
                "job_union_sec": round(covered, 1),
                "job_span_sec": round(span, 1),
                "gap_inside_span_sec": round(span - covered, 1),
                "gap_total_sec": round(wall - covered, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
