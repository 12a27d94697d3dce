"""Checkpoint/resume with per-partition lineage (north rule; no reference
analogue — the C++ tool is one process, one file, restart-from-zero).

Input is bucketed by conversation: ``bucket = pmod(xxhash64(conv_id), P)``.
Because every stateful operator is keyed per conv_id, a bucket is a closed
semantic unit — buckets can be processed independently, in any order, and a
re-run of a bucket is deterministic. That is exactly what makes the run
resumable:

- each completed bucket commits a manifest JSON (atomic write-then-rename)
  under ``<out>/_checkpoints/`` recording its lineage: input rows, parsed,
  malformed, per-sink anomaly counts
- sink data lands under ``bucket=<k>/`` subdirectories (a partition commit,
  mirroring an Iceberg append per bucket)
- on resume, completed buckets are skipped by manifest lookup (the anti-join
  is against a tiny driver-side set, so it compiles to a pushed-down filter
  on the bucket column, not a shuffle)

On a real cluster each bucket batch is one Spark job; bucket count P trades
off resume granularity vs job overhead (at 10^12 turns, P ~ 10k buckets of
~100 GB each keeps both sane).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import DEFAULT_CONFIG, PipelineConfig


def with_bucket(transcripts: DataFrame, n_buckets: int) -> DataFrame:
    return transcripts.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("conv_id")), F.lit(n_buckets))
    )


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_checkpoints")


def completed_buckets(out_dir: str) -> set[int]:
    d = _manifest_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("bucket-") and name.endswith(".json"):
            out.add(int(name[len("bucket-"):-len(".json")]))
    return out


def _commit_manifest(out_dir: str, bucket: int, lineage: dict) -> None:
    d = _manifest_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as fh:
        json.dump(lineage, fh, indent=2)
    os.replace(tmp, os.path.join(d, f"bucket-{bucket}.json"))


def run_resumable(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    n_buckets: int = 8,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    buckets_per_batch: int = 4,
    fail_after_buckets: int | None = None,
) -> dict:
    """Process the table bucket-batch by bucket-batch, committing a manifest
    per completed bucket. Re-invoking after a crash resumes from the first
    uncommitted bucket. ``fail_after_buckets`` injects a crash for tests.

    Returns {bucket: lineage} for the buckets processed in THIS invocation.
    """
    from .functions.parse_select import parse_stage
    from .plans.pipeline import all_anomalies

    done = completed_buckets(out_dir)
    pending = [b for b in range(n_buckets) if b not in done]
    processed: dict[int, dict] = {}
    n_done_this_run = 0

    # dynamic partition overwrite makes bucket re-processing idempotent: a
    # bucket whose data landed but whose manifest did not commit (crash in
    # between) is simply overwritten on resume — exactly-once per bucket.
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    bt = with_bucket(transcripts, n_buckets)

    for lo in range(0, len(pending), buckets_per_batch):
        batch = pending[lo : lo + buckets_per_batch]
        part = bt.filter(F.col("bucket").isin([int(b) for b in batch]))
        parsed = parse_stage(part).persist()
        anomalies = all_anomalies(parsed, cfg)

        input_rows = {
            r["bucket"]: r["n"]
            for r in part.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        parse_counts = {
            (r["bucket"], bool(r["malformed"])): r["n"]
            for r in parsed.groupBy("bucket", "malformed")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        conv_bucket = part.select("conv_id", "bucket").distinct()
        anom_counts = (
            anomalies.join(conv_bucket, "conv_id")
            .groupBy("bucket", "detector")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        anom_by_bucket: dict[int, dict[str, int]] = {}
        for r in anom_counts:
            anom_by_bucket.setdefault(r["bucket"], {})[r["detector"]] = r["n"]

        # materialize routed sink data per bucket directory (partition commit)
        (
            anomalies.join(conv_bucket, "conv_id")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(os.path.join(out_dir, "anomalies_routed"))
        )
        parsed.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(out_dir, "parsed_turns")
        )
        parsed.unpersist()

        for b in batch:
            lineage = {
                "bucket": int(b),
                "input_rows": int(input_rows.get(b, 0)),
                "parsed": int(parse_counts.get((b, False), 0)),
                "malformed": int(parse_counts.get((b, True), 0)),
                "anomalies_by_detector": anom_by_bucket.get(b, {}),
            }
            _commit_manifest(out_dir, int(b), lineage)
            processed[int(b)] = lineage
            n_done_this_run += 1
            if fail_after_buckets is not None and n_done_this_run >= fail_after_buckets:
                raise RuntimeError(f"injected failure after {n_done_this_run} buckets")

    return processed
