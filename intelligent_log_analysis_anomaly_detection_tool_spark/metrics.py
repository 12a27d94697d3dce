"""A12 run metrics via ``observe()`` — counters collected as a side effect of
the existing actions, no extra pass (the reference keeps parsed/malformed/
emitted counters inline in its loop, main.cpp:174-176,428).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_parse(parsed: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach an Observation counting parsed/malformed rows; read
    ``obs.get`` after the first action on the returned frame."""
    obs = Observation("parse_metrics")
    out = parsed.observe(
        obs,
        F.count(F.lit(1)).alias("input_rows"),
        F.count_if(~F.col("malformed")).alias("parsed"),
        F.count_if(F.col("malformed")).alias("malformed"),
    )
    return out, obs


def observed_anomalies(anomalies: DataFrame) -> tuple[DataFrame, Observation]:
    obs = Observation("anomaly_metrics")
    out = anomalies.observe(obs, F.count(F.lit(1)).alias("emitted_anomalies"))
    return out, obs
