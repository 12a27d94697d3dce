"""W4 IpFrequencyDetector: first N occurrences of each IPv4 per conversation.

Reference semantics (/root/reference/src/anomaly/IpFrequencyDetector.cpp:14-45;
default include/anomaly/IpFrequencyDetector.hpp:46): first IPv4-looking token
in the message (``\\b\\d{1,3}(?:\\.\\d{1,3}){3}\\b``), running count per IP in
file order, emit while count <= 5. Anomaly: RarePattern, Low, [ts, ts],
score 1.0, desc "Rare IP observed (count=N): ip" (main.cpp:346-360).

Spark-first: ``row_number() over (partitionBy(conv_id, ip) orderBy(turn_idx))
<= 5`` — exact, embarrassingly parallel, no state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ...config import IpConfig
from .common import S_LOW, T_RARE, as_anomaly

IP_RE = r"(\b\d{1,3}(?:\.\d{1,3}){3}\b)"


def rare_ip_anomalies(parsed: DataFrame, cfg: IpConfig = IpConfig()) -> DataFrame:
    df = parsed.filter(~F.col("malformed")).withColumn(
        "ip", F.regexp_extract("message", IP_RE, 1)
    )
    df = df.filter(F.col("ip") != "")
    w = Window.partitionBy("conv_id", "ip").orderBy("turn_idx")
    df = df.withColumn("ip_count", F.row_number().over(w)).filter(
        F.col("ip_count") <= cfg.max_count_for_rare
    )
    out = df.select(
        "conv_id",
        "turn_idx",
        F.lit("rare_ip").alias("detector"),
        F.lit(T_RARE).alias("anomaly_type"),
        F.lit(S_LOW).alias("severity"),
        F.col("ts_parsed").alias("window_start"),
        F.col("ts_parsed").alias("window_end"),
        F.lit(1.0).alias("score"),
        F.col("source"),
        F.concat(
            F.lit("Rare IP observed (count="),
            F.col("ip_count").cast("string"),
            F.lit("): "),
            F.col("ip"),
        ).alias("description"),
    )
    return as_anomaly(out)
