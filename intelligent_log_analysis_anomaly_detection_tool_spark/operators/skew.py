"""Skew handling utilities (north rule: hot conversations).

Three complementary mechanisms, used in this order of preference:

1. **Key design** (free): every stateful operator partitions on a composite
   key — (conv_id, source), (conv_id, burst_key-hash), (conv_id, ip) — so a
   hot conversation splits across sub-keys naturally.
2. **Round-robin spreading** for per-row stages: per-row work (parse, n-gram
   string building) carries no key at all; ``salted_repartition``/plain
   ``repartition()`` distributes it evenly regardless of input layout.
3. **AQE** (enabled in session.py): runtime skew-join splitting and
   partition coalescing for whatever remains.

``salted_repartition`` is the explicit middle tool: it repartitions by
``hash(key, salt)`` so rows of one hot key spread over ``salt_n`` partitions
while co-locating everything else. Safe ONLY for stages whose semantics
don't need all rows of a key together (per-row transforms, algebraic
partial aggregations)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(df: DataFrame, key: str, salt_n: int = 16,
                       num_partitions: int | None = None) -> DataFrame:
    """Repartition by (key, salt) with salt = pmod(xxhash64(all columns), n)
    — deterministic, no rand() (rand would break retry/resume determinism)."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_n))
    out = df.withColumn("_salt", salt)
    if num_partitions:
        out = out.repartition(num_partitions, F.col(key), F.col("_salt"))
    else:
        out = out.repartition(F.col(key), F.col("_salt"))
    return out.drop("_salt")


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition a frame whose planned scan is NARROWER than
    the session's core count (r6). A small-but-row-heavy input file (the
    5.9 MB / 50k-doc documents table is 1-2 stock 128 MB splits) serializes
    every per-row stage built on it — tokenize/md5/shingle work measured
    running on 2 of 32 cores. The spread is scale-adaptive, not a config:
    at real corpus sizes the scan already has >= defaultParallelism splits
    and this is an exact no-op; locally it costs one exchange of the tiny
    input. Row content is unchanged (round-robin repartition is
    deterministic: sort-before-repartition is on by default)."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def skew_report(df: DataFrame, key: str, top_n: int = 5):
    """Measure key skew: top-N heaviest keys and their share of all rows —
    the number BENCH.md quotes for the hot-conversation fixture."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    total = df.count()
    top = counts.orderBy(F.desc("n")).limit(top_n).collect()
    return {
        "total_rows": total,
        "top_keys": [
            {"key": r[key], "rows": r["n"], "share": round(r["n"] / total, 4)}
            for r in top
        ],
    }
