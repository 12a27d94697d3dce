"""Input sources.

- ``read_transcripts``: the canonical input — an Iceberg table when a catalog
  is configured (``spark.read.format('iceberg')``), else a parquet directory
  with the same layout. Column pruning + predicate pushdown come free from
  the declarative read (check ``.explain``: ReadSchema/PushedFilters).
- ``read_raw_log_file``: adapter for the reference's actual input shape (a
  raw log file, S1 in SURVEY.md §2.1): one conversation per file, line order
  preserved via zipWithIndex (deterministic: text-source partitions are
  ordered byte ranges). This is the only RDD use in the engine — it exists
  to recover a total order the DataFrame text source does not expose.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import TRANSCRIPTS_SCHEMA


def read_transcripts(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Read the transcripts input (Iceberg table name or parquet path)."""
    if os.path.sep in path_or_table or os.path.isdir(path_or_table):
        return spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(path_or_table)
    try:
        return spark.read.format("iceberg").load(path_or_table)
    except Exception:
        return spark.table(path_or_table)


def read_raw_log_file(spark: SparkSession, path: str,
                      conv_id: str | None = None) -> DataFrame:
    """One raw log file -> transcript rows (conv_id = file stem, turn_idx =
    line number, text = raw line, ts = NULL; the parse stage re-derives the
    event time exactly like the reference's single pass)."""
    cid = conv_id or os.path.splitext(os.path.basename(path))[0]
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    df = spark.createDataFrame(
        rdd.map(lambda t: (cid, t[1], None, t[0], None, None)),
        schema=("conv_id string, turn_idx long, role string, text string, "
                "tool string, ts timestamp"),
    )
    return df.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        "role", "text", "tool", "ts",
    )
