"""Storage backend abstraction: Iceberg when a catalog is configured,
parquet directories otherwise (SURVEY.md §7 stage-0 risk: no Iceberg jars in
this sandbox — same table layout either way, writer-only switch).

Iceberg path: ``df.writeTo(table).append()`` / ``overwritePartitions()`` —
atomic snapshot per call, which is exactly what the checkpoint protocol in
checkpoint.py assumes (its parquet emulation uses dynamic partition
overwrite + manifest rename for the same effect)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


def write_table(df: DataFrame, target: str, mode: str = "append",
                partition_by: list[str] | None = None) -> None:
    """Write to an Iceberg table name (``catalog.db.tbl``) or a parquet path.

    Paths (contain '/') always use the parquet writer; dotted names require
    Iceberg to be on the classpath."""
    if "/" not in target and iceberg_available(df.sparkSession):
        writer = df.writeTo(target)
        if mode == "overwrite_partitions":
            writer.overwritePartitions()
        elif mode == "create":
            writer.createOrReplace()
        else:
            writer.append()
        return
    w = df.write.mode("overwrite" if mode != "append" else "append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)
