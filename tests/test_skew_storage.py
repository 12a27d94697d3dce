"""Skew utilities + storage abstraction."""

from pyspark.sql import functions as F


def test_hot_conv_skew_measured(fixture_df):
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.skew import (
        skew_report,
    )

    rep = skew_report(fixture_df, "conv_id")
    # t_small (50 convs): the pareto tail + the engineered hot conv both show
    assert rep["top_keys"][0]["share"] > 0.05
    assert "conv-000000" in [t["key"] for t in rep["top_keys"]]


def test_salted_repartition_spreads_hot_key(spark, fixture_df):
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.skew import (
        salted_repartition,
    )

    out = salted_repartition(fixture_df, "conv_id", salt_n=8, num_partitions=8)
    sizes = (
        out.withColumn("pid", F.spark_partition_id())
        .filter(F.col("conv_id") == "conv-000000")
        .groupBy("pid")
        .count()
        .collect()
    )
    assert len(sizes) >= 4  # hot conv spread over several partitions
    # determinism: same input -> same partitioning (no rand())
    a = salted_repartition(fixture_df, "conv_id", salt_n=8, num_partitions=8)
    b = salted_repartition(fixture_df, "conv_id", salt_n=8, num_partitions=8)
    pa = a.withColumn("pid", F.spark_partition_id()).groupBy("pid").count()
    pb = b.withColumn("pid", F.spark_partition_id()).groupBy("pid").count()
    assert sorted(map(tuple, pa.collect())) == sorted(map(tuple, pb.collect()))


def test_write_table_parquet_path(spark, fixture_df, tmp_path):
    from intelligent_log_analysis_anomaly_detection_tool_spark.storage import (
        write_table,
    )

    p = str(tmp_path / "t")
    write_table(fixture_df.limit(10), p, mode="overwrite")
    assert spark.read.parquet(p).count() == 10
