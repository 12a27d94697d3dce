"""Full-table parity for the trickiest count semantics:
A10 n-gram sequence counts (overlap-recount weights) and A5 message-hash
counts, engine vs oracle — not just the novel/rare subsets."""

import pandas as pd

from pyspark.sql import functions as F


def _oracle_conv_counts(fixture_pdf, attr):
    from oracle.reference_oracle import run_conv

    out = {}
    for conv_id, g in fixture_pdf.sort_values(["conv_id", "turn_idx"]).groupby(
            "conv_id"):
        res = run_conv(conv_id, list(zip(g["turn_idx"], g["text"])))
        for k, v in getattr(res, attr).items():
            out[(conv_id, k)] = v
    return out


def test_sequence_counts_full_parity(spark, fixture_df, fixture_pdf):
    from intelligent_log_analysis_anomaly_detection_tool_spark.functions.parse import (
        parse_stage,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.detectors.pattern import (
        sequence_counts,
    )

    # subset of convs to keep the oracle loop quick
    convs = sorted(fixture_pdf["conv_id"].unique())[:12]
    sub_pdf = fixture_pdf[fixture_pdf["conv_id"].isin(convs)]
    sub_df = fixture_df.filter(F.col("conv_id").isin(convs))

    got = sequence_counts(parse_stage(sub_df)).toPandas()
    got_map = {(r["conv_id"], r["seq_sig"]): int(r["n"]) for _, r in got.iterrows()}
    want_map = _oracle_conv_counts(sub_pdf, "seq_counts")
    assert got_map == want_map


def test_message_hash_counts_full_parity(spark, fixture_df, fixture_pdf):
    from intelligent_log_analysis_anomaly_detection_tool_spark.functions.parse import (
        parse_stage,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.detectors.frequency import (
        message_hash,
    )

    got = (
        parse_stage(fixture_df)
        .filter(~F.col("malformed"))
        .withColumn("msg_hash", message_hash(F.col("message")))
        .groupBy("conv_id", "msg_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    got_map = {(r["conv_id"], r["msg_hash"]): int(r["n"]) for _, r in got.iterrows()}
    want_map = _oracle_conv_counts(fixture_pdf, "msg_hash_counts")
    assert got_map == want_map
