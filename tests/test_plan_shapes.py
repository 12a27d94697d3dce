"""Physical-plan regression guards: the shapes the scale design depends on
(broadcast-only dim joins, merged window sorts, parquet pushdown, single
parse evaluation) must not silently regress."""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_pushdown_and_pruning(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    p = _plan(ev.filter(F.col("event_type") == "error").select("event_id", "ts"))
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,error)]" in p
    assert "ReadSchema: struct<event_id:bigint,ts:timestamp_ntz,event_type:string>" in p


def test_enrich_is_broadcast_only(spark, fixture_df):
    from intelligent_log_analysis_anomaly_detection_tool_spark.functions.parse import (
        parse_stage,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.enrich import (
        dims,
        enrich,
    )

    p = _plan(enrich(parse_stage(fixture_df), dims(spark)))
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") >= 2


def test_routing_is_broadcast(spark, fixture_df):
    from intelligent_log_analysis_anomaly_detection_tool_spark.functions.parse import (
        parse_stage,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.enrich import dims
    from intelligent_log_analysis_anomaly_detection_tool_spark.plans.pipeline import (
        online_anomalies,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.sinks import (
        route_anomalies,
    )

    # union of detector branches -> non-constant detector column, so the
    # routing join materializes as a real broadcast hash join
    p = _plan(route_anomalies(online_anomalies(parse_stage(fixture_df)),
                              dims(spark)["routing"]))
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p


def test_fused_online_single_sort(spark, fixture_pdf):
    """W1+W2 fused pass: ONE Exchange hashpartitioning(conv_id, source) and
    ONE Sort — the rank/prefix windows order by (epoch, turn_idx) and the
    range frames by (epoch), both satisfied by the same physical sort."""
    from intelligent_log_analysis_anomaly_detection_tool_spark.functions.parse import (
        parse_stage,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.detectors.online_fused import (
        spike_statistical_anomalies,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.schema import (
        TRANSCRIPTS_SCHEMA,
    )

    fresh = spark.createDataFrame(fixture_pdf.head(500), schema=TRANSCRIPTS_SCHEMA)
    p = _plan(spike_statistical_anomalies(parse_stage(fresh)))
    if "InMemoryRelation" in p:
        return
    assert p.count("Exchange hashpartitioning") == 1, p
    assert p.count("+- Sort") == 1, p


def test_burst_single_exchange(spark, fixture_pdf):
    """The burst scan's explicit repartition must not introduce a second
    shuffle: the count-window already hash-partitions by (conv_id,
    burst_key), and the executed plan keeps exactly ONE Exchange (verified
    round 4 per ADVICE; this pins it)."""
    from intelligent_log_analysis_anomaly_detection_tool_spark.functions.parse import (
        parse_stage,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.detectors.burst import (
        burst_anomalies,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.schema import (
        TRANSCRIPTS_SCHEMA,
    )

    fresh = spark.createDataFrame(fixture_pdf.head(500), schema=TRANSCRIPTS_SCHEMA)
    p = _plan(burst_anomalies(parse_stage(fresh)))
    if "InMemoryRelation" in p:
        return
    assert p.count("Exchange") == 1, p


def test_sequence_counts_no_lead_string_exchange(spark, fixture_pdf):
    """A10's representative-string attach must not re-exchange the lead
    frame even in the SortMergeJoin fallback: the counts side co-partitions
    by conv (requireAllClusterKeysForCoPartition=false), so no Exchange in
    the plan carries the s1..s9 lead-string columns."""
    import re

    from intelligent_log_analysis_anomaly_detection_tool_spark.functions.parse import (
        parse_stage,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.detectors.pattern import (
        sequence_counts,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.schema import (
        TRANSCRIPTS_SCHEMA,
    )

    fresh = spark.createDataFrame(fixture_pdf.head(800), schema=TRANSCRIPTS_SCHEMA)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            sequence_counts(parse_stage(fresh)).explain("formatted")
        fmt = buf.getvalue()
        assert "SortMergeJoin" in fmt  # the fallback actually engaged
        for sec in re.split(r"\n\n", fmt):
            first = sec.strip().splitlines()[0] if sec.strip() else ""
            if re.match(r"\(\d+\) Exchange", first):
                inputs = " ".join(
                    l for l in sec.splitlines() if l.startswith("Input")
                )
                assert not re.search(r"\bs[1-9]#", inputs), sec
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_parse_evaluated_once_in_spike(spark, fixture_pdf):
    """The nondeterministic flag must keep Catalyst from duplicating the
    Arrow parse stage per consumer (one ArrowEvalPython for parse + one for
    the description formatter). Uses a FRESH uncached input so the cache
    manager cannot substitute persisted subtrees from other tests (their
    plan descriptions would pollute the string counts)."""
    from intelligent_log_analysis_anomaly_detection_tool_spark.functions.parse import (
        parse_stage,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.detectors.spike import (
        spike_anomalies,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.schema import (
        TRANSCRIPTS_SCHEMA,
    )

    fresh = spark.createDataFrame(fixture_pdf.head(500), schema=TRANSCRIPTS_SCHEMA)
    p = _plan(spike_anomalies(parse_stage(fresh)))
    if "InMemoryRelation" in p:  # another test cached an identical subtree
        return
    assert p.count("parse_text_frame") == 1, p
    # merged window sorts: one rn sort + one epoch sort
    assert p.count("+- Sort") <= 3
