"""The full parse -> enrich -> route -> aggregate plan.

Spark lifecycle of the reference's single-threaded loop (SURVEY.md §3.1):
read -> parse (one Arrow pandas UDF) -> enrich (broadcast joins) -> detector
branches (window exprs + one applyInPandas) -> unionByName -> routing join ->
fan-out sinks; aggregates (minute pivot, level/source stats) are sibling
branches over the same cached parsed frame — no second parse pass (the
reference re-reads the file for entries.csv, main.cpp:536-537; we persist).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.parse_select import parse_stage_pipeline
from ..operators.aggregates import level_stats, minute_stats, source_stats, totals
from ..operators.detectors.burst import burst_anomalies
from ..operators.detectors.common import S_LOW, T_OTHER, as_anomaly
from ..operators.detectors.frequency import frequency_anomalies
from ..operators.detectors.pattern import pattern_anomalies
from ..operators.detectors.rare_ip import rare_ip_anomalies
from ..operators.detectors.timewindow import timewindow_anomalies
from ..operators.enrich import dims, enrich


def parser_anomalies(parsed: DataFrame) -> DataFrame:
    """F2: malformed line -> (Other, Low, score=1.0, source='parser',
    'Malformed log line: <err>') (main.cpp:199-219). The reference stamps the
    anomaly window with wall-clock now (nondeterministic); this engine leaves
    the window NULL — documented divergence."""
    df = parsed.filter(F.col("malformed"))
    out = df.select(
        "conv_id",
        "turn_idx",
        F.lit("parser").alias("detector"),
        F.lit(T_OTHER).alias("anomaly_type"),
        F.lit(S_LOW).alias("severity"),
        F.lit(None).cast("timestamp").alias("window_start"),
        F.lit(None).cast("timestamp").alias("window_end"),
        F.lit(1.0).alias("score"),
        F.lit("parser").alias("source"),
        F.concat(
            F.lit("Malformed log line: "),
            F.coalesce(F.col("error"), F.lit("parse failure")),
        ).alias("description"),
    )
    return as_anomaly(out)


def rule_anomalies(parsed: DataFrame, rules: DataFrame) -> DataFrame:
    """EXTENDED mode only: convert rule matches into anomaly rows. The
    reference's matchesToAnomalies is a placeholder returning {} — faithful
    mode therefore contributes ZERO rows (F9) and this function is wired in
    only when cfg.rules_faithful is False. Severity/score come from the rule
    row; type Other; window [ts, ts]."""
    from ..operators.enrich import rule_matches

    matches = rule_matches(parsed, rules)
    enriched = matches.join(F.broadcast(rules), "rule_id").join(
        parsed.select("conv_id", "turn_idx", "ts_parsed", "source"),
        ["conv_id", "turn_idx"],
    )
    out = enriched.select(
        "conv_id",
        "turn_idx",
        F.lit("rules").alias("detector"),
        F.lit(T_OTHER).alias("anomaly_type"),
        F.col("severity"),
        F.col("ts_parsed").alias("window_start"),
        F.col("ts_parsed").alias("window_end"),
        F.col("rule_score").alias("score"),
        F.col("source"),
        F.concat(F.lit("Rule matched: "), F.col("name")).alias("description"),
    )
    return as_anomaly(out)


def online_anomalies(parsed: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG,
                     rules: DataFrame | None = None) -> DataFrame:
    """Per-entry detector fires (rule stage contributes zero rows in faithful
    mode, F9). Union order mirrors main.cpp:283-360; W1+W2 run as ONE fused
    window pass (they share the (conv_id, source) sort — see
    detectors/online_fused.py), emitting the same rows as the standalone
    spike_anomalies/statistical_anomalies operators."""
    from ..operators.detectors.online_fused import spike_statistical_anomalies

    out = (
        parser_anomalies(parsed)
        .unionByName(spike_statistical_anomalies(parsed, cfg.spike, cfg.statistical))
        .unionByName(burst_anomalies(parsed, cfg.burst))
        .unionByName(rare_ip_anomalies(parsed, cfg.ip))
    )
    if not cfg.rules_faithful and rules is not None:
        out = rule_anomalies(parsed, rules).unionByName(out)
    return out


def offline_anomaly_builders(parsed: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG):
    """The offline analyzers as LAZY independent branch builders
    (main.cpp:367-409): name -> zero-arg callable returning the branch plan.

    Callers that materialize anomalies (bench/scaling, per-detector sinks)
    construct + submit these CONCURRENTLY from one thread each — standard
    multi-job scheduling — so the cluster keeps working while the pattern
    branch's one blocking plan-choice action (novel_sequences' repeated-set
    fetch) runs; a single union action would leave construction of the whole
    offline plan stuck behind it on the driver. Builders are lazy so a
    caller can construct exactly one branch per thread."""
    return {
        "frequency": lambda: frequency_anomalies(parsed, cfg.frequency),
        "pattern": lambda: pattern_anomalies(parsed, cfg.pattern),
        "timewindow": lambda: timewindow_anomalies(parsed, cfg.timewindow),
    }


def offline_anomalies(parsed: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """End-of-run analyzer anomalies (main.cpp:367-409)."""
    b = offline_anomaly_builders(parsed, cfg)
    return (
        b["frequency"]().unionByName(b["pattern"]()).unionByName(b["timewindow"]())
    )


def all_anomalies(parsed: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    return online_anomalies(parsed, cfg).unionByName(offline_anomalies(parsed, cfg))


def run_concurrent_dag(
    transcripts: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    action=None,
) -> dict[str, DataFrame]:
    """Materialize the post-parse DAG with maximal plan/job overlap.

    The engine's real concurrent job shape (what bench.py and
    bench/scaling.py measure): parse once into a persisted frame, then the
    online->minutes chain and the three offline analyzers run as concurrent
    jobs, ``action`` (default: a noop-format write) materializing each leaf.

    Round-5 refinement: the parse-materialize count is submitted FIRST, and
    every action-free branch plan (online union, frequency, timewindow,
    minute pivot) is constructed WHILE that job runs — previously the driver
    built the online plan with the cluster idle (~2 s at sf0.1, measured
    with bench/job_gaps.py), pure serial fraction that no core count can
    shrink. Only the pattern branch's construction stays post-parse: its
    plan choice runs a bounded ``limit().toPandas()`` action that must read
    the already-materialized cache (running it during the parse count would
    recompute the parse work concurrently — a cache stampede).

    Returns the persisted frames so callers control unpersist timing.
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..functions.parse_select import parse_stage_pipeline
    from ..operators.aggregates import minute_stats

    if action is None:
        def action(df):  # noqa: E306 — default leaf materializer
            df.write.format("noop").mode("overwrite").save()

    parsed = parse_stage_pipeline(transcripts).persist()
    builders = offline_anomaly_builders(parsed, cfg)
    with ThreadPoolExecutor(max_workers=4) as ex:
        parse_fut = ex.submit(parsed.count)
        # action-free plan construction, overlapped with the parse job
        online = online_anomalies(parsed, cfg).persist()
        freq_plan = builders["frequency"]()
        tw_plan = builders["timewindow"]()
        minutes_plan = minute_stats(parsed, online)
        parse_fut.result()

        def _online_then_minutes():
            # minutes reads the persisted online union — keep it behind the
            # online count so concurrent jobs never race to fill that cache
            online.count()
            action(minutes_plan)

        futs = [
            ex.submit(_online_then_minutes),
            ex.submit(lambda: action(freq_plan)),
            ex.submit(lambda: action(builders["pattern"]())),
            ex.submit(lambda: action(tw_plan)),
        ]
        for f in futs:
            f.result()
    return {"parsed": parsed, "online": online}


def report_order(anomalies: DataFrame, limit: int | None = None) -> DataFrame:
    """O1 anomaly ordering: severity desc, score desc, window_end desc,
    description asc; then cap (JsonReporter.cpp:50-62, CsvReporter.cpp:44-53)."""
    out = anomalies.orderBy(
        F.desc("severity"), F.desc("score"), F.desc("window_end"), "description"
    )
    return out.limit(limit) if limit else out


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    out_dir: str | None = None,
) -> dict[str, DataFrame]:
    """Build (and optionally materialize) every branch of the DAG.

    Returns the dict of logical DataFrames; when ``out_dir`` is given the
    routed anomaly fan-out and the report sinks are also written (see
    sinks.write_all for the physical layout).
    """
    d = dims(spark)
    # Narrowed parse (parse_stage_pipeline): raw text/ts/was_json never reach
    # the cache — no branch below reads them, and at 1e8+ rows raw text alone
    # would double the persisted footprint (= per-task memory pressure at
    # high parallelism on a fixed executor heap).
    parsed = parse_stage_pipeline(transcripts)
    parsed = parsed.persist()

    online = online_anomalies(parsed, cfg)
    offline = offline_anomalies(parsed, cfg)
    anomalies = online.unionByName(offline)

    from ..operators.detectors.frequency import frequency_stats
    from ..operators.detectors.pattern import pattern_stats

    result = {
        "parsed": parsed,
        "enriched": enrich(parsed, d),
        "online_anomalies": online,
        "offline_anomalies": offline,
        "anomalies": anomalies,
        "minute_stats": minute_stats(parsed, online),
        "level_stats": level_stats(parsed),
        "source_stats": source_stats(parsed),
        "totals": totals(source_stats(parsed)),
        "frequency_stats": frequency_stats(parsed, cfg.frequency),
        "pattern_stats": pattern_stats(parsed, cfg.pattern),
        "dims": d,
    }
    if out_dir is not None:
        from ..sinks import write_all

        result["sink_counts"] = write_all(result, d["routing"], out_dir)
    return result
