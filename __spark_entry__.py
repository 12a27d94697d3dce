"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the engine's flagship parse->enrich->route->aggregate pipeline
over a transcript rendering of the sf0.001 events table. ``queries`` /
``oracle_sql`` cover the SQL-expressible operators from SURVEY.md §2 (parse
projections, frequency aggregates, trailing-window detector math, anchor
buckets, ordering/top-k, dedup/text ops) side-by-side with DuckDB.

Column names are aliased identically in both engines; doubles are rounded
in-query on both sides so the driver's value-hash comparison is stable.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DEFAULT = "/root/testdata/sf0.001"


def _utc(spark: SparkSession) -> None:
    # the driver may build its own session; all oracle comparisons assume UTC
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the documents file is tiny in bytes but row-heavy, so a stock
    # 128 MB-split scan is 1-2 partitions and every per-row doc operator
    # (tokenize/md5/shingle) serializes onto 1-2 cores; exact no-op once the
    # scan is >= core-count partitions (operators/skew.py)
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.skew import (
        spread_small_scan,
    )

    return spread_small_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.skew import (
        spread_small_scan,
    )

    return spread_small_scan(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


def events_as_transcripts(spark: SparkSession, sf_dir: str,
                          step_s: int | None = None) -> DataFrame:
    """Render the events table into the engine's transcript input shape
    (conv_id, turn_idx, role, text, tool, ts) with reference-style log lines
    so the full parse->detect pipeline can run on driver-provided data.

    ``step_s``: when given, per-user timestamps are DENSIFIED to
    ``first_ts(user) + turn_idx * step_s`` (still strictly monotonic per
    conversation). The default rendering keeps real event times, which are so
    sparse that trailing-60s burst windows never accumulate; the dense variant
    makes the burst detector's driver-facing check non-vacuous."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rn = F.row_number().over(w) - 1
    if step_s is None:
        ts_out = F.col("ts")
    else:
        anchor = F.min("ts").over(Window.partitionBy("user_id"))
        ts_out = F.timestamp_seconds(
            F.unix_timestamp(anchor) + rn * F.lit(step_s)
        )
    level = (
        F.when(F.col("event_type") == "error", "ERROR")
        .when(F.col("event_type") == "purchase", "WARN")
        .otherwise("INFO")
    )
    text = F.concat(
        F.date_format(ts_out, "yyyy-MM-dd HH:mm:ss"),
        F.lit(" ["), level, F.lit("] events-svc - type="),
        F.col("event_type"),
        F.lit(" value="), F.col("value").cast("string"),
        F.lit(" user="), F.col("user_id").cast("string"),
    )
    return ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("conv_id"),
        rn.cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
            (F.pmod(F.col("event_id"), 4) + 1).cast("int"),
        ).alias("role"),
        text.alias("text"),
        F.lit("none").alias("tool"),
        ts_out.alias("ts"),
    )


# q_burst_detector knobs: the dense rendering packs each conversation at
# 3 s/turn so trailing-60s windows actually accumulate; min_repeats=5 both
# fires (>= 5 repeats) and exercises the trim-on-emit mutation (> 5 -> trim
# to 2 retained). Pinned here so the pytest asserts oracle row-equality on
# EXACTLY the input the driver gate runs.
BURST_DRIVER_STEP_S = 3
BURST_DRIVER_MIN_REPEATS = 5


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full pipeline (parse UDF -> detectors -> minute pivot) on
    sf0.001; driver checks rows>0 and a stable schema."""
    _utc(spark)
    from intelligent_log_analysis_anomaly_detection_tool_spark.functions.parse_select import (
        parse_stage,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.aggregates import (
        minute_stats,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.plans.pipeline import (
        online_anomalies,
    )

    tr = events_as_transcripts(spark, SF_DEFAULT)
    parsed = parse_stage(tr)
    return minute_stats(parsed, online_anomalies(parsed)).orderBy("minute")


# ---------------------------------------------------------------------------
# paired queries / oracles
# ---------------------------------------------------------------------------

def _es():
    # epoch seconds (truncated) — requires an active session, hence lazy
    return F.unix_timestamp(F.col("ts")).alias("es")


def q_minute_pivot(spark, sf_dir):
    """A1: per-minute level pivot (events as the level-bearing stream)."""
    _utc(spark)
    return (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("minute", "ts").alias("minute"))
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.count_if(F.col("event_type") == "error").alias("errors"),
            F.count_if(F.col("event_type") == "purchase").alias("purchases"),
            F.count_if(F.col("event_type") == "click").alias("clicks"),
        )
    )


SQL_MINUTE_PIVOT = """
SELECT date_trunc('minute', ts) AS minute,
       count(*) AS total,
       count(*) FILTER (WHERE event_type = 'error') AS errors,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchases,
       count(*) FILTER (WHERE event_type = 'click') AS clicks
FROM events GROUP BY 1
"""


def q_type_counts(spark, sf_dir):
    """A2/A5: per-level (event_type) counts."""
    _utc(spark)
    return _events(spark, sf_dir).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )


SQL_TYPE_COUNTS = "SELECT event_type, count(*) AS n FROM events GROUP BY 1"


def q_user_stats(spark, sf_dir):
    """A3/A4: per-source totals + error counts + rounded value sum."""
    _utc(spark)
    return _events(spark, sf_dir).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("total_events"),
        F.count_if(F.col("event_type") == "error").alias("error_events"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )


SQL_USER_STATS = """
SELECT user_id, count(*) AS total_events,
       count(*) FILTER (WHERE event_type = 'error') AS error_events,
       round(sum(value), 2) AS value_sum
FROM events GROUP BY 1
"""


def q_top_users(spark, sf_dir):
    """A6/O2: top-10 sources by count, deterministic tiebreak."""
    _utc(spark)
    return (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "user_id")
        .limit(10)
    )


SQL_TOP_USERS = """
SELECT user_id, count(*) AS n FROM events
GROUP BY 1 ORDER BY n DESC, user_id LIMIT 10
"""


def q_rare_pairs(spark, sf_dir):
    """A8: rare-key detection (count below threshold)."""
    _utc(spark)
    return (
        _events(spark, sf_dir)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") < 5)
    )


SQL_RARE_PAIRS = """
SELECT user_id, event_type, count(*) AS n FROM events
GROUP BY 1, 2 HAVING count(*) < 5
"""


def q_spike_windows(spark, sf_dir):
    """W1: trailing 60s/600s counts per source via the file-order-rank minus
    evicted-rows identity (same construction as the spike detector)."""
    _utc(spark)
    ev = _events(spark, sf_dir).select("event_id", "user_id", _es())
    w_ord = Window.partitionBy("user_id").orderBy("es", "event_id")
    w60 = (
        Window.partitionBy("user_id").orderBy("es")
        .rangeBetween(Window.unboundedPreceding, -61)
    )
    w600 = (
        Window.partitionBy("user_id").orderBy("es")
        .rangeBetween(Window.unboundedPreceding, -601)
    )
    rn = F.row_number().over(w_ord)
    cur = rn - F.count(F.lit(1)).over(w60)
    base = rn - F.count(F.lit(1)).over(w600)
    return ev.select(
        "event_id",
        "user_id",
        cur.alias("cur_60s"),
        base.alias("base_600s"),
        F.round((cur / 60.0) / (base / 600.0), 4).alias("spike_ratio"),
    )


SQL_SPIKE_WINDOWS = """
WITH e AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
), w AS (
  SELECT event_id, user_id, es,
         row_number() OVER (PARTITION BY user_id ORDER BY es, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id ORDER BY es
                        RANGE BETWEEN UNBOUNDED PRECEDING AND 61 PRECEDING) AS old60,
         count(*) OVER (PARTITION BY user_id ORDER BY es
                        RANGE BETWEEN UNBOUNDED PRECEDING AND 601 PRECEDING) AS old600
  FROM e
)
SELECT event_id, user_id, rn - old60 AS cur_60s, rn - old600 AS base_600s,
       round(((rn - old60) / 60.0) / ((rn - old600) / 600.0), 4) AS spike_ratio
FROM w
"""


def q_zscore_prefix(spark, sf_dir):
    """W2: prefix mean/stddev z-score (Welford equivalence) with warm-up."""
    _utc(spark)
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cnt = F.row_number().over(w_ord)
    mean = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    z = F.when((cnt >= 10) & (sd > 0), (F.col("value") - mean) / sd).otherwise(0.0)
    # + 0.0 normalizes IEEE negative zero; DuckDB's round() can emit -0.0
    # where Spark emits +0.0 for the same value (driver hash is bit-sensitive).
    return ev.select(
        "event_id", "user_id", (F.round(z, 3) + F.lit(0.0)).alias("zscore")
    )


SQL_ZSCORE_PREFIX = """
WITH w AS (
  SELECT event_id, user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cnt,
         avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mean,
         stddev_samp(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sd
  FROM events
)
SELECT event_id, user_id,
       round(CASE WHEN cnt >= 10 AND sd > 0 THEN (value - mean) / sd ELSE 0.0 END, 3)
         + 0.0 AS zscore
FROM w
"""


def q_first_n_per_key(spark, sf_dir):
    """W4: first-5-occurrences-per-key via row_number."""
    _utc(spark)
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("occurrence", F.row_number().over(w))
        .filter(F.col("occurrence") <= 5)
        .select("event_id", "user_id", "event_type", "occurrence")
    )


SQL_FIRST_N_PER_KEY = """
SELECT event_id, user_id, event_type, occurrence FROM (
  SELECT event_id, user_id, event_type,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS occurrence
  FROM events
) WHERE occurrence <= 5
"""


def q_anchor_buckets(spark, sf_dir):
    """W5: first-event-aligned tumbling buckets, last-13 filter."""
    _utc(spark)
    ev = _events(spark, sf_dir).select("user_id", "event_type", _es())
    w_u = Window.partitionBy("user_id")
    ev = ev.withColumn("anchor", F.min("es").over(w_u)).withColumn(
        "bucket", F.floor((F.col("es") - F.col("anchor")) / 60)
    )
    agg = ev.groupBy("user_id", "bucket").agg(
        F.count(F.lit(1)).alias("total"),
        F.count_if(F.col("event_type") == "error").alias("errors"),
    )
    w_m = Window.partitionBy("user_id")
    return agg.withColumn("max_bucket", F.max("bucket").over(w_m)).filter(
        F.col("bucket") >= F.col("max_bucket") - 12
    ).select("user_id", "bucket", "total", "errors")


SQL_ANCHOR_BUCKETS = """
WITH e AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         min(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id) AS anchor
  FROM events
), b AS (
  SELECT user_id, CAST(floor((es - anchor) / 60) AS BIGINT) AS bucket,
         count(*) AS total,
         count(*) FILTER (WHERE event_type = 'error') AS errors
  FROM e GROUP BY 1, 2
)
SELECT user_id, bucket, total, errors FROM (
  SELECT *, max(bucket) OVER (PARTITION BY user_id) AS max_bucket FROM b
) WHERE bucket >= max_bucket - 12
"""


def q_report_order(spark, sf_dir):
    """O1: report ordering + cap."""
    _utc(spark)
    return (
        _events(spark, sf_dir)
        .select("event_id", "event_type", "value")
        .orderBy(F.desc("value"), F.desc("event_id"))
        .limit(100)
    )


SQL_REPORT_ORDER = """
SELECT event_id, event_type, value FROM events
ORDER BY value DESC, event_id DESC LIMIT 100
"""


def q_bigram_sequences(spark, sf_dir):
    """A10-lite: adjacent event-type transition counts per source (the full
    2..10-gram overlap-recount semantics are pytest-verified vs the python
    oracle; the SQL oracle covers the bigram core)."""
    _utc(spark)
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    return (
        ev.withColumn("prev", prev)
        .filter(F.col("prev").isNotNull())
        .select(F.concat(F.col("prev"), F.lit("->"), F.col("event_type")).alias("seq_sig"))
        .groupBy("seq_sig")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_BIGRAM_SEQUENCES = """
WITH w AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT prev || '->' || event_type AS seq_sig, count(*) AS n
FROM w WHERE prev IS NOT NULL GROUP BY 1
"""


def q_burst_normalize(spark, sf_dir):
    """P10: burst message normalization (<id>/<n>/whitespace collapse) +
    grouped repeat counts, on the documents corpus."""
    _utc(spark)
    d = _documents(spark, sf_dir)
    s = F.lower(F.col("text"))
    s = F.regexp_replace(s, r"[0-9a-f]{8,}", "<id>")
    s = F.regexp_replace(s, r"\b\d+\b", "<n>")
    s = F.trim(F.regexp_replace(s, r"\s+", " "))
    return d.select(s.alias("norm")).groupBy("norm").agg(
        F.count(F.lit(1)).alias("n")
    )


SQL_BURST_NORMALIZE = """
SELECT trim(regexp_replace(
         regexp_replace(
           regexp_replace(lower(text), '[0-9a-f]{8,}', '<id>', 'g'),
           '\\b\\d+\\b', '<n>', 'g'),
         '\\s+', ' ', 'g')) AS norm,
       count(*) AS n
FROM documents GROUP BY 1
"""


def q_message_hash_top(spark, sf_dir):
    """P11+A6: first-3-token message hash, top-10 by count."""
    _utc(spark)
    d = _documents(spark, sf_dir)
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    h = F.upper(F.array_join(F.slice(toks, 1, 3), " "))
    return (
        d.select(h.alias("msg_hash"))
        .groupBy("msg_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "msg_hash")
        .limit(10)
    )


SQL_MESSAGE_HASH_TOP = """
SELECT upper(array_to_string(
         (list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))[1:3],
         ' ')) AS msg_hash,
       count(*) AS n
FROM documents GROUP BY 1 ORDER BY n DESC, msg_hash LIMIT 10
"""


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: md5 over normalized text, group -> survivor + dup count."""
    _utc(spark)
    d = _documents(spark, sf_dir)
    h = F.md5(F.lower(F.col("text")))
    return d.select(h.alias("text_hash"), "doc_id").groupBy("text_hash").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("survivor_doc_id"),
    )


SQL_DEDUP_EXACT = """
SELECT md5(lower(text)) AS text_hash, count(*) AS n,
       min(doc_id) AS survivor_doc_id
FROM documents GROUP BY 1
"""


# ---------------------------------------------------------------------------
# wave 2: training-data pipeline operators (dedup / similarity / text / media)
# ---------------------------------------------------------------------------

_DUCK_TOKS = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
_DUCK_TOKS_L = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"


def q_token_stats(spark, sf_dir):
    """Text analysis: token counts / distinct / avg length."""
    _utc(spark)
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.textstats import (
        token_stats,
    )

    return token_stats(_documents(spark, sf_dir))


SQL_TOKEN_STATS = f"""
WITH t AS (SELECT doc_id, text, {_DUCK_TOKS} AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_distinct_tokens,
       length(text) AS n_chars,
       round(list_sum(list_transform(toks, x -> length(x)))
             / greatest(len(toks), 1), 4) AS avg_token_len
FROM t
"""

_EN_STOPS = "('the','and','of','to','a','in','is','for')"


def q_quality_scores(spark, sf_dir):
    """Quality scoring: stopword/distinct ratios + composite score."""
    _utc(spark)
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.textstats import (
        quality_score,
    )

    return quality_score(_documents(spark, sf_dir))


SQL_QUALITY_SCORES = f"""
WITH t AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
), r AS (
  SELECT doc_id,
         len(list_filter(toks, x -> lower(x) IN {_EN_STOPS}))
           / CAST(greatest(len(toks), 1) AS DOUBLE) AS stop_ratio,
         len(list_distinct(toks))
           / CAST(greatest(len(toks), 1) AS DOUBLE) AS distinct_ratio
  FROM t
)
SELECT doc_id,
       round(stop_ratio, 4) AS stopword_ratio,
       round(distinct_ratio, 4) AS distinct_ratio,
       round(least(1.0, stop_ratio * 2.0) * 0.5 + distinct_ratio * 0.5, 4)
         AS quality_score
FROM r
"""

_LANG_MARKERS = {
    "de": "('der','die','das','und','ein')",
    "en": "('the','and','of','to','a','in','is','for')",
    "es": "('el','la','de','que','y','los')",
    "fr": "('le','la','les','des','et','un')",
}


def q_lang_id(spark, sf_dir):
    """Language-ID heuristic: stopword-marker scores + argmax."""
    _utc(spark)
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.textstats import (
        lang_id,
    )

    return lang_id(_documents(spark, sf_dir))


SQL_LANG_ID = f"""
WITH t AS (
  SELECT doc_id, {_DUCK_TOKS_L} AS toks FROM documents
), s AS (
  SELECT doc_id,
         len(list_filter(toks, x -> x IN {_LANG_MARKERS['de']})) AS score_de,
         len(list_filter(toks, x -> x IN {_LANG_MARKERS['en']})) AS score_en,
         len(list_filter(toks, x -> x IN {_LANG_MARKERS['es']})) AS score_es,
         len(list_filter(toks, x -> x IN {_LANG_MARKERS['fr']})) AS score_fr
  FROM t
)
SELECT doc_id, score_de, score_en, score_es, score_fr,
       CASE WHEN score_de >= score_en AND score_de >= score_es
                 AND score_de >= score_fr THEN 'de'
            WHEN score_en >= score_es AND score_en >= score_fr THEN 'en'
            WHEN score_es >= score_fr THEN 'es'
            ELSE 'fr' END AS pred_lang
FROM s
"""


def q_bpe_token_count(spark, sf_dir):
    """BPE-ish pre-tokenizer counts (word-or-punct regex)."""
    _utc(spark)
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.textstats import (
        bpe_token_count,
    )

    return bpe_token_count(_documents(spark, sf_dir))


SQL_BPE_TOKEN_COUNT = r"""
SELECT doc_id, len(regexp_extract_all(text, '\w+|[^\w\s]')) AS bpe_tokens
FROM documents
"""


def q_doc_fingerprint(spark, sf_dir):
    """Canonical fingerprint: md5 over sorted distinct lowered tokens."""
    _utc(spark)
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.textstats import (
        fingerprint,
    )

    return fingerprint(_documents(spark, sf_dir))


SQL_DOC_FINGERPRINT = f"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct({_DUCK_TOKS_L})), ' '))
         AS fingerprint
FROM documents
"""

_DUCK_SHINGLES2 = (
    "CASE WHEN len(toks) >= 2 THEN "
    "list_distinct(list_transform(range(1, len(toks)), "
    "i -> array_to_string(toks[i:i+1], ' '))) "
    "ELSE [array_to_string(toks, ' ')] END"
)


def q_jaccard_pairs(spark, sf_dir):
    """Near-dup: exact 2-gram Jaccard over pairs sharing a shingle."""
    _utc(spark)
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    return ngram_jaccard_pairs(
        _documents(spark, sf_dir), shingle_n=2, threshold=0.2
    )


SQL_JACCARD_PAIRS = f"""
WITH t AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
), sh AS (
  SELECT doc_id, unnest({_DUCK_SHINGLES2}) AS sh FROM t
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter,
       round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 4) >= 0.2
"""

_DUCK_SHINGLES3 = (
    "CASE WHEN len(toks) >= 3 THEN "
    "list_distinct(list_transform(range(1, len(toks) - 1), "
    "i -> array_to_string(toks[i:i+2], ' '))) "
    "ELSE [array_to_string(toks, ' ')] END"
)


def q_minhash_signatures(spark, sf_dir):
    """MinHash: 4 salted min-hashes per doc over 3-word shingles."""
    _utc(spark)
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.dedup import (
        minhash_signatures,
    )

    return minhash_signatures(_documents(spark, sf_dir), k=4, shingle_n=3)


SQL_MINHASH_SIGNATURES = f"""
WITH t AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
), sh AS (
  SELECT doc_id, unnest({_DUCK_SHINGLES3}) AS sh FROM t
)
SELECT doc_id,
       min(md5(sh || '#0')) AS mh_0,
       min(md5(sh || '#1')) AS mh_1,
       min(md5(sh || '#2')) AS mh_2,
       min(md5(sh || '#3')) AS mh_3
FROM sh GROUP BY 1
"""


def q_lsh_pairs(spark, sf_dir):
    """MinHash-LSH candidate pairs (2 bands x 2 rows)."""
    _utc(spark)
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    return lsh_candidate_pairs(
        _documents(spark, sf_dir), k=4, rows_per_band=2, shingle_n=3
    )


SQL_LSH_PAIRS = f"""
WITH t AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
), sh AS (
  SELECT doc_id, unnest({_DUCK_SHINGLES3}) AS sh FROM t
), sig AS (
  SELECT doc_id,
         min(md5(sh || '#0')) AS mh_0, min(md5(sh || '#1')) AS mh_1,
         min(md5(sh || '#2')) AS mh_2, min(md5(sh || '#3')) AS mh_3
  FROM sh GROUP BY 1
), bands AS (
  SELECT doc_id, 0 AS band_idx, md5(mh_0 || '|' || mh_1) AS band_hash FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band_idx, md5(mh_2 || '|' || mh_3) AS band_hash FROM sig
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
 AND a.doc_id < b.doc_id
"""


def q_simhash16(spark, sf_dir):
    """SimHash (16-bit portable construction) per document."""
    _utc(spark)
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.dedup import (
        simhash16,
    )

    return simhash16(_documents(spark, sf_dir))


def _simhash16_sql() -> str:
    bit_cols = ",\n         ".join(
        f"sum(CASE WHEN (strpos('0123456789abcdef', substr(h, {j + 1}, 1)) - 1) % 2 = 1 "
        f"THEN 1 ELSE -1 END) AS b{j}"
        for j in range(16)
    )
    fp = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(16)
    )
    return f"""
WITH t AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
), tok AS (
  SELECT doc_id, md5(unnest(toks)) AS h FROM t
), bits AS (
  SELECT doc_id,
         {bit_cols}
  FROM tok GROUP BY 1
)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM bits
"""


def q_embedding_topk(spark, sf_dir):
    """ANN baseline: exact brute-force cosine top-10 vs vec_id=0."""
    _utc(spark)
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.similarity import (
        cosine_topk,
    )

    return cosine_topk(_embeddings(spark, sf_dir), query_vec_id=0, k=10)


SQL_EMBEDDING_TOPK = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
)
SELECT vec_id,
       round(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product(qv, qv))), 4) AS cosine
FROM embeddings, q
WHERE vec_id <> 0
ORDER BY cosine DESC, vec_id
LIMIT 10
"""


def q_binary_meta(spark, sf_dir):
    """Multimodal plumbing: opaque binary payload + typed metadata checks."""
    _utc(spark)
    d = _documents(spark, sf_dir)
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("payload_bytes"),
        F.md5(payload).alias("payload_md5"),
    )


SQL_BINARY_META = """
SELECT doc_id, octet_length(encode(text)) AS payload_bytes,
       md5(text) AS payload_md5
FROM documents
"""


def q_ann_ivf_topk(spark, sf_dir):
    """ANN scale path: IVF cell-pruned approximate top-10, fully paired.

    Uses ``centroid_mode="first_n"`` (centroids = the first 8 vectors), the
    one IVF variant whose ENTIRE pruned pipeline — nearest-centroid
    assignment (cosine argmax, ties to lowest centroid id), top-nprobe probe
    ranking, cell-pruned candidate scan, rounded top-k — is closed-form SQL,
    so the DuckDB oracle replays pruning and all (round-5: last rows-only
    gate entry paired). The production default, seeded spherical k-means
    centroids (better recall on clustered data), is not SQL-expressible;
    it stays recall-pytested (tests/test_dataops.py)."""
    _utc(spark)
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.similarity import (
        ivf_topk,
    )

    return ivf_topk(
        _embeddings(spark, sf_dir), query_vec_id=0, k=10, n_centroids=8,
        nprobe=2, centroid_mode="first_n",
    )


# Closed-form replay of the pruned IVF pipeline (first_n centroids):
# assignment, probe ranking, and final scoring all use the same
# double-precision cosine as the engine (sequential fold == list_dot_product
# on DOUBLE[], proven bit-stable by the paired embedding_topk entry).
SQL_ANN_IVF_TOPK = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
c AS (
  SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 8
),
assigned AS (
  SELECT vec_id, v, centroid_id FROM (
    SELECT e.vec_id, e.v, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_dot_product(e.v, c.cv)
                      / (sqrt(list_dot_product(e.v, e.v))
                         * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                      c.centroid_id
           ) AS rk
    FROM e, c
  ) WHERE rk = 1
),
q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
probe AS (
  SELECT centroid_id FROM c, q
  ORDER BY list_dot_product(cv, qv)
           / (sqrt(list_dot_product(cv, cv))
              * sqrt(list_dot_product(qv, qv))) DESC,
           centroid_id
  LIMIT 2
)
SELECT a.vec_id,
       round(list_dot_product(a.v, qv)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(qv, qv))), 4) AS cosine
FROM assigned a JOIN probe USING (centroid_id), q
WHERE a.vec_id <> 0
ORDER BY cosine DESC, a.vec_id
LIMIT 10
"""


def q_simhash_near_dup(spark, sf_dir):
    """SimHash near-dup pairs via the block-permutation Hamming join, on the
    16-bit engine-portable fingerprint so the WHOLE pipeline —
    fingerprint construction, blocking, exact Hamming filter — is
    DuckDB-oracle-checked (VERDICT r3 item 5). max_hamming=3 makes the 4
    blocks exactly partition the 16 bits (4x4), so the pigeonhole guarantee
    is airtight and the engine's blocked join must equal the oracle's
    all-pairs scan. The production-width (64-bit, selective-block) variant
    stays benchmarked as simhash64_pairs."""
    _utc(spark)
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.dedup import (
        hamming_near_dup_pairs,
        simhash16,
    )

    return hamming_near_dup_pairs(
        simhash16(_documents(spark, sf_dir)), max_hamming=3, fp_bits=16
    )


def _simhash_near_dup_sql() -> str:
    """All-pairs XOR/bit_count scan over the same 16-bit fingerprints the
    engine blocks on (construction shared with _simhash16_sql)."""
    inner = _simhash16_sql().strip()
    return f"""
WITH sig AS ({inner})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def q_simhash64_pairs(spark, sf_dir):
    """SimHash near-dup pairs at PRODUCTION width: 64-bit fingerprint,
    SELECTIVE 16-bit blocks at max_hamming=3 (the 100 TB-shaped plan, unlike
    simhash_near_dup_pairs' deliberately loose 4-bit pigeonhole blocks).
    DuckDB-PAIRED since round 5 via the portable md5-bit construction
    (dedup.simhash64_md5) — the oracle rebuilds the same 64-bit fingerprints
    and runs an all-pairs xor/bit_count scan, so blocking + Hamming filter
    are checked end-to-end at full width. The xxhash64 production
    construction (dedup.simhash64) stays pytest-verified."""
    _utc(spark)
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.dedup import (
        hamming_near_dup_pairs,
        simhash64_md5,
    )

    return hamming_near_dup_pairs(
        simhash64_md5(_documents(spark, sf_dir)), max_hamming=3, fp_bits=64
    )


def _simhash64_pairs_sql() -> str:
    """All-pairs 64-bit XOR/bit_count scan over md5-bit fingerprints —
    construction mirrors dedup.simhash64_md5 (bit j = bit j%4 of hex nibble
    j//4 of md5(token); bit 63 via the min-long literal, BIGINT-signed-safe)."""
    bit_cols = ",\n         ".join(
        f"sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, {j // 4 + 1}, 1)) - 1) "
        f">> {j % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(64)
    )
    fp = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(63)
    )
    fp += " + (CASE WHEN b63 > 0 THEN CAST(-9223372036854775808 AS BIGINT) ELSE 0 END)"
    return f"""
WITH t AS (
  SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
), tok AS (
  SELECT doc_id, md5(unnest(toks)) AS h FROM t
), bits AS (
  SELECT doc_id,
         {bit_cols}
  FROM tok GROUP BY 1
), sig AS (
  SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM bits
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def q_region_revenue(spark, sf_dir):
    """J1-J3 shape on relational data: chained broadcast dim joins
    (lineitem -> orders -> customer -> nation -> region) + grouped revenue.
    The fact table never shuffles for lookups — same plan shape as the
    pipeline's severity/role/tool enrichment."""
    _utc(spark)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(rev), 2).alias("revenue"),
        )
    )


SQL_REGION_REVENUE = """
SELECT r_name AS region_name, count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY 1
"""


def q_cosine_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (exact baseline; the IVF-bucketed
    scale variant is cosine_near_dup_pairs(n_centroids=...))."""
    _utc(spark)
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.similarity import (
        cosine_near_dup_pairs,
    )

    return cosine_near_dup_pairs(_embeddings(spark, sf_dir), threshold=0.4)


SQL_COSINE_NEAR_DUP = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 4) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))), 4) >= 0.4
"""


def q_median_by_type(spark, sf_dir):
    """Exact percentiles per group (quantile aggregation coverage)."""
    _utc(spark)
    return _events(spark, sf_dir).groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("median_value"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90_value"),
    )


SQL_MEDIAN_BY_TYPE = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS median_value,
       round(quantile_cont(value, 0.9), 4) AS p90_value
FROM events GROUP BY 1
"""


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (lag + running sum), per-session stats."""
    _utc(spark)
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.sessionize import (
        sessionize,
    )

    ev = _events(spark, sf_dir).select("event_id", "user_id", "ts")
    s = sessionize(ev, "user_id", "ts", gap_s=600,
                   order_cols=["ts", "event_id"])
    return s.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.unix_timestamp("ts")).alias("start_es"),
        (F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts"))).alias(
            "duration_s"
        ),
    )


SQL_SESSIONIZE = """
WITH e AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es, ts
  FROM events
), l AS (
  SELECT *, lag(es) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM e
), s AS (
  SELECT user_id, es,
         -- CAST: DuckDB windowed sum() yields HUGEINT (int128); the driver
         -- hash is type-sensitive, Spark side is bigint.
         CAST(sum(CASE WHEN prev IS NULL OR es - prev > 600 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
           AS BIGINT) AS session_idx
  FROM l
)
SELECT user_id, session_idx, count(*) AS n_events,
       min(es) AS start_es, max(es) - min(es) AS duration_s
FROM s GROUP BY 1, 2
"""


def q_burst_detector(spark, sf_dir):
    """W3 burst detector (trim-on-emit stateful scan, mapInPandas) on the
    DENSE transcript rendering of events. DuckDB-PAIRED since round 5: the
    trim-on-emit state machine is not a SQL *window* (emission mutates the
    retained deque), but the deque is bounded at min_repeats elements
    (burst.py scan invariant), so a RECURSIVE CTE that steps one row per
    group per iteration carrying the retained-epoch LIST expresses it
    exactly — see _burst_detector_sql(). Full row equality on this exact
    rendering is additionally pytest-verified against the python oracle
    (tests/test_driver_rendering.py)."""
    _utc(spark)
    from intelligent_log_analysis_anomaly_detection_tool_spark.config import BurstConfig
    from intelligent_log_analysis_anomaly_detection_tool_spark.functions.parse_select import (
        parse_stage,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.detectors.burst import (
        burst_anomalies,
    )

    tr = events_as_transcripts(spark, sf_dir, step_s=BURST_DRIVER_STEP_S)
    return burst_anomalies(
        parse_stage(tr), BurstConfig(min_repeats=BURST_DRIVER_MIN_REPEATS)
    )


def _burst_detector_sql(step_s: int = BURST_DRIVER_STEP_S,
                        min_repeats: int = BURST_DRIVER_MIN_REPEATS,
                        window_s: int = 60) -> str:
    """Closed-form oracle for q_burst_detector (BurstPatternDetector.cpp:
    18-116 semantics on the dense rendering).

    The detector is stateful (fire at count >= m, then if count > m trim the
    retained deque to m//2), so no single window frame expresses it — but the
    state is a bounded list (never ends a row above m elements), which a
    RECURSIVE CTE can carry: iteration k processes every group's k-th row
    (breadth-first), appends the epoch, evicts the prefix older than
    window_s (the engine evicts a PREFIX while front < lo — replicated with
    list_position on the first in-window element, not a filter, so
    out-of-order epochs would diverge identically), emits when
    len >= min_repeats, and carries the post-trim list.

    Group key: the oracle groups by the normalized-message VALUE
    (lower -> hex>=8 -> <id> -> \\d+ -> <n> -> ws collapse) where the engine
    groups by xxhash64(source, level_ord, norm) — equal up to 64-bit hash
    collisions. The rendered message embeds value's double->string form;
    digits normalize to <n> on both engines, so only STRUCTURAL formatting
    divergence (E-notation) could split groups differently — guarded with
    error() on any value outside the structurally-stable range.
    """
    keep = max(1, min_repeats // 2)
    return f"""
WITH RECURSIVE tr AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
              - 1 AS INTEGER) AS turn_idx,
         CAST(floor(epoch(min(ts) OVER (PARTITION BY user_id))) AS BIGINT)
           + {step_s} * (row_number() OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) - 1)
           AS es,
         CASE WHEN event_type = 'error' THEN 'ERROR'
              WHEN event_type = 'purchase' THEN 'WARN'
              ELSE 'INFO' END AS source,
         CASE WHEN value < 0 OR abs(value) >= 1e7
                   OR (value <> 0 AND abs(value) < 1e-3)
              THEN error('value outside the double-formatting-stable range')
              ELSE trim(regexp_replace(regexp_replace(regexp_replace(
                lower('- type=' || event_type || ' value='
                      || CAST(value AS VARCHAR)
                      || ' user=' || CAST(user_id AS VARCHAR)),
                '[0-9a-f]{{8,}}', '<id>', 'g'),
                '\\b\\d+\\b', '<n>', 'g'),
                '\\s+', ' ', 'g'))
         END AS norm
  FROM events
), g AS (
  SELECT conv_id, source, norm, turn_idx, es,
         row_number() OVER (PARTITION BY conv_id, source, norm
                            ORDER BY turn_idx) AS rn
  FROM tr
), scan AS (
  SELECT conv_id, source, norm, rn, turn_idx, es,
         [es] AS carry, 1 >= {min_repeats} AS fired, es AS ws, es AS we,
         CAST(1 AS DOUBLE) AS score
  FROM g WHERE rn = 1
  UNION ALL
  SELECT conv_id, source, norm, rn, turn_idx, es,
         CASE WHEN c > {min_repeats} THEN kept[-{keep}:] ELSE kept END
           AS carry,
         c >= {min_repeats} AS fired, kept[1] AS ws, kept[-1] AS we,
         CAST(c AS DOUBLE) AS score
  FROM (
    SELECT *, len(kept) AS c FROM (
      SELECT r.conv_id, r.source, r.norm, r.rn, r.turn_idx, r.es,
             list_slice(app, list_position(
               list_transform(app, x -> x >= r.es - {window_s}), true),
               len(app)) AS kept
      FROM (
        SELECT r2.*, list_append(s.carry, r2.es) AS app
        FROM scan s JOIN g r2
          ON r2.conv_id = s.conv_id AND r2.source = s.source
         AND r2.norm = s.norm AND r2.rn = s.rn + 1
      ) r
    )
  )
)
SELECT conv_id, turn_idx, 'burst' AS detector, 3 AS anomaly_type,
       2 AS severity,
       CAST(to_timestamp(ws) AS TIMESTAMP) AS window_start,
       CAST(to_timestamp(we) AS TIMESTAMP) AS window_end,
       score, source,
       'Burst repetition detected: ' || CAST(CAST(score AS BIGINT) AS VARCHAR)
         || ' repeats within {window_s}s' AS description
FROM scan WHERE fired
"""


def q_statistical_detector(spark, sf_dir):
    """W2 z-score detector (rate windows + Welford-equivalent prefix stats)
    end-to-end on the transcript rendering. DuckDB-PAIRED since round 5:
    the oracle re-derives the full chain (transcript rendering -> parse
    quirk source=[LEVEL] token -> trailing-600s rate -> prefix mean/
    stddev_samp -> |z|>3 filter -> severity mapping -> printf description)
    in plain SQL, so the detector's complete output — including the
    formatted description string — is value-hash checked."""
    _utc(spark)
    from intelligent_log_analysis_anomaly_detection_tool_spark.functions.parse_select import (
        parse_stage,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.detectors.statistical import (
        statistical_anomalies,
    )

    out = statistical_anomalies(parse_stage(events_as_transcripts(spark, sf_dir)))
    # score rounded to 6 decimals for the hash compare (house style, cf.
    # zscore_prefix/spike_windows): Spark's Welford stddev and DuckDB's
    # segment-tree stddev legitimately differ in the last ulps (<= ~3e-15
    # relative); the description string embeds the %.2f/%.1f-formatted
    # full-precision values and IS byte-compared, so semantics stay pinned
    return out.withColumn("score", F.round(F.col("score"), 6) + F.lit(0.0))


def _statistical_detector_sql() -> str:
    """Closed-form oracle for q_statistical_detector.

    Mirrors statistical.py:52 on the events_as_transcripts rendering:
    - source = the parse quirk's bracket capture = the LEVEL token
      (LogParser.cpp:340-366 quirk: first '[...]' content), i.e.
      error->ERROR / purchase->WARN / else INFO
    - turn_idx = per-user (ts, event_id) rank - 1; epoch = floor(epoch(ts))
      (ts_parsed is the 19-char second-truncated rendering)
    - keys (conv_id, source); rate per StatisticalDetector.cpp:28-77:
      n < 2 -> n*60/600 else n / max(1e-6, max(1, span)/60), span measured
      first-retained-to-current inside the trailing 600 s window
    - prefix avg/stddev_samp INCLUDING the current row (Welford order),
      z gated on cnt >= 10 and sd != 0, fire iff |z| > 3
    - severity: sev = min(1, |z|/3) -> always 1.0 -> S_HIGH = 2
    - description via printf — C-style %.2f/%.1f matches Python format
      on bit-identical doubles
    """
    return """
WITH tr AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
              - 1 AS INTEGER) AS turn_idx,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         CAST(to_timestamp(floor(epoch(ts))) AS TIMESTAMP) AS ts_parsed,
         CASE WHEN event_type = 'error' THEN 'ERROR'
              WHEN event_type = 'purchase' THEN 'WARN'
              ELSE 'INFO' END AS source
  FROM events
), w AS (
  SELECT conv_id, source, turn_idx, es, ts_parsed,
         row_number() OVER (PARTITION BY conv_id, source
                            ORDER BY es, turn_idx) AS cnt,
         count(*) OVER (PARTITION BY conv_id, source ORDER BY es
                        RANGE BETWEEN UNBOUNDED PRECEDING
                        AND 601 PRECEDING) AS older,
         min(es) OVER (PARTITION BY conv_id, source ORDER BY es
                       RANGE BETWEEN 600 PRECEDING
                       AND CURRENT ROW) AS first_epoch
  FROM tr
), r AS (
  SELECT *, cnt - older AS n_rate,
         greatest(1.0, CAST(es - first_epoch AS DOUBLE)) AS span
  FROM w
), rr AS (
  SELECT *,
         CASE WHEN n_rate < 2 THEN CAST(n_rate AS DOUBLE) * 60.0 / 600.0
              ELSE CAST(n_rate AS DOUBLE) / greatest(1e-6, span / 60.0)
         END AS rate
  FROM r
), st AS (
  SELECT *,
         avg(rate) OVER pw AS mean,
         stddev_samp(rate) OVER pw AS sd_raw
  FROM rr
  WINDOW pw AS (PARTITION BY conv_id, source ORDER BY es, turn_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), gated AS (
  -- DuckDB's windowed stddev_samp (segment-tree combine) leaves O(1e-18)
  -- residue on CONSTANT input where Spark/the reference's Welford update is
  -- exactly 0 (x - mean == 0 -> m2 += 0); gate at 1e-9 relative to the mean
  -- — genuine rate variation is quantized (rates are n*60/span with integer
  -- span <= 600) so any real sd is >= ~1e-7, six orders above the residue
  SELECT *,
         coalesce(
           CASE WHEN sd_raw > 1e-9 * greatest(abs(mean), 1.0)
                THEN sd_raw END,
           0.0) AS sd
  FROM st
), zs AS (
  SELECT *,
         CASE WHEN cnt >= 10 AND sd <> 0.0
              THEN (rate - mean) / sd ELSE 0.0 END AS z
  FROM gated
)
SELECT conv_id, turn_idx, 'statistical' AS detector,
       2 AS anomaly_type,
       CASE WHEN least(1.0, abs(z) / 3.0) >= 0.9 THEN 2
            WHEN least(1.0, abs(z) / 3.0) >= 0.6 THEN 1
            ELSE 0 END AS severity,
       ts_parsed AS window_start, ts_parsed AS window_end,
       round(z, 6) + 0.0 AS score, source,
       printf('Statistical anomaly detected (Z=%.2f): %s event rate ' ||
              'deviation %.2fσ from mean μ=%.1f σ=%.1f',
              z, source, abs(z), mean, sd) AS description
FROM zs WHERE abs(z) > 3.0
"""


def q_novel_grams(spark, sf_dir):
    """A10/A11 novelty core, DuckDB-PAIRED (round 4): the engine's
    novel_sequences operator (chained-hash counting, broadcast anti-join,
    tail-gram branch — the real scale plan) over a parsed-shaped frame built
    directly from events columns, vs a closed-form SQL oracle that generates
    every n-gram occurrence once with its overlap-recount weight
    (weight = least(W+1-L, N-p-L+1), PatternAnalyzer.cpp:42-72) and keeps
    total == 1. The synthetic message uses only string/int fields so the
    signature is byte-identical across engines (no double formatting)."""
    _utc(spark)
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.detectors.pattern import (
        novel_sequences,
    )

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    level_ord = (
        F.when(F.col("event_type") == "error", F.lit(3))
        .when(F.col("event_type") == "purchase", F.lit(2))
        .otherwise(F.lit(1))
    )
    message = F.concat(
        F.lit("type="), F.col("event_type"),
        F.lit(" seq="), F.pmod(F.col("event_id"), 7).cast("string"),
        F.lit(" u="), F.col("user_id").cast("string"),
    )
    parsed_shape = ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.lit(False).alias("malformed"),
        F.lit("events-svc").alias("source"),
        level_ord.alias("level_ord"),
        message.alias("message"),
    )
    return novel_sequences(parsed_shape)


def _novel_grams_sql(W: int = 10) -> str:
    """NULL-handling note (ADVICE r4): the engine builds signatures with
    concat_ws (NULL operands are SKIPPED with their separator) while this
    oracle uses || (any NULL operand nulls the whole sig) — the two only
    agree because the events fixture is fully non-null. The base CTE guards
    that invariant with error(), so a NULL row makes the pairing fail with
    a clear message instead of silently diverging."""
    lead_cols = ",\n         ".join(
        f"lead(sig, {i}) OVER w AS s{i}" for i in range(1, W)
    )
    arms = []
    for ln in range(2, W + 1):
        chain = " || '->' || ".join(f"s{i}" for i in range(ln))
        arms.append(
            f"SELECT conv_id, {chain} AS seq_sig,\n"
            f"       LEAST({W + 1 - ln}, n_conv - p - {ln - 1}) AS wt\n"
            f"  FROM leads WHERE s{ln - 1} IS NOT NULL"
        )
    grams = "\n  UNION ALL\n".join(arms)
    return f"""
WITH base AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS conv_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS p,
         'events-svc:'
           || CAST(CASE WHEN event_type = 'error' THEN 3
                        WHEN event_type = 'purchase' THEN 2
                        ELSE 1 END AS VARCHAR)
           || ':'
           || substr('type=' || event_type
                     || ' seq=' || CAST(event_id % 7 AS VARCHAR)
                     || ' u=' || CAST(user_id AS VARCHAR), 1, 20) AS sig
  FROM events
  WHERE CASE WHEN event_type IS NULL OR user_id IS NULL
                  OR event_id IS NULL OR ts IS NULL
             THEN error('novel_grams oracle: NULL in events violates the '
                        || 'non-null invariant (concat_ws vs || diverge)')
             ELSE TRUE END
), leads AS (
  SELECT conv_id, p,
         count(*) OVER (PARTITION BY conv_id) AS n_conv,
         sig AS s0,
         {lead_cols}
  FROM base WINDOW w AS (PARTITION BY conv_id ORDER BY p)
), grams AS (
  {grams}
)
SELECT conv_id, seq_sig
FROM grams GROUP BY conv_id, seq_sig HAVING SUM(wt) = 1
"""


def q_pattern_novel(spark, sf_dir):
    """A10/A11 full pattern detector (novel-sequence mining + anomaly
    rendering) on the transcript rendering. DuckDB-PAIRED since round 5:
    the oracle re-derives the whole chain in closed form — transcript text
    -> parse (bracket-quirk source, level search, first-3-words signature
    prefix truncated to 20 chars, PatternAnalyzer.cpp:176-206) -> every
    2..10-gram occurrence generated once with its overlap-recount weight
    (least(W+1-L, N-p-L+1), PatternAnalyzer.cpp:42-72) -> novel iff total
    weight == 1 -> the two description renderings with the conv min/max
    timestamp window (PatternAnalyzer.cpp:119-145)."""
    _utc(spark)
    from intelligent_log_analysis_anomaly_detection_tool_spark.functions.parse_select import (
        parse_stage,
    )
    from intelligent_log_analysis_anomaly_detection_tool_spark.operators.detectors.pattern import (
        pattern_anomalies,
    )

    return pattern_anomalies(parse_stage(events_as_transcripts(spark, sf_dir)))


def _pattern_novel_sql(W: int = 10) -> str:
    """Closed-form oracle for q_pattern_novel.

    Signature per element: source ':' level_ord ':' first-3-words-prefix
    where the transcript line parses to source = bracket LEVEL token,
    level_ord 4/3/2, and message tokens ("-", "type=X", "value=V", ...) —
    the first three joined and truncated at 20 chars, so at most the value's
    two leading digit chars enter the signature (identical across engines:
    both render doubles shortest-roundtrip). Novelty = the same
    weighted-occurrence closed form as _novel_grams_sql; rendering emits
    the unconditional "New sequence pattern" row plus the conditional
    high-severity row, windowed [min_ts, max_ts] of the conversation."""
    lead_cols = ",\n         ".join(
        f"lead(sig, {i}) OVER w AS s{i}" for i in range(1, W)
    )
    arms = []
    for ln in range(2, W + 1):
        chain = " || '->' || ".join(f"s{i}" for i in range(ln))
        arms.append(
            f"SELECT conv_id, {chain} AS seq_sig,\n"
            f"       LEAST({W + 1 - ln}, n_conv - p - {ln - 1}) AS wt\n"
            f"  FROM leads WHERE s{ln - 1} IS NOT NULL"
        )
    grams = "\n  UNION ALL\n".join(arms)
    return f"""
WITH base AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS conv_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS p,
         CAST(to_timestamp(floor(epoch(ts))) AS TIMESTAMP) AS ts_parsed,
         CASE WHEN event_type = 'error' THEN 'ERROR:4:'
              WHEN event_type = 'purchase' THEN 'WARN:3:'
              ELSE 'INFO:2:' END
           || substr('- type=' || event_type || ' value='
                     || CAST(value AS VARCHAR), 1, 20) AS sig
  FROM events
  WHERE CASE WHEN event_type IS NULL OR user_id IS NULL
                  OR event_id IS NULL OR ts IS NULL OR value IS NULL
             THEN error('pattern_novel oracle: NULL in events violates the '
                        || 'non-null invariant (concat_ws vs || diverge)')
             ELSE TRUE END
), rng AS (
  SELECT conv_id, min(ts_parsed) AS mn, max(ts_parsed) AS mx
  FROM base GROUP BY 1
), leads AS (
  SELECT conv_id, p,
         count(*) OVER (PARTITION BY conv_id) AS n_conv,
         sig AS s0,
         {lead_cols}
  FROM base WINDOW w AS (PARTITION BY conv_id ORDER BY p)
), grams AS (
  {grams}
), novel AS (
  SELECT conv_id, seq_sig
  FROM grams GROUP BY conv_id, seq_sig HAVING SUM(wt) = 1
), descs AS (
  SELECT conv_id, 'New sequence pattern: ' || seq_sig AS description
  FROM novel
  UNION ALL
  SELECT conv_id,
         'Novel high-severity pattern: ' || substr(seq_sig, 1, 50) || '...'
  FROM novel
  WHERE seq_sig LIKE '%ERROR%' OR seq_sig LIKE '%CRITICAL%'
     OR seq_sig LIKE '%FATAL%'
)
SELECT d.conv_id, CAST(NULL AS INTEGER) AS turn_idx,
       'pattern' AS detector, 3 AS anomaly_type, 1 AS severity,
       r.mn AS window_start, r.mx AS window_end,
       CAST(1.0 AS DOUBLE) AS score, CAST(NULL AS VARCHAR) AS source,
       d.description
FROM descs d JOIN rng r ON d.conv_id = r.conv_id
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "minute_pivot": q_minute_pivot,
        "type_counts": q_type_counts,
        "user_stats": q_user_stats,
        "top_users": q_top_users,
        "rare_pairs": q_rare_pairs,
        "spike_windows": q_spike_windows,
        "zscore_prefix": q_zscore_prefix,
        "first_n_per_key": q_first_n_per_key,
        "anchor_buckets": q_anchor_buckets,
        "report_order": q_report_order,
        "bigram_sequences": q_bigram_sequences,
        "burst_normalize": q_burst_normalize,
        "message_hash_top": q_message_hash_top,
        "dedup_exact": q_dedup_exact,
        "token_stats": q_token_stats,
        "quality_scores": q_quality_scores,
        "lang_id": q_lang_id,
        "bpe_token_count": q_bpe_token_count,
        "doc_fingerprint": q_doc_fingerprint,
        "jaccard_pairs": q_jaccard_pairs,
        "minhash_signatures": q_minhash_signatures,
        "lsh_pairs": q_lsh_pairs,
        "simhash16": q_simhash16,
        "embedding_topk": q_embedding_topk,
        "binary_meta": q_binary_meta,
        "ann_ivf_topk": q_ann_ivf_topk,
        "simhash_near_dup_pairs": q_simhash_near_dup,
        "simhash64_pairs": q_simhash64_pairs,
        "novel_grams": q_novel_grams,
        "burst_detector": q_burst_detector,
        "statistical_detector": q_statistical_detector,
        "pattern_novel": q_pattern_novel,
        "cosine_near_dup": q_cosine_near_dup,
        "median_by_type": q_median_by_type,
        "sessionize": q_sessionize,
        "region_revenue": q_region_revenue,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "minute_pivot": SQL_MINUTE_PIVOT,
        "type_counts": SQL_TYPE_COUNTS,
        "user_stats": SQL_USER_STATS,
        "top_users": SQL_TOP_USERS,
        "rare_pairs": SQL_RARE_PAIRS,
        "spike_windows": SQL_SPIKE_WINDOWS,
        "zscore_prefix": SQL_ZSCORE_PREFIX,
        "first_n_per_key": SQL_FIRST_N_PER_KEY,
        "anchor_buckets": SQL_ANCHOR_BUCKETS,
        "report_order": SQL_REPORT_ORDER,
        "bigram_sequences": SQL_BIGRAM_SEQUENCES,
        "burst_normalize": SQL_BURST_NORMALIZE,
        "message_hash_top": SQL_MESSAGE_HASH_TOP,
        "dedup_exact": SQL_DEDUP_EXACT,
        "token_stats": SQL_TOKEN_STATS,
        "quality_scores": SQL_QUALITY_SCORES,
        "lang_id": SQL_LANG_ID,
        "bpe_token_count": SQL_BPE_TOKEN_COUNT,
        "doc_fingerprint": SQL_DOC_FINGERPRINT,
        "jaccard_pairs": SQL_JACCARD_PAIRS,
        "minhash_signatures": SQL_MINHASH_SIGNATURES,
        "lsh_pairs": SQL_LSH_PAIRS,
        "simhash16": _simhash16_sql(),
        "simhash_near_dup_pairs": _simhash_near_dup_sql(),
        "simhash64_pairs": _simhash64_pairs_sql(),
        "novel_grams": _novel_grams_sql(),
        "pattern_novel": _pattern_novel_sql(),
        "statistical_detector": _statistical_detector_sql(),
        "burst_detector": _burst_detector_sql(),
        "embedding_topk": SQL_EMBEDDING_TOPK,
        "binary_meta": SQL_BINARY_META,
        "cosine_near_dup": SQL_COSINE_NEAR_DUP,
        "median_by_type": SQL_MEDIAN_BY_TYPE,
        "sessionize": SQL_SESSIONIZE,
        "region_revenue": SQL_REGION_REVENUE,
        # round 5: ann_ivf_topk paired via the first_n-centroid variant —
        # the full pruned pipeline (assignment + probe + cell-pruned scan)
        # replayed in SQL; kmeans mode stays recall-pytested.
        "ann_ivf_topk": SQL_ANN_IVF_TOPK,
    }
