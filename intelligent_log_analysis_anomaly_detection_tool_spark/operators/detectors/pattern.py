"""A9-A11 PatternAnalyzer: n-gram sequence mining over a 10-event sliding
window, novel-pattern anomalies.

Reference semantics (/root/reference/src/analysis/PatternAnalyzer.cpp):

- event signature (:176-206): ``source:level_int:prefix`` where prefix is the
  first 3 single-space tokens of the message (each trimmed, empties dropped)
  joined by ' '; sequence signature joins elements with "->" truncating each
  element's prefix to 20 chars
- per event (:42-72): regenerate ALL contiguous n-grams (len 2..min(10,win))
  of the 10-event sliding window and increment each — overlapping re-counts
  are intentional-by-implementation and reproduced exactly
- anomalies (:119-145): sequence count == 1 -> "New sequence pattern: <sig>";
  pattern freq == 1 AND sig contains ERROR/CRITICAL/FATAL (case-sensitive,
  matches the SOURCE token captured by quirk P4) -> "Novel high-severity
  pattern: <sig[:50]>..." (both fire for qualifying sigs)
- wrapped as (SequenceViolation, Medium, [minTs,maxTs], 1.0) at main.cpp:384-392

Spark-first: collect_list over a rows window + higher-order functions
(sequence/transform/flatten) generate the n-grams natively; explode +
groupBy(count) does the mining with map-side partial aggregation. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ...config import PatternConfig
from .common import S_MED, T_SEQ, as_anomaly


def event_signature(source: Column, level_ord: Column, message: Column,
                    prefix_words: int = 3, prefix_trunc: int = 20) -> Column:
    toks = F.filter(
        F.transform(F.split(message, " "),
                    lambda t: F.regexp_replace(t, r"^\s+|\s+$", "")),
        lambda t: t != "",
    )
    prefix = F.substring(
        F.array_join(F.slice(toks, 1, prefix_words), " "), 1, prefix_trunc
    )
    return F.concat_ws(":", source, level_ord.cast("string"), prefix)


def sequence_counts(parsed: DataFrame, cfg: PatternConfig = PatternConfig()) -> DataFrame:
    """A10: (conv_id, seq_sig) -> count with the reference's overlap-recount
    semantics."""
    df = parsed.filter(~F.col("malformed"))
    sig = event_signature(
        F.col("source"), F.col("level_ord"), F.col("message"),
        cfg.prefix_words, cfg.prefix_trunc,
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-(cfg.sequence_window - 1), Window.currentRow)
    )
    df = df.withColumn("win_sigs", F.collect_list(sig).over(w))
    ngrams = F.when(
        F.size("win_sigs") >= 2,
        F.flatten(
            F.transform(
                F.sequence(F.lit(2), F.size("win_sigs")),
                lambda ln: F.transform(
                    F.sequence(F.lit(1), F.size("win_sigs") - ln + 1),
                    lambda s: F.array_join(
                        F.slice("win_sigs", s, ln), "->"
                    ),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = df.select("conv_id", F.explode(ngrams).alias("seq_sig"))
    return exploded.groupBy("conv_id", "seq_sig").agg(
        F.count(F.lit(1)).alias("n")
    )


def pattern_anomalies(parsed: DataFrame, cfg: PatternConfig = PatternConfig()) -> DataFrame:
    counts = sequence_counts(parsed, cfg)
    rng = (
        parsed.filter(~F.col("malformed"))
        .groupBy("conv_id")
        .agg(F.min("ts_parsed").alias("min_ts"), F.max("ts_parsed").alias("max_ts"))
    )
    novel = counts.filter(F.col("n") == 1).join(rng, "conv_id")

    high = (
        F.col("seq_sig").contains("ERROR")
        | F.col("seq_sig").contains("CRITICAL")
        | F.col("seq_sig").contains("FATAL")
    )

    def project(desc: Column) -> list[Column]:
        return [
            F.col("conv_id"),
            F.lit(None).cast("int").alias("turn_idx"),
            F.lit("pattern").alias("detector"),
            F.lit(T_SEQ).alias("anomaly_type"),
            F.lit(S_MED).alias("severity"),
            F.col("min_ts").alias("window_start"),
            F.col("max_ts").alias("window_end"),
            F.lit(1.0).alias("score"),
            F.lit(None).cast("string").alias("source"),
            desc.alias("description"),
        ]

    new_seq = novel.select(
        *project(F.concat(F.lit("New sequence pattern: "), F.col("seq_sig")))
    )
    novel_high = novel.filter(high).select(
        *project(
            F.concat(
                F.lit("Novel high-severity pattern: "),
                F.substring(F.col("seq_sig"), 1, 50),
                F.lit("..."),
            )
        )
    )
    return as_anomaly(new_seq.unionByName(novel_high))


def pattern_stats(parsed: DataFrame, cfg: PatternConfig = PatternConfig()):
    """A9: totals / repeating>=2 / error-chain counts / top-10 (per conv)."""
    counts = sequence_counts(parsed, cfg)
    err = F.col("seq_sig").contains("ERROR") | F.col("seq_sig").contains("CRITICAL")
    stats = counts.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("total_patterns"),
        F.count_if(F.col("n") >= 2).alias("repeating_patterns"),
        F.count_if(err).alias("error_chains"),
    )
    w = Window.partitionBy("conv_id").orderBy(F.desc("n"), "seq_sig")
    top = counts.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 10
    )
    return dict(stats=stats, top_patterns=top)
