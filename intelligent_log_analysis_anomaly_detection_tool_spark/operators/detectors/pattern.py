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
    semantics.

    The reference regenerates EVERY n-gram of the 10-event window on EVERY
    event (PatternAnalyzer.cpp:55-71), i.e. ~45 string builds per row. The
    same totals have a closed form: an n-gram occurrence of length L starting
    at in-conv position p (0-based) appears in exactly

        min(W + 1 - L, N - p - L + 1)      (W = window size, N = conv length)

    of the per-event windows. So we generate each occurrence ONCE from a
    forward-looking window (<= W-1 n-grams per row instead of ~45) carrying
    that weight, and sum weights — a 5x reduction in exploded rows and string
    building while remaining exactly count-equal to the reference.
    """
    prep = _with_lead_sigs(parsed, cfg)
    W = cfg.sequence_window
    grams = []
    chain = F.col("s0")
    for ln in range(2, W + 1):
        chain = F.concat(chain, F.lit("->"), F.col(f"s{ln - 1}"))
        grams.append(
            F.when(
                F.col(f"s{ln - 1}").isNotNull(),
                F.struct(chain.alias("seq_sig"), _weight(W, ln).alias("weight")),
            )
        )
    pairs = F.filter(F.array(*grams), lambda g: g.isNotNull())
    exploded = prep.select("conv_id", F.explode(pairs).alias("g"))
    return exploded.groupBy("conv_id", F.col("g.seq_sig").alias("seq_sig")).agg(
        F.sum("g.weight").alias("n")
    )


def _with_lead_sigs(parsed: DataFrame, cfg: PatternConfig) -> DataFrame:
    """conv_id, p (0-based in-conv position), conv_n, s0..s{W-1} (the event
    signature of the current row and its W-1 successors).

    The per-conv window stage only materializes W-1 lead columns of an
    ALREADY-projected sig column (computed once, not once per lead); the
    expensive n-gram work happens AFTER a round-robin repartition, so a hot
    conversation (10% of all rows in one partition) serializes only its sort,
    never the string/hash churn."""
    W = cfg.sequence_window
    df = parsed.filter(~F.col("malformed")).select(
        "conv_id",
        "turn_idx",
        event_signature(
            F.col("source"), F.col("level_ord"), F.col("message"),
            cfg.prefix_words, cfg.prefix_trunc,
        ).alias("s0"),
    )
    w_ord = Window.partitionBy("conv_id").orderBy("turn_idx")
    w_all = Window.partitionBy("conv_id")
    df = df.select(
        "conv_id",
        "s0",
        *[F.lead("s0", i).over(w_ord).alias(f"s{i}") for i in range(1, W)],
        (F.row_number().over(w_ord) - 1).alias("p"),
        F.count(F.lit(1)).over(w_all).alias("conv_n"),
    )
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism * 2)


def _weight(W: int, ln) -> "Column":
    return F.least(
        F.lit(W + 1) - ln, F.col("conv_n") - F.col("p") - ln + 1
    ).cast("long")


def novel_sequences(parsed: DataFrame, cfg: PatternConfig = PatternConfig()) -> DataFrame:
    """(conv_id, seq_sig) for sequences with total count == 1 — the inputs of
    A11 — computed WITHOUT materializing n-gram strings for the non-novel
    bulk:

    1. count by (conv_id, xxhash64(s0..s_{ln-1})) — the hash of the sig TUPLE,
       so no string is ever built for counting; the shuffle carries 24-byte
       rows instead of ~200-byte sequence strings
    2. novel hashes (count==1, a tiny set: weight-1 conv-tail n-grams only)
       broadcast-join back against the generator, and ONLY the surviving rows
       pay the string concatenation

    64-bit tuple-hash collisions within a conversation would merge two
    distinct sequences; at ~10^3..10^5 sequences per conv the collision odds
    are ~1e-11 — accepted and documented."""
    prep = _with_lead_sigs(parsed, cfg)
    W = cfg.sequence_window

    def gh(ln):
        return F.xxhash64(*[F.col(f"s{i}") for i in range(ln)])

    hashed = F.filter(
        F.array(
            *[
                F.when(
                    F.col(f"s{ln - 1}").isNotNull(),
                    F.struct(gh(ln).alias("gh"), _weight(W, ln).alias("weight"),
                             F.lit(ln).alias("ln")),
                )
                for ln in range(2, W + 1)
            ]
        ),
        lambda g: g.isNotNull(),
    )
    exploded = prep.select("conv_id", "p", F.explode(hashed).alias("g")).select(
        "conv_id", "p", "g.gh", "g.weight", "g.ln"
    )
    counts = exploded.groupBy("conv_id", "gh").agg(F.sum("weight").alias("n"))
    novel = counts.filter(F.col("n") == 1).select("conv_id", "gh")

    # regenerate strings only for novel (conv, gh); count==1 implies exactly
    # one generating row, so the join is 1:1 — no dedup needed
    regen = prep.select(
        "conv_id",
        *[F.col(f"s{i}") for i in range(W)],
        F.explode(
            F.filter(
                F.array(
                    *[
                        F.when(F.col(f"s{ln - 1}").isNotNull(), F.lit(ln))
                        for ln in range(2, W + 1)
                    ]
                ),
                lambda x: x.isNotNull(),
            )
        ).alias("ln"),
    )

    def by_ln(make):
        expr = None
        for ln in range(W, 1, -1):
            e = make(ln)
            expr = e if expr is None else F.when(F.col("ln") == ln, e).otherwise(expr)
        return expr

    regen = regen.withColumn(
        "gh", by_ln(lambda ln: F.xxhash64(*[F.col(f"s{i}") for i in range(ln)]))
    )
    survivors = regen.join(F.broadcast(novel), ["conv_id", "gh"])
    sig_expr = by_ln(
        lambda ln: F.concat_ws("->", *[F.col(f"s{i}") for i in range(ln)])
    )
    return survivors.select("conv_id", sig_expr.alias("seq_sig"))


def pattern_anomalies(parsed: DataFrame, cfg: PatternConfig = PatternConfig()) -> DataFrame:
    rng = (
        parsed.filter(~F.col("malformed"))
        .groupBy("conv_id")
        .agg(F.min("ts_parsed").alias("min_ts"), F.max("ts_parsed").alias("max_ts"))
    )
    # one row per conv — always broadcast, never shuffle the big side
    novel = novel_sequences(parsed, cfg).join(F.broadcast(rng), "conv_id")

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
