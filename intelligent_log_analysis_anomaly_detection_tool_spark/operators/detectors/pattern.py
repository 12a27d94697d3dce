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
    A11 — computed WITHOUT aggregating the full n-gram stream.

    Key identity: total count n(sig) = Σ over occurrences of
    min(W+1-L, N-p-L+1). Every occurrence contributes ≥ 1, and an occurrence
    has weight exactly 1 iff L == W (a full-window gram fits exactly one
    window) or it ends at the conversation's LAST row (p + L == N). Hence

        n == 1  ⇔  exactly one occurrence ∧ (L == W ∨ tail occurrence).

    Two cheap branches instead of aggregating the 9x-exploded stream:

    (a) W-grams: one shuffle keyed by xxhash64(conv, s0..s_{W-1}) with a
        count window; rows with count == 1 are novel (strings built in the
        same pass — output-proportional, since most W-grams over real logs
        are unique and become anomaly rows anyway)
    (b) tail n-grams with L < W: ≤ W-2 candidates per conversation (tiny);
        the full generator emits ONLY 64-bit tuple-hashes and is semi-joined
        against the broadcast candidate set BEFORE any exchange; survivors
        are counted; novel ⇔ occurrences == 1; strings built only for those

    64-bit tuple-hash collisions would merge two distinct sequences; odds at
    ~10^5 sequences/conv are ~1e-11 — accepted and documented."""
    prep = _with_lead_sigs(parsed, cfg)
    W = cfg.sequence_window

    def gh(ln):
        return F.xxhash64(F.col("conv_id"), *[F.col(f"s{i}") for i in range(ln)])

    def by_ln(make, lo, hi):
        expr = None
        for ln in range(hi, lo - 1, -1):
            e = make(ln)
            expr = e if expr is None else F.when(F.col("ln") == ln, e).otherwise(expr)
        return expr

    def sig_str(ln):
        return F.concat_ws("->", *[F.col(f"s{i}") for i in range(ln)])

    # (a) full-window grams: count per hash via a no-sort window, keep singles
    grams_w = prep.filter(F.col(f"s{W - 1}").isNotNull()).select(
        "conv_id", gh(W).alias("gh"), sig_str(W).alias("seq_sig")
    )
    w_gh = Window.partitionBy("gh")
    novel_a = (
        grams_w.withColumn("occ", F.count(F.lit(1)).over(w_gh))
        .filter(F.col("occ") == 1)
        .select("conv_id", "seq_sig")
    )

    # (b) tail grams shorter than W: ln = N - p in [2, W-1]
    cand = (
        prep.filter(
            (F.col("conv_n") - F.col("p") >= 2)
            & (F.col("conv_n") - F.col("p") <= W - 1)
        )
        .withColumn("ln", (F.col("conv_n") - F.col("p")).cast("int"))
        .withColumn("gh", by_ln(gh, 2, W - 1))
    )
    cand_keys = cand.select("gh").distinct()
    hashes = F.filter(
        F.array(
            *[
                F.when(F.col(f"s{ln - 1}").isNotNull(), gh(ln))
                for ln in range(2, W)
            ]
        ),
        lambda x: x.isNotNull(),
    )
    occ = prep.select(F.explode(hashes).alias("gh"))
    occ = occ.join(F.broadcast(cand_keys), "gh")
    singles = (
        occ.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .filter(F.col("occurrences") == 1)
        .select("gh")
    )
    novel_b = cand.join(F.broadcast(singles), "gh").select(
        "conv_id", by_ln(sig_str, 2, W - 1).alias("seq_sig")
    )

    return novel_a.unionByName(novel_b)


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
