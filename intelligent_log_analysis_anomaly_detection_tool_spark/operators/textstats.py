"""Text analysis operators: token stats, quality scoring, language-ID
heuristic, BPE-ish token counting, document fingerprinting.

All native column expressions (JVM, codegen) — no UDFs — and each is
oracle-paired with an equivalent DuckDB SQL in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import ws_tokens

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "for"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "fr": ["le", "la", "les", "des", "et", "un"],
    "de": ["der", "die", "das", "und", "ein"],
}

# word-or-single-punct tokenization (BPE-ish pre-tokenizer shape)
BPE_RE = r"\w+|[^\w\s]"


def token_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    toks = ws_tokens(F.col(text_col))
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.round(total_len / F.greatest(F.size(toks), F.lit(1)), 4).alias(
            "avg_token_len"
        ),
    )


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: stopword ratio, distinct ratio, and a
    composite score — the standard corpus-filtering signals."""
    toks = ws_tokens(F.col(text_col))
    en = STOPWORDS["en"]
    stop_n = F.size(F.filter(toks, lambda t: F.lower(t).isin(en)))
    n = F.greatest(F.size(toks), F.lit(1))
    stop_ratio = stop_n / n
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    score = F.round(
        F.least(F.lit(1.0), stop_ratio * 2.0) * 0.5 + distinct_ratio * 0.5, 4
    )
    return docs.select(
        F.col(id_col),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        score.alias("quality_score"),
    )


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Stopword-marker language ID: per language, count marker-token hits;
    argmax with deterministic tie-break on language code order."""
    toks = ws_tokens(F.lower(F.col(text_col)))

    def marker_pred(ws):
        # NB: a two-arg lambda would be treated as (element, index) by
        # F.filter's arity detection — keep it single-arg via this closure
        return lambda t: t.isin(ws)

    scores = {
        lang: F.size(F.filter(toks, marker_pred(ws)))
        for lang, ws in STOPWORDS.items()
    }
    langs = sorted(scores)
    best = None
    best_score = None
    for lang in langs:
        s = scores[lang]
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return docs.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
        best.alias("pred_lang"),
    )


def bpe_token_count(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(BPE_RE)).alias("bpe_tokens"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Canonical document fingerprint: md5 over the sorted distinct token
    set (order-insensitive near-exact dup key)."""
    toks = ws_tokens(F.lower(F.col(text_col)))
    canon = F.array_join(F.array_sort(F.array_distinct(toks)), " ")
    return docs.select(F.col(id_col), F.md5(canon).alias("fingerprint"))
