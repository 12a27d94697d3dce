"""P1-P8: the grok/parse stage as one vectorized Arrow-backed pandas UDF.

Mirrors the reference parser control flow bit-for-bit
(/root/reference/src/input/LogParser.cpp:57-98) so the per-turn text-equality
invariant holds:

- trim; empty -> malformed "Empty line" (LogParser.cpp:61-67)
- '{' prefix -> hand-rolled JSON scan with alias keys (LogParser.cpp:152-229)
- else heuristic plain parse (LogParser.cpp:125-147):
    * timestamp: first 19 chars, digits at fixed offsets, separators UNCHECKED
      (TimeUtils.cpp:73-112 checks only the six numeric fields)
    * level: ordered substring search over the UPPERCASED WHOLE LINE —
      TRACE,DEBUG,INFO,WARN,WARNING,ERROR,FATAL,CRITICAL; first hit wins
      (LogParser.cpp:306-338). A line containing both INFO and ERROR is Info.
    * source: first ':'-prefix without spaces, else first '[...]' content —
      for plain ``ts [LEVEL] svc - msg`` lines this captures the LEVEL token
      (quirk, LogParser.cpp:340-366)
    * message: drop first 20 chars, trim, split on single spaces keeping
      empties, join tokens[2:] with single spaces == substring after the 2nd
      space (LogParser.cpp:368-399)
- malformed taxonomy: "Empty line" / "No matching pattern" /
  "JSON missing required fields: ..." / "Invalid timestamp format"
  (LogParser.cpp:65,96,171-178,214)

All logic is pandas/NumPy vectorized (no per-row Python in the Spark path);
the same function backs the pure-Python oracle parity tests.

Known documented divergence: the reference routes timestamps through
``mktime`` (localtime + field normalization, e.g. month 13 wraps). We pin UTC
and coerce impossible dates to parse-failure; fixtures avoid such lines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..schema import PARSED_STRUCT

# C++ std::isspace set (LogParser.cpp trimSv / Utils::trim)
CPP_WS = " \t\n\v\f\r"
# digits at offsets 0-3,5-6,8-9,11-12,14-15,17-18; separators unchecked.
# [0-9] (not \d): python re \d matches unicode digits, the C++ parser is
# ASCII-strict (TimeUtils.cpp parseIntField checks '0'..'9')
_TS_RE = r"^([0-9]{4}).([0-9]{2}).([0-9]{2}).([0-9]{2}).([0-9]{2}).([0-9]{2})"
_WS_CLS = r"[ \t\n\v\f\r]*"

# plain-path level search order (LogParser.cpp:314-323)
PLAIN_LEVELS = [
    ("TRACE", 0), ("DEBUG", 1), ("INFO", 2), ("WARN", 3),
    ("WARNING", 3), ("ERROR", 4), ("FATAL", 5), ("CRITICAL", 5),
]
# JSON-path level search order (LogParser.cpp:218-226): no WARNING alias,
# CRIT prefix covers CRITICAL.
JSON_LEVELS = [
    ("TRACE", 0), ("DEBUG", 1), ("INFO", 2), ("WARN", 3),
    ("ERROR", 4), ("CRIT", 5), ("FATAL", 5),
]


def _parse_ts19(s: pd.Series) -> pd.Series:
    """parseTimestamp semantics on the first 19 chars: six digit fields at
    fixed offsets, any separator bytes (TimeUtils.cpp:73-112). NaT on fail."""
    head = s.str.slice(0, 19)
    ok_len = s.str.len() >= 19
    g = head.str.extract(_TS_RE)
    g.columns = ["year", "month", "day", "hour", "minute", "second"]
    valid = g["year"].notna() & ok_len
    out = pd.Series(pd.NaT, index=s.index, dtype="datetime64[ns]")
    if valid.any():
        sub = g[valid].astype("int64")
        parsed = pd.to_datetime(sub, errors="coerce", utc=True)
        out.loc[valid] = parsed.dt.tz_localize(None)
    return out


def _contains_level(upper: pd.Series, table: list[tuple[str, int]]) -> pd.Series:
    """Ordered substring search; first hit wins; miss -> Unknown(6)."""
    out = pd.Series(6, index=upper.index, dtype="int64")
    undecided = pd.Series(True, index=upper.index)
    for token, ord_ in table:
        hit = undecided & upper.str.contains(token, regex=False, na=False)
        out.loc[hit] = ord_
        undecided &= ~hit
    return out


def _json_value(t: pd.Series, key: str) -> pd.Series:
    """extractJsonRaw semantics (LogParser.cpp:238-281): find ``"key"``
    anywhere, first ':' after it, skip ws; quoted -> unescape ``\\x -> x``;
    unquoted -> read to ','/'}' and trim. NaN when key/colon absent."""
    prefix = f'"{key}"[^:]*:{_WS_CLS}'
    # astype("string"): extract on zero matches yields a float NaN column
    # whose .str accessor raises
    quoted = t.str.extract(prefix + r'"((?:\\.|[^"\\])*)"', expand=False).astype("string")
    raw = t.str.extract(prefix + r"([^,}]*)", expand=False).astype("string")
    quoted_clean = quoted.str.replace(r"\\(.)", r"\1", regex=True)
    raw_clean = raw.str.strip(CPP_WS)
    out = quoted_clean.where(quoted.notna(), raw_clean)
    # C++ returns MISSING when only whitespace follows the colon to end of
    # string (pos >= size after ws-skip, LogParser.cpp:248-249); the raw
    # regex would return an empty-but-present value there
    dead = t.str.contains(prefix + r"$", regex=True, na=False)
    return out.where(~dead)


def _coalesce(*series: pd.Series) -> pd.Series:
    out = series[0]
    for s in series[1:]:
        out = out.where(out.notna(), s)
    return out


def parse_text_frame(text: pd.Series) -> pd.DataFrame:
    """Vectorized parse of a batch of raw lines -> parsed-struct DataFrame.

    Columns: malformed, error, was_json, ts_parsed, level_ord, source, message.
    """
    n = len(text)
    idx = text.index
    t = text.fillna("").str.strip(CPP_WS)

    malformed = pd.Series(False, index=idx)
    error = pd.Series(None, index=idx, dtype=object)
    ts_parsed = pd.Series(pd.NaT, index=idx, dtype="datetime64[ns]")
    level_ord = pd.Series(np.nan, index=idx, dtype="float64")
    source = pd.Series(None, index=idx, dtype=object)
    message = pd.Series(None, index=idx, dtype=object)

    empty = t.str.len() == 0
    was_json = (~empty) & t.str.startswith("{")
    plain = (~empty) & (~was_json)

    malformed.loc[empty] = True
    error.loc[empty] = "Empty line"

    # ---------------- plain path ----------------
    if plain.any():
        tp = t[plain]
        ts_p = _parse_ts19(tp)

        lv = _contains_level(tp.str.upper(), PLAIN_LEVELS)

        # source: ':'-prefix rule then '[...]' rule (LogParser.cpp:340-366)
        pre = tp.str.extract(r"^([^:]*):", expand=False).astype("string")
        pre_r = pre.str.rstrip(CPP_WS)
        ok1 = pre.notna() & ~pre_r.str.contains(" ", regex=False, na=True)
        bracket = tp.str.extract(r"\[([^\]]*)\]", expand=False).astype("string")
        src = pre_r.where(ok1, bracket)  # NaN when neither applies

        # message: drop first 20 chars when len>20, trim, tokens[2:]
        rem = tp.where(tp.str.len() <= 20, tp.str.slice(20)).str.strip(CPP_WS)
        msg = rem.str.split(" ", n=2).str.get(2).astype("string")

        ok = ts_p.notna() & msg.notna() & (msg.str.len() > 0)
        bad = plain.copy()
        bad.loc[plain] = ~ok
        good = plain & ~bad

        malformed.loc[bad] = True
        error.loc[bad] = "No matching pattern"
        ts_parsed.loc[good] = ts_p[ok]
        level_ord.loc[good] = lv[ok].astype(float)
        # LogEntry construction applies source.value_or("unknown")
        # (LogParser.cpp:144), so the parsed row always carries a source;
        # note "" (empty prefix before ':') is a real value, not missing.
        source.loc[good] = src[ok].where(src[ok].notna(), "unknown")
        message.loc[good] = msg[ok]

    # ---------------- JSON path ----------------
    if was_json.any():
        tj = t[was_json]
        ts_raw = _coalesce(
            _json_value(tj, "timestamp"), _json_value(tj, "time"),
            _json_value(tj, "@timestamp"),
        )
        lvl_raw = _coalesce(_json_value(tj, "level"), _json_value(tj, "severity"))
        msg_raw = _coalesce(_json_value(tj, "message"), _json_value(tj, "msg"))
        src_raw = _coalesce(
            _json_value(tj, "service"), _json_value(tj, "component"),
            _json_value(tj, "source"),
        )

        missing = ts_raw.isna() | lvl_raw.isna() | msg_raw.isna()
        if missing.any():
            err_txt = (
                "JSON missing required fields:"
                + ts_raw.isna().map({True: " timestamp", False: ""})
                + lvl_raw.isna().map({True: " level", False: ""})
                + msg_raw.isna().map({True: " message", False: ""})
            )
            m_idx = tj.index[missing]
            malformed.loc[m_idx] = True
            error.loc[m_idx] = err_txt[missing]

        ts_j = _parse_ts19(ts_raw.fillna(""))
        bad_ts = (~missing) & ts_j.isna()
        if bad_ts.any():
            b_idx = tj.index[bad_ts]
            malformed.loc[b_idx] = True
            error.loc[b_idx] = "Invalid timestamp format"

        ok = (~missing) & ts_j.notna()
        if ok.any():
            o_idx = tj.index[ok]
            ts_parsed.loc[o_idx] = ts_j[ok]
            level_ord.loc[o_idx] = _contains_level(
                lvl_raw[ok].str.upper(), JSON_LEVELS
            ).astype(float)
            # JSON path defaults missing source to "unknown" at construction
            # (LogParser.cpp:228)
            source.loc[o_idx] = src_raw[ok].where(src_raw[ok].notna(), "unknown")
            message.loc[o_idx] = msg_raw[ok]

    return pd.DataFrame(
        {
            "malformed": malformed,
            "error": error,
            "was_json": was_json,
            "ts_parsed": ts_parsed,
            "level_ord": level_ord.astype("Int32"),
            "source": source,
            "message": message,
        },
        index=idx,
    )


def parse_udf():
    """Build the Arrow-batched parse UDF (lazy: pandas_udf registration
    needs an active SparkSession in Spark 4).

    Marked nondeterministic ON PURPOSE: it is semantically deterministic, but
    the flag stops Catalyst from splitting downstream filters through the
    projection and re-executing the Python stage once per consumer — the
    .explain audit showed a duplicated ArrowEvalPython (parse evaluated twice
    per row) without it. Filters on parse outputs cannot reach the parquet
    scan anyway (they depend on the UDF), so nothing is lost."""
    return pandas_udf(parse_text_frame, PARSED_STRUCT).asNondeterministic()


def parse_stage(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Apply the parse UDF and flatten the struct to top-level columns.

    The empty-line skip (main.cpp:196-197: truly empty lines are not even
    counted) is applied here as a native filter so the Arrow batch never
    carries them.
    """
    out = df.filter(F.length(F.col(text_col)) > 0)
    out = out.withColumn("_p", parse_udf()(F.col(text_col)))
    for f in PARSED_STRUCT.fields:
        out = out.withColumn(f.name, F.col(f"_p.{f.name}"))
    return out.drop("_p")


def source_or_unknown(col: str = "source") -> Column:
    """entry.source().value_or("unknown") (main.cpp:271, LogParser.cpp:144)."""
    return F.coalesce(F.col(col), F.lit("unknown"))
