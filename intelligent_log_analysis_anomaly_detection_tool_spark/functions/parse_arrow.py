"""P1-P8 parse stage, Arrow-native variant.

Same semantics as functions/parse.py (the trusted pandas implementation,
itself oracle-parity-tested), but runs on pyarrow RecordBatches via
``mapInArrow`` + ``pyarrow.compute`` — no Python string objects are ever
materialized, which removes the dominant per-row cost of the pandas path
(Arrow->pandas object conversion + object-dtype regex).

All regexes are RE2 (pyarrow) — every pattern used here is RE2-safe (no
backrefs in patterns; ``\\1`` appears only in replacements, which RE2
supports). Timestamp parsing uses strptime on a re-rendered canonical string
built from the six digit fields, preserving the reference's
"digits at fixed offsets, separators unchecked" rule and rejecting
impossible dates exactly like the oracle.

Known (documented) divergence from the pandas path: non-ASCII FULL case
mapping in the level scan (python ``str.upper`` expands ligatures,
``utf8_upper`` does not). Log level tokens are ASCII; the parity and fuzz
suites cover the realistic alphabet.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import PARSED_STRUCT

CPP_WS = " \t\n\v\f\r"
_WS_CLS = r"[ \t\n\v\f\r]*"

_TS_RE = (
    r"^(?P<y>[0-9]{4}).(?P<mo>[0-9]{2}).(?P<d>[0-9]{2})"
    r".(?P<h>[0-9]{2}).(?P<mi>[0-9]{2}).(?P<s>[0-9]{2})"
)

PLAIN_LEVELS = [
    ("TRACE", 0), ("DEBUG", 1), ("INFO", 2), ("WARN", 3),
    ("WARNING", 3), ("ERROR", 4), ("FATAL", 5), ("CRITICAL", 5),
]
JSON_LEVELS = [
    ("TRACE", 0), ("DEBUG", 1), ("INFO", 2), ("WARN", 3),
    ("ERROR", 4), ("CRIT", 5), ("FATAL", 5),
]


def _extract(arr, pattern: str, group: str):
    st = pc.extract_regex(arr, pattern)
    return pc.struct_field(st, group)


def _parse_ts19(s):
    """Six digit fields at fixed offsets of the first 19 chars, separators
    unchecked; strptime on a canonical re-render validates real dates."""
    head = pc.utf8_slice_codeunits(s, 0, 19)
    ok_len = pc.greater_equal(pc.utf8_length(s), 19)
    g = pc.extract_regex(head, _TS_RE)
    canon = pc.binary_join_element_wise(
        pc.struct_field(g, "y"), pc.cast(pa.scalar("-"), pa.string()),
        pc.struct_field(g, "mo"), "-", pc.struct_field(g, "d"), " ",
        pc.struct_field(g, "h"), ":", pc.struct_field(g, "mi"), ":",
        pc.struct_field(g, "s"), "",
    )
    ts = pc.strptime(canon, format="%Y-%m-%d %H:%M:%S", unit="us",
                     error_is_null=True)
    return pc.if_else(ok_len, ts, pa.scalar(None, pa.timestamp("us")))


def _level_scan(upper, table):
    out = pa.scalar(6, pa.int32())
    expr = None
    for tok, ordv in reversed(table):
        hit = pc.match_substring(upper, tok)
        if expr is None:
            expr = pc.if_else(hit, pa.scalar(ordv, pa.int32()), out)
        else:
            expr = pc.if_else(hit, pa.scalar(ordv, pa.int32()), expr)
    return expr


def _json_value(t, key: str):
    """extractJsonRaw semantics (see parse.py) in RE2."""
    prefix = f'"{key}"[^:]*:{_WS_CLS}'
    quoted = _extract(t, prefix + r'"(?P<v>(?:\\.|[^"\\])*)"', "v")
    raw = _extract(t, prefix + r"(?P<v>[^,}]*)", "v")
    quoted_clean = pc.replace_substring_regex(quoted, r"\\(.)", r"\1")
    raw_clean = pc.utf8_trim(raw, CPP_WS)
    out = pc.coalesce(quoted_clean, raw_clean)
    dead = pc.match_substring_regex(t, prefix + r"$")
    return pc.if_else(dead, pa.scalar(None, pa.string()), out)


def _mask_concat(cond, then_str: str):
    return pc.if_else(cond, pa.scalar(then_str), pa.scalar(""))


def parse_arrays(text: pa.Array) -> dict:
    """Parse a text column; returns dict of arrays for the parsed struct."""
    n = len(text)
    t = pc.utf8_trim(pc.fill_null(text, ""), CPP_WS)
    empty = pc.equal(pc.utf8_length(t), 0)
    was_json = pc.and_(pc.invert(empty), pc.starts_with(t, "{"))
    plain = pc.and_(pc.invert(empty), pc.invert(pc.starts_with(t, "{")))

    # ---------------- plain path (computed full-column, selected later) ----
    ts_plain = _parse_ts19(t)
    lvl_plain = _level_scan(pc.utf8_upper(t), PLAIN_LEVELS)
    pre = _extract(t, r"^(?P<v>[^:]*):", "v")
    pre_r = pc.utf8_rtrim(pc.fill_null(pre, ""), CPP_WS)
    ok1 = pc.and_(pc.is_valid(pre), pc.invert(pc.match_substring(pre_r, " ")))
    bracket = _extract(t, r"\[(?P<v>[^\]]*)\]", "v")
    src_plain = pc.coalesce(
        pc.if_else(ok1, pre_r, pa.scalar(None, pa.string())), bracket,
        pa.scalar("unknown"),
    )
    rem = pc.if_else(
        pc.less_equal(pc.utf8_length(t), 20), t, pc.utf8_slice_codeunits(t, 20, 2**30)
    )
    rem = pc.utf8_trim(rem, CPP_WS)
    msg_plain = _extract(rem, r"^[^ ]* [^ ]* (?P<v>.*)$", "v")
    plain_ok = pc.and_(
        pc.is_valid(ts_plain),
        pc.and_(pc.is_valid(msg_plain),
                pc.greater(pc.utf8_length(pc.fill_null(msg_plain, "")), 0)),
    )

    # ---------------- JSON path --------------------------------------------
    ts_raw = pc.coalesce(
        _json_value(t, "timestamp"), _json_value(t, "time"),
        _json_value(t, "@timestamp"),
    )
    lvl_raw = pc.coalesce(_json_value(t, "level"), _json_value(t, "severity"))
    msg_raw = pc.coalesce(_json_value(t, "message"), _json_value(t, "msg"))
    src_raw = pc.coalesce(
        _json_value(t, "service"), _json_value(t, "component"),
        _json_value(t, "source"),
    )
    missing = pc.or_(
        pc.is_null(ts_raw), pc.or_(pc.is_null(lvl_raw), pc.is_null(msg_raw))
    )
    ts_json = _parse_ts19(pc.fill_null(ts_raw, ""))
    lvl_json = _level_scan(pc.utf8_upper(pc.fill_null(lvl_raw, "")), JSON_LEVELS)
    src_json = pc.coalesce(src_raw, pa.scalar("unknown"))
    json_ok = pc.and_(pc.invert(missing), pc.is_valid(ts_json))

    miss_err = pc.binary_join_element_wise(
        pa.scalar("JSON missing required fields:"),
        _mask_concat(pc.is_null(ts_raw), " timestamp"),
        _mask_concat(pc.is_null(lvl_raw), " level"),
        _mask_concat(pc.is_null(msg_raw), " message"),
        "",
    )
    json_err = pc.if_else(
        missing, miss_err, pa.scalar("Invalid timestamp format")
    )

    # ---------------- stitch ------------------------------------------------
    null_s = pa.scalar(None, pa.string())
    null_ts = pa.scalar(None, pa.timestamp("us"))
    null_i = pa.scalar(None, pa.int32())

    ok = pc.if_else(was_json, json_ok, pc.and_(plain, plain_ok))
    malformed = pc.invert(ok)
    error = pc.if_else(
        empty, pa.scalar("Empty line"),
        pc.if_else(
            was_json, json_err, pa.scalar("No matching pattern")
        ),
    )
    error = pc.if_else(malformed, error, null_s)

    ts_parsed = pc.if_else(
        was_json, ts_json, pc.if_else(plain, ts_plain, null_ts)
    )
    ts_parsed = pc.if_else(ok, ts_parsed, null_ts)
    level = pc.if_else(was_json, lvl_json, lvl_plain)
    level = pc.if_else(ok, level, null_i)
    source = pc.if_else(was_json, src_json, src_plain)
    source = pc.if_else(ok, source, null_s)
    message = pc.if_else(was_json, msg_raw, msg_plain)
    message = pc.if_else(ok, message, null_s)

    return {
        "malformed": pc.cast(malformed, pa.bool_()),
        "error": error,
        "was_json": pc.cast(was_json, pa.bool_()),
        "ts_parsed": ts_parsed,
        "level_ord": level,
        "source": source,
        "message": message,
    }


def parse_stage_arrow(df: DataFrame, text_col: str = "text") -> DataFrame:
    """mapInArrow parse: input columns + parsed columns, no pandas objects."""
    from pyspark.sql.types import StructType

    in_schema = df.schema
    out_schema = StructType(list(in_schema.fields) + list(PARSED_STRUCT.fields))

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols = {name: batch.column(i) for i, name in enumerate(batch.schema.names)}
            parsed = parse_arrays(cols[text_col])
            arrays = list(batch.columns) + [
                parsed[f.name] for f in PARSED_STRUCT.fields
            ]
            names = list(batch.schema.names) + [f.name for f in PARSED_STRUCT.fields]
            yield pa.RecordBatch.from_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                 for a in arrays],
                names=names,
            )

    out = df.filter(F.length(F.col(text_col)) > 0)
    return out.mapInArrow(kernel, schema=out_schema)
