"""Trusted pure-Python oracle: a direct per-row transliteration of the
reference C++ semantics (/root/reference), run sequentially per conversation
in (conv_id, turn_idx) order. Slow by design; used only by tests.

Scope mapping: the reference processes ONE log file per run; here each
conversation is one logical file/run, so all detector/analyzer state is
per-conv (this is the engine's specified semantics, per BASELINE.json
north_star "per conv_id ... under stable (conv_id, turn_idx) ordering").

Citations are per function. Timestamps are UTC epoch seconds (the reference's
mktime localtime dependence is pinned to UTC; see SURVEY.md §7 risks).
"""

from __future__ import annotations

import datetime as dt
import math
import re
from collections import deque
from dataclasses import dataclass, field

CPP_WS = " \t\n\v\f\r"
_WS_SET = set(CPP_WS)

# enums (include/core/LogEntry.hpp:25-34, include/core/Anomaly.hpp:28-50)
TRACE, DEBUG, INFO, WARN, ERROR, CRITICAL, UNKNOWN = range(7)
T_FREQ_SPIKE, T_RARE, T_STAT, T_SEQ, T_SILENCE, T_OTHER = range(6)
S_LOW, S_MED, S_HIGH, S_CRIT = range(4)

_IP_RE = re.compile(r"(\b\d{1,3}(?:\.\d{1,3}){3}\b)")
_HEX_RE = re.compile(r"[0-9a-fA-F]{8,}")
_NUM_RE = re.compile(r"\b\d+\b")


# --------------------------------------------------------------------------
# parser (src/input/LogParser.cpp)
# --------------------------------------------------------------------------

def _parse_ts19(s: str) -> int | None:
    """TimeUtils.cpp:73-112: six digit fields at fixed offsets of the first
    19 chars; separator bytes unchecked; mktime -> we use UTC."""
    if len(s) < 19:
        return None
    s = s[:19]
    fields = [s[0:4], s[5:7], s[8:10], s[11:13], s[14:16], s[17:19]]
    for f in fields:
        if not f.isascii() or not f.isdigit():
            return None
    y, mo, d, h, mi, sec = (int(f) for f in fields)
    try:
        t = dt.datetime(y, mo, d, h, mi, sec, tzinfo=dt.timezone.utc)
    except ValueError:
        return None  # documented divergence: mktime would normalize
    return int(t.timestamp())


def _extract_json_raw(json: str, key: str) -> str | None:
    """LogParser.cpp:238-281 hand scanner."""
    needle = f'"{key}"'
    pos = json.find(needle)
    if pos < 0:
        return None
    pos = json.find(":", pos + len(needle))
    if pos < 0:
        return None
    pos += 1
    n = len(json)
    while pos < n and json[pos] in _WS_SET:
        pos += 1
    if pos >= n:
        return None
    if json[pos] == '"':
        pos += 1
        out = []
        while pos < n:
            c = json[pos]
            pos += 1
            if c == "\\":
                if pos < n:
                    out.append(json[pos])
                    pos += 1
                continue
            if c == '"':
                break
            out.append(c)
        return "".join(out)
    end = pos
    while end < n and json[end] not in ",}":
        end += 1
    return json[pos:end].strip(CPP_WS)


_PLAIN_LEVELS = [("TRACE", 0), ("DEBUG", 1), ("INFO", 2), ("WARN", 3),
                 ("WARNING", 3), ("ERROR", 4), ("FATAL", 5), ("CRITICAL", 5)]
_JSON_LEVELS = [("TRACE", 0), ("DEBUG", 1), ("INFO", 2), ("WARN", 3),
                ("ERROR", 4), ("CRIT", 5), ("FATAL", 5)]


def parse_line(raw: str):
    """LogParser::parseLineDetailed (LogParser.cpp:57-98).

    Returns (entry | None, error | None); entry = dict(ts, level, source,
    message, was_json)."""
    t = raw.strip(CPP_WS)
    if not t:
        return None, "Empty line"

    if t[0] == "{":
        ts_raw = _extract_json_raw(t, "timestamp")
        if ts_raw is None:
            ts_raw = _extract_json_raw(t, "time")
        if ts_raw is None:
            ts_raw = _extract_json_raw(t, "@timestamp")
        lvl_raw = _extract_json_raw(t, "level")
        if lvl_raw is None:
            lvl_raw = _extract_json_raw(t, "severity")
        msg_raw = _extract_json_raw(t, "message")
        if msg_raw is None:
            msg_raw = _extract_json_raw(t, "msg")
        src_raw = _extract_json_raw(t, "service")
        if src_raw is None:
            src_raw = _extract_json_raw(t, "component")
        if src_raw is None:
            src_raw = _extract_json_raw(t, "source")

        if ts_raw is None or lvl_raw is None or msg_raw is None:
            err = ("JSON missing required fields:"
                   + ("" if ts_raw is not None else " timestamp")
                   + ("" if lvl_raw is not None else " level")
                   + ("" if msg_raw is not None else " message"))
            return None, err

        ts = _parse_ts19(ts_raw)
        if ts is None:
            return None, "Invalid timestamp format"

        up = lvl_raw.upper()
        level = UNKNOWN
        for tok, ordv in _JSON_LEVELS:
            if tok in up:
                level = ordv
                break
        source = src_raw if src_raw is not None else "unknown"
        return dict(ts=ts, level=level, source=source, message=msg_raw,
                    was_json=True), None

    # plain heuristic path (LogParser.cpp:125-147)
    ts = _parse_ts19(t)
    if ts is None:
        return None, "No matching pattern"

    up = t.upper()
    level = UNKNOWN
    for tok, ordv in _PLAIN_LEVELS:
        if tok in up:
            level = ordv
            break

    # extractSource (LogParser.cpp:340-366)
    source = None
    colon = t.find(":")
    if colon >= 0:
        pre = t[:colon].rstrip(CPP_WS)
        if " " not in pre:
            source = pre
    if source is None:
        b0 = t.find("[")
        if b0 >= 0:
            b1 = t.find("]", b0)
            if b1 >= 0:
                source = t[b0 + 1 : b1]
    if source is None:
        source = "unknown"  # LogParser.cpp:144

    # extractMessage (LogParser.cpp:368-399)
    rem = t[20:] if len(t) > 20 else t
    rem = rem.strip(CPP_WS)
    words = rem.split(" ")
    message = " ".join(words[2:]) if len(words) > 2 else ""
    if not message:
        return None, "No matching pattern"

    return dict(ts=ts, level=level, source=source, message=message,
                was_json=False), None


# --------------------------------------------------------------------------
# helpers shared by detectors
# --------------------------------------------------------------------------

def normalize_message(msg: str) -> str:
    """BurstPatternDetector::normalizeMessage (BurstPatternDetector.cpp:18-56):
    lowercase -> hex{8,} -> <id> -> \\b\\d+\\b -> <n> -> collapse ws -> trim."""
    s = msg.lower()
    s = _HEX_RE.sub("<id>", s)
    s = _NUM_RE.sub("<n>", s)
    out = []
    in_ws = False
    for c in s:
        if c in _WS_SET:
            if not in_ws:
                out.append(" ")
            in_ws = True
        else:
            out.append(c)
            in_ws = False
    return "".join(out).strip(" ")


def hash_message(message: str, k: int = 3) -> str:
    """FrequencyAnalyzer::hashMessage (FrequencyAnalyzer.cpp:164-182):
    first k whitespace-tokens uppercased, space-joined; empty -> EMPTY."""
    words = message.split()[:k]
    if not words:
        return "EMPTY"
    return " ".join(w.upper() for w in words)


def event_signature(source: str, level: int, message: str) -> str:
    """PatternAnalyzer::createSignature + sequence element rendering
    (PatternAnalyzer.cpp:176-206): source:level:first-3-space-tokens[:20]."""
    words = [w for w in (t.strip(CPP_WS) for t in message.split(" ")) if w]
    prefix = " ".join(words[:3])
    return f"{source}:{level}:{prefix[:20]}"


def fmt_hms(ts: int) -> str:
    return dt.datetime.fromtimestamp(ts, dt.timezone.utc).strftime("%H:%M:%S")


# --------------------------------------------------------------------------
# per-conversation simulation (src/main.cpp:194-409)
# --------------------------------------------------------------------------

@dataclass
class ConvResult:
    parsed: list = field(default_factory=list)       # parsed entry rows
    anomalies: list = field(default_factory=list)    # anomaly rows
    minutes: dict = field(default_factory=dict)      # bucket -> counters
    level_counts: dict = field(default_factory=dict)
    source_stats: dict = field(default_factory=dict)
    parsed_count: int = 0
    malformed_count: int = 0
    seq_counts: dict = field(default_factory=dict)   # A10 n-gram counts
    msg_hash_counts: dict = field(default_factory=dict)  # A5 message hashes


def _minute(r: ConvResult, bucket):
    m = r.minutes.setdefault(
        bucket,
        {k: 0 for k in ("total", "trace", "debug", "info", "warn", "error",
                        "critical", "unknown", "anomalies", "malformed")},
    )
    return m


_LEVEL_KEY = ["trace", "debug", "info", "warn", "error", "critical", "unknown"]


def run_conv(conv_id: str, rows: list[tuple[int, str]], cfg=None) -> ConvResult:
    """Simulate the reference main loop over one conversation.

    rows: [(turn_idx, text)] already sorted by turn_idx.

    cfg: optional dict of overrides for the reference's compiled-in constants.
    Supported: ``burst_min_repeats`` (default 20; the reference's trim-on-emit
    keeps min_repeats//2 events, i.e. 10 at the default — the generalization
    matches BurstConfig semantics in the engine).
    """
    cfg = cfg or {}
    burst_min = int(cfg.get("burst_min_repeats", 20))
    burst_keep = max(1, burst_min // 2)
    r = ConvResult()

    # W1 spike state per source (SpikeDetector.cpp:24-85)
    spike: dict[str, tuple[deque, deque]] = {}
    # W2 statistical state per source (StatisticalDetector.cpp:28-77,154-222)
    stat_rate: dict[str, deque] = {}
    stat_welford: dict[str, list] = {}  # [count, mean, m2]
    # W3 burst state per signature key (BurstPatternDetector.cpp:75-116)
    burst: dict[str, deque] = {}
    # W4 ip counts (IpFrequencyDetector.cpp:26-45)
    ip_counts: dict[str, int] = {}
    # A5-A8 frequency analyzer
    f_src: dict[str, int] = {}
    f_hash: dict[str, int] = {}
    f_hist: dict[str, list] = {}
    f_avg: dict[str, float] = {}
    # A9-A11 pattern analyzer
    recent: deque = deque()
    seq_counts: dict[str, int] = {}
    # W5 time window analyzer
    tw_init = False
    tw_start = tw_end = 0
    tw_events: list = []  # (ts, level)
    tw_hist: deque = deque()  # (start, end, total, errors)

    last_bucket = None
    min_ts = max_ts = None

    for turn_idx, text in rows:
        if text == "":
            continue  # main.cpp:196-197: empty lines skipped entirely

        entry, err = parse_line(text)
        if entry is None:
            r.malformed_count += 1
            _minute(r, last_bucket)["malformed"] += 1
            r.anomalies.append(dict(
                conv_id=conv_id, turn_idx=turn_idx, detector="parser",
                anomaly_type=T_OTHER, severity=S_LOW,
                window_start=None, window_end=None, score=1.0,
                source="parser",
                description="Malformed log line: " + (err or "parse failure"),
            ))
            r.parsed.append(dict(
                conv_id=conv_id, turn_idx=turn_idx, malformed=True,
                error=err, was_json=text.strip(CPP_WS).startswith("{"),
                ts=None, level=None, source=None, message=None))
            continue

        r.parsed_count += 1
        ts, level, source, message = (entry["ts"], entry["level"],
                                      entry["source"], entry["message"])
        r.parsed.append(dict(
            conv_id=conv_id, turn_idx=turn_idx, malformed=False, error=None,
            was_json=entry["was_json"], ts=ts, level=level, source=source,
            message=message))

        bucket = (ts // 60) * 60
        last_bucket = bucket
        m = _minute(r, bucket)
        m["total"] += 1
        m[_LEVEL_KEY[level]] += 1

        min_ts = ts if min_ts is None else min(min_ts, ts)
        max_ts = ts if max_ts is None else max(max_ts, ts)

        r.level_counts[level] = r.level_counts.get(level, 0) + 1
        ss = r.source_stats.setdefault(source, [0, 0, 0])
        ss[0] += 1
        if level in (ERROR, CRITICAL):
            ss[1] += 1
        elif level == WARN:
            ss[2] += 1

        # ---- offline analyzers accumulate (main.cpp:274-276) ----
        # frequency
        f_src[source] = f_src.get(source, 0) + 1
        h = hash_message(message)
        f_hash[h] = f_hash.get(h, 0) + 1
        hist = f_hist.setdefault(source, [])
        hist.append(f_src[source])
        if len(hist) > 10:
            hist.pop(0)
        f_avg[source] = sum(hist) / len(hist)

        # time window (TimeWindowAnalyzer.cpp:144-190)
        if not tw_init:
            tw_start, tw_end, tw_init = ts, ts + 60, True
        while ts >= tw_end:
            tw_hist.append((tw_start, tw_end,
                            len(tw_events),
                            sum(1 for _, lv in tw_events if lv in (ERROR, CRITICAL))))
            if len(tw_hist) > 12:
                tw_hist.popleft()
            tw_start, tw_end = tw_end, tw_end + 60
            tw_events = []
        if ts >= tw_start:
            tw_events.append((ts, level))

        # pattern (PatternAnalyzer.cpp:42-72)
        recent.append(event_signature(source, level, message))
        if len(recent) > 10:
            recent.popleft()
        rl = list(recent)
        for ln in range(2, min(10, len(rl)) + 1):
            for start in range(0, len(rl) - ln + 1):
                sig = "->".join(rl[start : start + ln])
                seq_counts[sig] = seq_counts.get(sig, 0) + 1

        # ---- online detectors (main.cpp:283-360) ----
        fired = 0

        # W1 spike — skipped when source empty (SpikeDetector.cpp:32-37)
        if source != "":
            dq_s, dq_b = spike.setdefault(source, (deque(), deque()))
            dq_s.append(ts)
            dq_b.append(ts)
            while dq_s and ts - dq_s[0] > 60:
                dq_s.popleft()
            while dq_b and ts - dq_b[0] > 600:
                dq_b.popleft()
            cur, base = len(dq_s), len(dq_b)
            ratio = (cur / 60.0) / (base / 600.0) if base > 0 else 1.0
            if ratio > 3.0 and cur >= 5 and base >= 10:
                sev = min(1.0, (ratio - 1.0) / 2.0)
                sev_ord = S_CRIT if sev >= 0.9 else (S_HIGH if sev >= 0.6 else S_MED)
                r.anomalies.append(dict(
                    conv_id=conv_id, turn_idx=turn_idx, detector="spike",
                    anomaly_type=T_FREQ_SPIKE, severity=sev_ord,
                    window_start=ts - 60, window_end=ts, score=ratio,
                    source=(source if source else None),
                    description=(f"Spike detected: {source} ({cur} events in "
                                 f"60s, {ratio:.1f}x baseline, ROC=0.00"),
                ))
                fired += 1

        # W2 statistical
        dq = stat_rate.setdefault(source, deque())
        dq.append(ts)
        while dq and ts - dq[0] > 600:
            dq.popleft()
        if len(dq) < 2:
            rate = len(dq) * 60.0 / 600.0
        else:
            span = max(1.0, float(ts - dq[0]))
            rate = len(dq) / max(1e-6, span / 60.0)
        w = stat_welford.setdefault(source, [0, 0.0, 0.0])
        w[0] += 1
        delta = rate - w[1]
        w[1] += delta / w[0]
        w[2] += delta * (rate - w[1])
        var = w[2] / (w[0] - 1) if w[0] >= 2 else 0.0
        sd = math.sqrt(var) if var > 0 else 0.0
        z = (rate - w[1]) / sd if (w[0] >= 10 and sd != 0.0) else 0.0
        if abs(z) > 3.0:
            sev = min(1.0, abs(z) / 3.0)
            sev_ord = S_HIGH if sev >= 0.9 else (S_MED if sev >= 0.6 else S_LOW)
            r.anomalies.append(dict(
                conv_id=conv_id, turn_idx=turn_idx, detector="statistical",
                anomaly_type=T_STAT, severity=sev_ord,
                window_start=ts, window_end=ts, score=z, source=source,
                description=(f"Statistical anomaly detected (Z={z:.2f}): "
                             f"{source} event rate deviation {abs(z):.2f}"
                             f"σ from mean μ={w[1]:.1f} σ={sd:.1f}"),
            ))
            fired += 1

        # W3 burst
        key = f"{source}|{level}|{normalize_message(message)}"
        bq = burst.setdefault(key, deque())
        bq.append(ts)
        while bq and ts - bq[0] > 60:
            bq.popleft()
        c = len(bq)
        if c >= burst_min:
            r.anomalies.append(dict(
                conv_id=conv_id, turn_idx=turn_idx, detector="burst",
                anomaly_type=T_SEQ, severity=S_HIGH,
                window_start=bq[0], window_end=bq[-1], score=float(c),
                source=source,
                description=f"Burst repetition detected: {c} repeats within 60s",
            ))
            if len(bq) > burst_min:
                while len(bq) > burst_keep:
                    bq.popleft()
            fired += 1

        # W4 rare IP
        mobj = _IP_RE.search(message)
        if mobj:
            ip = mobj.group(1)
            ip_counts[ip] = ip_counts.get(ip, 0) + 1
            nc = ip_counts[ip]
            if nc <= 5:
                r.anomalies.append(dict(
                    conv_id=conv_id, turn_idx=turn_idx, detector="rare_ip",
                    anomaly_type=T_RARE, severity=S_LOW,
                    window_start=ts, window_end=ts, score=1.0, source=source,
                    description=f"Rare IP observed (count={nc}): {ip}",
                ))
                fired += 1

        m["anomalies"] += fired

    # ---- offline phase (main.cpp:367-409) ----
    lo = min_ts if min_ts is not None else None
    hi = max_ts if max_ts is not None else None

    # frequency anomalies (FrequencyAnalyzer.cpp:79-130)
    for source, count in f_src.items():
        avg = f_avg.get(source, 0.0)
        if avg > 0.0 and count > avg * 3.0:
            r.anomalies.append(dict(
                conv_id=conv_id, turn_idx=None, detector="frequency",
                anomaly_type=T_FREQ_SPIKE, severity=S_MED,
                window_start=lo, window_end=hi, score=1.0, source=None,
                description=(f"Source '{source}' spike: {count} events "
                             f"({count / avg:.6g}x average)"),
            ))
    for h, count in f_hash.items():
        if count < 2:
            r.anomalies.append(dict(
                conv_id=conv_id, turn_idx=None, detector="frequency",
                anomaly_type=T_FREQ_SPIKE, severity=S_MED,
                window_start=lo, window_end=hi, score=1.0, source=None,
                description=(f"Rare message pattern '{h}': only {count} "
                             f"occurrences"),
            ))

    # pattern anomalies (PatternAnalyzer.cpp:119-145)
    for sig, count in seq_counts.items():
        if count == 1:
            if "ERROR" in sig or "CRITICAL" in sig or "FATAL" in sig:
                r.anomalies.append(dict(
                    conv_id=conv_id, turn_idx=None, detector="pattern",
                    anomaly_type=T_SEQ, severity=S_MED,
                    window_start=lo, window_end=hi, score=1.0, source=None,
                    description=f"Novel high-severity pattern: {sig[:50]}...",
                ))
            r.anomalies.append(dict(
                conv_id=conv_id, turn_idx=None, detector="pattern",
                anomaly_type=T_SEQ, severity=S_MED,
                window_start=lo, window_end=hi, score=1.0, source=None,
                description=f"New sequence pattern: {sig}",
            ))

    # time-window anomalies (TimeWindowAnalyzer.cpp:39-74,230-263)
    def tw_check(start, end, total, errors):
        out = []
        rate = errors / total if total > 0 else 0.0
        if rate > 0.5:
            out.append((min(1.0, rate * 2.0),
                        f"Error spike: {rate * 100:.1f}% errors in "
                        f"[{fmt_hms(start)}-{fmt_hms(end)}]", start, end))
        if total > 100:
            out.append((min(1.0, total / 100.0),
                        f"Event burst: {total} events in 60s window",
                        start, end))
        return out

    r.seq_counts = seq_counts
    r.msg_hash_counts = f_hash

    tw_all = []
    if tw_init:
        cur_errors = sum(1 for _, lv in tw_events if lv in (ERROR, CRITICAL))
        tw_all.extend(tw_check(tw_start, tw_end, len(tw_events), cur_errors))
        for (s0, e0, tot, errs) in tw_hist:
            tw_all.extend(tw_check(s0, e0, tot, errs))
    for score, desc, s0, e0 in tw_all:
        sev_ord = S_HIGH if score >= 0.9 else (S_MED if score >= 0.6 else S_LOW)
        r.anomalies.append(dict(
            conv_id=conv_id, turn_idx=None, detector="timewindow",
            anomaly_type=(T_SILENCE if "Silence" in desc else T_FREQ_SPIKE),
            severity=sev_ord, window_start=s0, window_end=e0, score=score,
            source=None, description=desc,
        ))

    return r


def run_table(pdf, cfg=None) -> dict:
    """Run the oracle over a transcripts pandas DataFrame. Returns dict of
    pandas DataFrames: parsed, anomalies, minutes, level_stats, source_stats."""
    import pandas as pd

    parsed, anomalies, minutes = [], [], {}
    level_counts: dict[int, int] = {}
    source_stats: dict[str, list] = {}

    for conv_id, g in pdf.sort_values(["conv_id", "turn_idx"]).groupby(
            "conv_id", sort=True):
        rows = list(zip(g["turn_idx"].tolist(), g["text"].tolist()))
        res = run_conv(conv_id, rows, cfg)
        parsed.extend(res.parsed)
        anomalies.extend(res.anomalies)
        for b, m in res.minutes.items():
            agg = minutes.setdefault(
                b, {k: 0 for k in m})
            for k, v in m.items():
                agg[k] += v
        for lv, c in res.level_counts.items():
            level_counts[lv] = level_counts.get(lv, 0) + c
        for src, (tot, err, warn) in res.source_stats.items():
            agg2 = source_stats.setdefault(src, [0, 0, 0])
            agg2[0] += tot
            agg2[1] += err
            agg2[2] += warn

    minutes_rows = [dict(minute=b, **m) for b, m in minutes.items()]
    level_rows = [dict(level_ord=lv, n=c) for lv, c in level_counts.items()]
    source_rows = [dict(source=s, total_events=v[0], error_events=v[1],
                        warning_events=v[2]) for s, v in source_stats.items()]
    return dict(
        parsed=pd.DataFrame(parsed),
        anomalies=pd.DataFrame(anomalies),
        minutes=pd.DataFrame(minutes_rows),
        level_stats=pd.DataFrame(level_rows),
        source_stats=pd.DataFrame(source_rows),
    )
