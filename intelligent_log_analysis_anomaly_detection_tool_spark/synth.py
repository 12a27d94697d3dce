"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Each conversation is a pure function of ``(seed, conv_index, n_convs)``: an
independent numpy PCG64 stream keyed by (seed, conv) generates the whole
conversation vectorized. Generation therefore parallelizes embarrassingly —
``synth_spark`` fans conv indices out over executors with ``mapInPandas`` and
each task materializes only its own conversations. Any slice of the table is
reproducible independently, which is what lets the same generator back both
the 5k-row unit fixtures and the multi-million-row scaling bench.

``text`` is rendered in the reference's three line shapes plus empties
(mirroring /root/reference/data-set/mixed_format_log_2_3MB.log): plain
``YYYY-MM-DD HH:MM:SS [LEVEL] service - msg``, JSON with occasional alias
keys, malformed garbage, and empty lines. Scenario segments are injected per
conversation so every detector (W1-W5, A5-A11) fires somewhere.
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator

import numpy as np
import pandas as pd

EPOCH_START = int(_dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc).timestamp())

SERVICES = ["auth-service", "db-service", "payment-service", "api-gateway", "cache-service"]
LEVELS = ["TRACE", "DEBUG", "INFO", "WARN", "ERROR", "CRITICAL"]
# Weighted towards INFO like real logs.
LEVEL_W = np.array([0.05, 0.15, 0.45, 0.15, 0.15, 0.05])
ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "code_exec", "browser", "retrieval", "none"]

MALFORMED_LINES = [
    "?????",
    "null null null",
    "%%%%%%%@@@@@@@#####",
    "not a log line at all",
    "2025-1-1 short ts line",
    '{"timestamp": "2025-01-01T00:00:00", "message": "no level here"}',
    '{"level": "INFO", "message": "no timestamp"}',
    '{broken json',
    "   ",
]

TEMPLATES = [
    "User login successful",
    "Retrying request attempt {n}",
    "Database timeout occurred after {n} ms",
    "Login failed due to invalid password",
    "Connection closed unexpectedly",
    "ERR-{code} request failed",
    "Request from {ip} accepted",
    "Session {hex} refreshed",
    "Cache miss for key {n}",
    "Payment processed amount {n}",
]


def conv_id_of(c: int) -> str:
    return f"conv-{c:06d}"


def _base_length(seed: int, c: int) -> int:
    rng = np.random.default_rng((seed * 1_000_003 + c) & 0x7FFFFFFF)
    # zipf-ish: many short convs, few long ones, 3..2000
    return int(np.clip(3 + rng.pareto(1.2) * 20, 3, 2000))


def conv_length(seed: int, c: int, n_convs: int) -> int:
    """Length of conversation ``c``; conv 0 is the hot conv with ~10% of rows."""
    if c != 0:
        return _base_length(seed, c)
    total_others = sum(_base_length(seed, i) for i in range(1, n_convs))
    return max(30, int(round(total_others / 9.0)))


def _render_message(rng: np.random.Generator, t_idx: int) -> str:
    tpl = TEMPLATES[int(rng.integers(0, len(TEMPLATES)))]
    return tpl.format(
        n=int(rng.integers(0, 100000)),
        code=int(rng.integers(100, 600)),
        ip=f"10.{rng.integers(0, 4)}.{rng.integers(0, 8)}.{rng.integers(1, 250)}",
        hex=format(int(rng.integers(0, 2**63)), "016x"),
    )


def _plain(ts: int, level: str, service: str, msg: str) -> str:
    t = _dt.datetime.fromtimestamp(ts, _dt.timezone.utc)
    return f"{t:%Y-%m-%d %H:%M:%S} [{level}] {service} - {msg}"


def _json_line(rng: np.random.Generator, ts: int, level: str, service: str, msg: str) -> str:
    t = _dt.datetime.fromtimestamp(ts, _dt.timezone.utc)
    ts_key = ["timestamp", "time", "@timestamp"][int(rng.integers(0, 3))]
    lvl_key = ["level", "severity"][int(rng.integers(0, 2))]
    msg_key = ["message", "msg"][int(rng.integers(0, 2))]
    src_key = ["service", "component", "source"][int(rng.integers(0, 3))]
    iso = f"{t:%Y-%m-%dT%H:%M:%S}"
    return (
        f'{{"{ts_key}": "{iso}", "{lvl_key}": "{level}", '
        f'"{src_key}": "{service}", "{msg_key}": "{msg}", '
        f'"request_id": {int(rng.integers(0, 10**6))}}}'
    )


def synth_conv_pdf(seed: int, c: int, n_convs: int) -> pd.DataFrame:
    """Generate one full conversation as a pandas DataFrame (pure function)."""
    length = conv_length(seed, c, n_convs)
    rng = np.random.default_rng((seed * 7_777_777 + c * 13 + 1) & 0x7FFFFFFF)
    scenario = c % 10 if c != 0 else 0

    # --- timestamps: cumulative gaps 0..30s, scenario densification below ---
    gaps = rng.integers(0, 31, size=length).astype(np.int64)
    gaps[0] = 0

    # scenario segment: a contiguous run in the middle of the conv
    seg_len = min(length, 120)
    seg0 = max(1, (length - seg_len) // 2)
    seg1 = min(length, seg0 + seg_len)  # exclusive

    if scenario in (1, 2, 3, 5, 6) or c == 0:
        # dense runs so 60s windows fill up (burst/spike/zscore/error/heavy)
        gaps[seg0:seg1] = rng.integers(0, 2, size=seg1 - seg0)
    if scenario == 7 and length > 10:
        gaps[length // 2] = 400  # silence gap > 300s

    start = EPOCH_START + (c * 7919) % (86400 * 30)
    ts = start + np.cumsum(gaps)

    # --- base content ---
    role = np.array(ROLES)[rng.integers(0, len(ROLES), size=length)]
    tool = np.array(TOOLS)[rng.integers(0, len(TOOLS), size=length)]
    level = np.array(LEVELS)[rng.choice(len(LEVELS), size=length, p=LEVEL_W)]
    service = np.array(SERVICES)[rng.integers(0, len(SERVICES), size=length)]
    # shapes: 0=plain 1=json 2=malformed 3=empty
    shape = rng.choice(4, size=length, p=[0.45, 0.35, 0.15, 0.05])

    msgs = [_render_message(rng, i) for i in range(length)]

    # --- scenario overrides (force plain shape inside the segment) ---
    if scenario == 1 or c == 0:  # burst: identical normalized message, same svc+level
        shape[seg0:seg1] = 0
        level[seg0:seg1] = "WARN"
        service[seg0:seg1] = "cache-service"
        for i in range(seg0, seg1):
            msgs[i] = f"Retrying request attempt {int(rng.integers(0, 99))}"
    elif scenario == 2:  # spike: one service dominating a dense run after sparse baseline
        shape[seg0:seg1] = 0
        service[seg0:seg1] = "api-gateway"
    elif scenario == 3:  # zscore: steady rate then jump (dense segment)
        shape[seg0:seg1] = 0
        service[seg0:seg1] = "db-service"
    elif scenario == 4 and length >= 12:  # rare IPs + one hot IP
        shape[seg0 : min(seg1, seg0 + 12)] = 0
        for k, i in enumerate(range(seg0, min(seg1, seg0 + 12))):
            ip = "192.168.1.7" if k % 2 == 0 else f"172.16.{k}.{k + 1}"
            msgs[i] = f"Request from {ip} accepted"
    elif scenario == 5:  # error-rate window > 50%
        shape[seg0:seg1] = 0
        level[seg0:seg1] = np.where(
            rng.random(seg1 - seg0) < 0.8, "ERROR", "CRITICAL"
        )
    elif scenario == 6:  # heavy window > 100 events
        shape[seg0:seg1] = 0

    # --- render text ---
    texts: list[str] = []
    for i in range(length):
        sh = shape[i]
        if sh == 0:
            texts.append(_plain(int(ts[i]), level[i], service[i], msgs[i]))
        elif sh == 1:
            texts.append(_json_line(rng, int(ts[i]), level[i], service[i], msgs[i]))
        elif sh == 2:
            texts.append(MALFORMED_LINES[int(rng.integers(0, len(MALFORMED_LINES)))])
        else:
            texts.append("")

    return pd.DataFrame(
        {
            "conv_id": conv_id_of(c),
            "turn_idx": np.arange(length, dtype=np.int32),
            "role": role,
            "text": texts,
            "tool": tool,
            "ts": pd.to_datetime(ts, unit="s"),
        }
    )


def synth_local(seed: int, n_convs: int) -> pd.DataFrame:
    """Driver-side generation (tests / oracle). Sorted by (conv_id, turn_idx)."""
    parts = [synth_conv_pdf(seed, c, n_convs) for c in range(n_convs)]
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values(["conv_id", "turn_idx"], ignore_index=True)


def synth_spark(spark, seed: int, n_convs: int, partitions: int | None = None,
                uniform: bool = False):
    """Distributed generation: conv indices -> mapInPandas -> transcript rows.

    Scales to any size: each task generates only its conv range; no driver
    materialization, no shuffle. At 10^12 turns the same shape works — the
    conv-index range is the only driver-side state.

    ``uniform=True`` adds a round-robin repartition so the output layout has
    no conversation skew (one hot conversation otherwise lands in a single
    unsplittable parquet row group and serializes every downstream per-row
    stage that reads it — measured as the scaling bottleneck of the parse
    stage). A real ingest table is interleaved by arrival time the same way.
    """
    from .schema import TRANSCRIPTS_SCHEMA

    if partitions is None:
        partitions = max(32, spark.sparkContext.defaultParallelism * 2)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for c in pdf["id"].tolist():
                yield synth_conv_pdf(seed, int(c), n_convs)

    convs = spark.range(0, n_convs, 1, partitions)
    out = convs.mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)
    return out.repartition(partitions) if uniform else out
