"""S10 config source: the reference's ``key = value`` file format.

Semantics from /root/reference/src/utils/ConfigLoader.cpp:46-113:
- lines; ``#`` or ``;`` starts a comment (full-line or trailing)
- ``key = value`` with whitespace trimmed on both sides
- last assignment wins
- rule grammar (RuleBasedDetector.cpp:360-408):
    rule.<id> = <name> <TYPE> <condition...>
    rule.<id>.enabled = true|false
    rule.<id>.severity = <float 0..1>

Returns a plain dict plus the rules table rows (RULES_SCHEMA shape) so the
pipeline's broadcast rules frame can be built from a file. The reference's
``main`` never actually loads a config file (main.cpp:142-144), so defaults
remain the parity surface; this loader exists for API completeness.
"""

from __future__ import annotations

from dataclasses import replace

from ..config import (
    BurstConfig, IpConfig, PipelineConfig, SpikeConfig, StatisticalConfig,
    TimeWindowConfig,
)


def parse_config_text(text: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].split(";", 1)[0].strip()
        if not line or "=" not in line:
            continue
        key, _, value = line.partition("=")
        out[key.strip()] = value.strip()  # last wins
    return out


def load_config_file(path: str) -> dict[str, str]:
    with open(path) as fh:
        return parse_config_text(fh.read())


def _sev_ord(score: float) -> int:
    # RuleBasedDetector maps rule severity scores onto the 4-level enum
    if score >= 0.95:
        return 3
    if score >= 0.8:
        return 2
    if score >= 0.5:
        return 1
    return 0


def rules_from_config(cfg: dict[str, str]) -> list[tuple]:
    """Extract ``rule.<id> = name TYPE condition`` rows (RULES_SCHEMA order:
    rule_id, name, rule_type, condition, rule_score, severity, enabled)."""
    rules: dict[int, dict] = {}
    for key, value in cfg.items():
        if not key.startswith("rule."):
            continue
        parts = key.split(".")
        if len(parts) == 2 and parts[1].isdigit():
            toks = value.split(None, 2)
            if len(toks) < 3:
                continue
            name, rtype, cond = toks[0], toks[1].upper(), toks[2]
            rules.setdefault(int(parts[1]), {}).update(
                name=name, rule_type=rtype, condition=cond
            )
        elif len(parts) == 3 and parts[1].isdigit():
            rid = int(parts[1])
            if parts[2] == "enabled":
                rules.setdefault(rid, {})["enabled"] = value.lower() == "true"
            elif parts[2] == "severity":
                try:
                    rules.setdefault(rid, {})["score"] = float(value)
                except ValueError:
                    pass
    rows = []
    for rid in sorted(rules):
        r = rules[rid]
        if "name" not in r:
            continue
        score = r.get("score", 0.5)
        rows.append(
            (rid, r["name"], r["rule_type"], r["condition"], score,
             _sev_ord(score), r.get("enabled", True))
        )
    return rows


def pipeline_config_from(cfg: dict[str, str]) -> PipelineConfig:
    """Map the flat key space onto PipelineConfig (detector setter surface,
    e.g. SpikeDetector.cpp:126-148)."""

    def geti(key, default):
        try:
            return int(cfg[key])
        except (KeyError, ValueError):
            return default

    def getf(key, default):
        try:
            return float(cfg[key])
        except (KeyError, ValueError):
            return default

    base = PipelineConfig()
    return replace(
        base,
        spike=SpikeConfig(
            threshold=max(1.1, getf("spike.threshold", base.spike.threshold)),
            short_window_s=geti("spike.short_window_s", base.spike.short_window_s),
            baseline_window_s=geti(
                "spike.baseline_window_s", base.spike.baseline_window_s
            ),
        ),
        statistical=StatisticalConfig(
            z_threshold=max(
                1.0, getf("statistical.z_threshold", base.statistical.z_threshold)
            ),
            rate_window_s=geti(
                "statistical.rate_window_s", base.statistical.rate_window_s
            ),
        ),
        burst=BurstConfig(
            window_s=geti("burst.window_s", base.burst.window_s),
            min_repeats=geti("burst.min_repeats", base.burst.min_repeats),
        ),
        ip=IpConfig(
            max_count_for_rare=geti("ip.max_count_for_rare",
                                    base.ip.max_count_for_rare),
        ),
        timewindow=TimeWindowConfig(
            window_s=geti("timewindow.window_s", base.timewindow.window_s),
            burst_threshold=geti(
                "timewindow.burst_threshold", base.timewindow.burst_threshold
            ),
        ),
    )
