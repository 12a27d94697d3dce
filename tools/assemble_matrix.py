"""Assemble a scaling-matrix artifact from per-trial JSON lines.

bench/scaling.py normally orchestrates trials and prints the matrix report
itself; when a matrix is resumed across sessions (trials appended to a log
by re-invoking ``scaling.py --run N``), this tool rebuilds the identical
report shape from the accumulated trial lines so the artifact of record is
byte-compatible with the orchestrator's output.

Usage: python tools/assemble_matrix.py <trials.log> [lo hi] > artifact.json
"""

from __future__ import annotations

import json
import sys


def median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def main() -> None:
    path = sys.argv[1]
    lo, hi = (int(sys.argv[2]), int(sys.argv[3])) if len(sys.argv) > 3 else (2, 8)
    trials = [json.loads(l) for l in open(path) if l.strip()]
    by_cpu: dict[int, list[dict]] = {}
    for t in trials:
        by_cpu.setdefault(t["cpus"], []).append(t)
    results = {c: min(ts, key=lambda t: t["wall_sec"]) for c, ts in by_cpu.items()}
    all_tps = {c: [t["turns_per_sec"] for t in ts] for c, ts in by_cpu.items()}
    eff_best = (results[hi]["turns_per_sec"] / results[lo]["turns_per_sec"]) / (hi / lo)
    eff_med = (median(all_tps[hi]) / median(all_tps[lo])) / (hi / lo)
    report = {
        "metric": f"scaling_efficiency_local{lo}_to_local{hi}",
        "rows": results[hi]["rows"],
        **{f"local{c}": results[c] for c in sorted(results)},
        "trials_turns_per_sec": {str(c): all_tps[c] for c in sorted(all_tps)},
        "efficiency_best": round(eff_best, 3),
        "efficiency_median": round(eff_med, 3),
        "efficiency": round(eff_med, 3),
        "pass_0.8": eff_med >= 0.8,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
