"""Compare two BENCH_r*.json files on their COMMON query set — the
same analysis the round-3/4 drift investigations did by hand: common
total, per-query deltas, and queries regressing past a threshold.

Usage: python tools/bench_compare.py BENCH_r04.json BENCH_r05.json [pct]
"""

from __future__ import annotations

import json
import re
import sys


def _queries(path: str) -> dict[str, float]:
    raw = open(path).read()
    try:
        d = json.loads(raw)
        if "queries" in d:  # bench.py's own output line
            return d["queries"]
        if "parsed" in d and d["parsed"]:  # the driver's BENCH_r*.json wrapper
            return d["parsed"]["queries"]
    except json.JSONDecodeError:
        pass
    # raw bench stdout with a stderr fragment — last line that parses
    for line in reversed(raw.strip().splitlines()):
        m = re.search(r"\{.*\}", line)
        if m:
            try:
                return json.loads(m.group(0))["queries"]
            except (json.JSONDecodeError, KeyError):
                continue
    raise SystemExit(f"no bench JSON found in {path}")


def main() -> None:
    a, b = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qa, qb = _queries(a), _queries(b)
    common = sorted(set(qa) & set(qb))
    ta, tb = sum(qa[q] for q in common), sum(qb[q] for q in common)
    print(f"common queries: {len(common)}")
    print(f"{a}: {ta:.2f}s   {b}: {tb:.2f}s   delta {100*(tb-ta)/ta:+.1f}%")
    regressions = []
    for q in common:
        d = 100 * (qb[q] - qa[q]) / qa[q] if qa[q] else 0.0
        if d > threshold and qb[q] - qa[q] > 0.1:  # pct AND absolute floor
            regressions.append((q, qa[q], qb[q], d))
    if regressions:
        print(f"\nregressions >{threshold:.0f}% (and >0.1s absolute):")
        for q, x, y, d in sorted(regressions, key=lambda r: -r[3]):
            print(f"  {q:40s} {x:6.2f}s -> {y:6.2f}s  {d:+.0f}%")
    else:
        print(f"no regressions >{threshold:.0f}%")
    improvements = sorted(
        ((q, qa[q], qb[q]) for q in common if qa[q] - qb[q] > 0.3),
        key=lambda r: r[1] - r[2],
    )
    if improvements:
        print("\nimprovements >0.3s:")
        for q, x, y in improvements:
            print(f"  {q:40s} {x:6.2f}s -> {y:6.2f}s")


if __name__ == "__main__":
    main()
