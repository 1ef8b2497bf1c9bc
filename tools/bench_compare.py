"""Round-over-round bench comparison: flag per-query regressions.

Usage:  python tools/bench_compare.py OLD.json NEW.json [threshold]

OLD/NEW are bench detail files with a ``queries: {name: sec}`` map
(bench.py writes BENCH_DETAIL.json each run; commit one per round).
Queries slower than ``threshold``× (default 1.3) their previous time
are flagged; the report goes to stdout and BENCH_COMPARE.md. Exits 1
if any regression is found so CI/driver loops can gate on it.

Timing noise note (SCALING.md): single runs at sf0.1 carry ±1s noise
on shared hardware — treat sub-second absolute deltas as noise even
when the ratio trips the threshold (the report shows both).
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3

    with open(old_path) as f:
        old = json.load(f)
    with open(new_path) as f:
        new = json.load(f)
    old_q, new_q = old.get("queries", {}), new.get("queries", {})

    lines = [
        f"# Bench comparison: {os.path.basename(old_path)} -> {os.path.basename(new_path)}",
        "",
        f"total: {old.get('value')}s -> {new.get('value')}s "
        f"(x{(new.get('value') or 0) / (old.get('value') or 1):.2f})",
        "",
        "| query | old s | new s | ratio | flag |",
        "|---|---|---|---|---|",
    ]
    regressions = []
    for name in sorted(set(old_q) | set(new_q)):
        o, n = old_q.get(name), new_q.get(name)
        if o is None or n is None:
            lines.append(f"| {name} | {o or '-'} | {n or '-'} | - | {'added' if o is None else 'removed'} |")
            continue
        ratio = n / o if o else float("inf")
        flag = ""
        if ratio > threshold and n - o > 0.5:
            flag = f"REGRESSION >{threshold}x"
            regressions.append((name, o, n, ratio))
        elif ratio > threshold:
            flag = "ratio-trip (sub-0.5s delta: noise)"
        lines.append(f"| {name} | {o:.2f} | {n:.2f} | x{ratio:.2f} | {flag} |")

    lines += ["", f"{len(regressions)} regression(s) over {threshold}x (and >0.5s absolute)."]
    for name, o, n, ratio in regressions:
        lines.append(f"- {name}: {o:.2f}s -> {n:.2f}s (x{ratio:.2f})")

    report = "\n".join(lines) + "\n"
    sys.stdout.write(report)
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_COMPARE.md"), "w") as f:
        f.write(report)
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
