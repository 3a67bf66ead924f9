"""Per-query bench trend across rounds.

Reads every ``BENCH_r{N}.json`` the driver recorded (plus optional
extra bench-output files passed as arguments), and prints one row per
query with its time in each round and the delta of the latest round
vs the previous one. The point is to catch a per-query regression
that the headline total hides — one query doubling while another
halves nets out invisible.

Usage:
    python tools/bench_trend.py [extra_bench.json ...]

Exit status is always 0; this is a reporting tool, not a gate.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def _load(path: str) -> dict | None:
    try:
        with open(path) as f:
            text = f.read().strip()
    except OSError:
        return None
    # Driver BENCH_r{N}.json files are pretty-printed wrappers with the
    # bench line under "parsed" (null if that round's bench crashed).
    try:
        data = json.loads(text)
        if isinstance(data, dict):
            if "parsed" in data:
                return data["parsed"] or None
            return data
    except json.JSONDecodeError:
        pass
    # raw bench stdout: ONE JSON line, tolerate surrounding noise
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                return None
    return None


def main(argv: list[str]) -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds: list[tuple[str, dict]] = []
    for path in sorted(
        glob.glob(os.path.join(root, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"BENCH_r(\d+)", p).group(1)),
    ):
        data = _load(path)
        if data:
            rounds.append((re.search(r"(r\d+)", os.path.basename(path)).group(1), data))
    for path in argv:
        data = _load(path)
        if data:
            rounds.append((os.path.basename(path), data))

    if not rounds:
        print("no BENCH_r*.json found (driver writes them per round)")
        return 0

    names: list[str] = []
    for _, data in rounds:
        for q in data.get("queries", {}):
            if q not in names:
                names.append(q)

    labels = [label for label, _ in rounds]
    w = max(len(n) for n in names + ["TOTAL"]) + 2
    print("query".ljust(w) + "".join(lab.rjust(10) for lab in labels) + "   Δ last")
    for name in names:
        cells, vals = [], []
        for _, data in rounds:
            v = data.get("queries", {}).get(name)
            vals.append(v)
            cells.append(f"{v:.3f}".rjust(10) if v is not None else "—".rjust(10))
        delta = ""
        if len(vals) >= 2 and vals[-1] is not None and vals[-2] is not None:
            pct = (vals[-1] - vals[-2]) / vals[-2] * 100
            delta = f"{pct:+.0f}%"
        print(name.ljust(w) + "".join(cells) + delta.rjust(8))
    totals = [data.get("value") for _, data in rounds]
    # annotate totals computed with crashed queries excluded — a round
    # where a query errored otherwise reads as a large speedup
    errs = [len(data.get("errors") or {}) for _, data in rounds]
    cells = []
    for t, e in zip(totals, errs):
        cell = f"{t:.3f}" if t is not None else "—"
        if e:
            cell += f"!{e}err"
        cells.append(cell.rjust(10))
    print("TOTAL".ljust(w) + "".join(cells))
    if any(errs):
        print("(!Nerr = total excludes N crashed queries that round)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
