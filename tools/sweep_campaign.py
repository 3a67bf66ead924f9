"""Batched fresh-solo replacement of contaminated sweep rows.

The r11/r12 pattern: a full sf1 sweep takes ~45 min of wall time, so
it inevitably overlaps co-tenant bursts, and the rows that ran inside
one carry inflated wall readings (correctness is unaffected — only
``sec``/``spark_sec``). This tool re-runs the suspicious rows in
BATCHES (one subprocess = one JVM = many rows, instead of
one-JVM-per-row like tools/solo_adjudicate.py — 25 s of startup per
row would dominate a 48-row campaign), gated on a clean window per
batch, and accepts each row by its OWN ledger:

    accepted  iff  steal < 2 %/cpu  AND  loadavg (both ends) < cores/4
              AND  (no clean history, or sec <= ratio x best clean
                   history, or sec improved on the sweep row)

Accepted rows REPLACE the sweep rows in place, the displaced reading
preserved under ``replaced_in_round`` (the r11 convention); rows
still suspicious after the budget keep their best observed reading
and a ``campaign: unresolved`` marker.

Usage:
    python tools/sweep_campaign.py --sweep SWEEP_sf1_r12.json \
        --sf-dir /tmp/sf1 --round 12 [--ratio 1.5] [--budget 3600] \
        [--count-only a,b] [--spark-only c,d]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.solo_adjudicate import (  # noqa: E402
    N_CPUS,
    _steal_share,
    _wait_clean,
    best_clean_history,
)


def _row_clean(row: dict) -> bool:
    n = row.get("noise") or {}
    return (
        _steal_share(n) < 2.0
        and (n.get("loadavg1_start") or 99) < N_CPUS / 4
        and (n.get("loadavg1") or 99) < N_CPUS / 4
    )


def flagged_rows(
    rows: dict, hist: dict, *, ratio: float, min_sec: float
) -> list[str]:
    out = []
    for name, r in rows.items():
        sec = r.get("spark_sec")
        if sec is None or sec < min_sec:
            continue
        h = hist.get(name)
        if (h is not None and sec > ratio * h) or not _row_clean(r):
            out.append(name)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", required=True)
    ap.add_argument("--sf-dir", default="/tmp/sf1")
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--min-sec", type=float, default=5.0)
    ap.add_argument("--budget", type=float, default=3600.0)
    ap.add_argument("--history", default="SWEEP_sf1_r*.json")
    ap.add_argument("--count-only", default="")
    ap.add_argument("--spark-only", default="")
    args = ap.parse_args()

    sweep_path = os.path.join(ROOT, args.sweep)
    data = json.load(open(sweep_path))
    rows = data["results"]
    hist = best_clean_history(args.history)
    remaining = flagged_rows(
        rows, hist, ratio=args.ratio, min_sec=args.min_sec
    )
    print(f"[campaign] {len(remaining)} flagged rows", flush=True)

    t0 = time.monotonic()
    passes = 0
    while remaining and time.monotonic() - t0 < args.budget:
        probe = _wait_clean(min(420.0, args.budget / 4))
        if not probe.get("clean"):
            print(f"[campaign] no clean window ({probe}); retrying", flush=True)
            continue
        passes += 1
        out = f"/tmp/campaign_r{args.round}_p{passes}.json"
        cmd = [
            sys.executable,
            os.path.join(ROOT, "tools", "check_correctness.py"),
            "--sf-dir",
            args.sf_dir,
            "--out",
            out,
        ]
        if args.count_only:
            cmd += ["--count-only", args.count_only]
        if args.spark_only:
            cmd += ["--spark-only", args.spark_only]
        cmd += remaining
        subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT)
        try:
            fresh = json.load(open(out))["results"]
        except (OSError, KeyError, json.JSONDecodeError):
            print("[campaign] batch produced no output; retrying", flush=True)
            continue
        still = []
        for name in remaining:
            r = fresh.get(name)
            sec = (r or {}).get("spark_sec")
            old = rows[name]
            if r is None or sec is None:
                still.append(name)
                continue
            # keep the better of old/new as the candidate
            better = (
                r
                if (old.get("spark_sec") is None or sec < old["spark_sec"])
                else old
            )
            h = hist.get(name)
            ok_hist = h is None or (
                (better.get("spark_sec") or 9e9) <= args.ratio * h
            )
            if _row_clean(better) and ok_hist:
                if better is r:
                    r["replaced_in_round"] = {
                        "round": args.round,
                        "prior_sec": old.get("spark_sec"),
                        "prior_noise": old.get("noise"),
                    }
                    rows[name] = r
                print(
                    f"[campaign] {name}: accepted {better.get('spark_sec')}s"
                    f" (was {old.get('spark_sec')}s, hist {h})",
                    flush=True,
                )
            else:
                if better is r and _row_clean(r):
                    # clean but still above ratio x history: keep the
                    # improved reading, mark unresolved
                    r["replaced_in_round"] = {
                        "round": args.round,
                        "prior_sec": old.get("spark_sec"),
                        "prior_noise": old.get("noise"),
                    }
                    r["campaign"] = "unresolved_vs_history"
                    rows[name] = r
                    print(
                        f"[campaign] {name}: clean {sec}s but >"
                        f" {args.ratio}x hist {h} — kept, unresolved",
                        flush=True,
                    )
                else:
                    still.append(name)
        remaining = still
        with open(sweep_path, "w") as f:
            json.dump(data, f, indent=1)
        print(
            f"[campaign] pass {passes} done; {len(remaining)} left",
            flush=True,
        )
    if remaining:
        for name in remaining:
            rows[name].setdefault("campaign", "unresolved_dirty")
        with open(sweep_path, "w") as f:
            json.dump(data, f, indent=1)
        print(f"[campaign] budget out; unresolved: {remaining}", flush=True)
    return 0


if __name__ == "__main__":
    main()
