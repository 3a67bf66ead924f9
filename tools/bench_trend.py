"""Per-query bench + sweep trend across rounds AND scale factors.

Two report sections:

1. **Bench trend** — reads every ``BENCH_r{N}.json`` the driver
   recorded (plus optional extra bench-output files passed as
   arguments), one row per query with its time in each round and the
   delta of the latest round vs the previous one. Catches a per-query
   regression that the headline total hides — one query doubling
   while another halves nets out invisible.

2. **Sweep scaling** — reads every ``SWEEP*_r{N}.json``
   (``tools/check_correctness.py --out`` artifacts, which carry
   per-query wall time and the fixture's ``sf_dir``). Diffs each
   query across rounds at the same SF AND across SFs within the
   latest rounds, flagging growth that is superlinear in the data
   scale: a query is flagged when

       t_big > max(t_small - OVERHEAD_S, FLOOR_S) * scale * SLACK
       and t_big > MIN_FLAG_S

   ``OVERHEAD_S`` discounts the fixed per-query Spark overhead
   (session dispatch + DuckDB oracle) that dominates small-SF times;
   ``SLACK`` allows n·log n shuffles and warm-up noise. This makes
   the "still linear at 10×/100×" claim mechanical instead of prose.

Usage:
    python tools/bench_trend.py [extra_bench.json ...]

Exit status is always 0; this is a reporting tool, not a gate
(``tests/test_plan_audit.py`` is the gate for plan shape).
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


#: fixed per-query cost at tiny SF (session dispatch, DuckDB oracle,
#: result normalization) — subtracted from the small-SF time before
#: projecting linear growth, else every sub-second query looks
#: "sublinear" and real compute growth hides under the overhead.
OVERHEAD_S = 0.5
#: lower clamp after the overhead discount, so a 0.51 s query does not
#: project an absurd 0.01 s linear target.
FLOOR_S = 0.2
#: multiplicative allowance for n·log n terms, AQE re-planning, and
#: warm-up noise on top of strictly linear growth.
SLACK = 1.6
#: never flag a query whose big-SF time is still below this — a 2 s
#: absolute cost is not a scaling problem regardless of ratio.
MIN_FLAG_S = 3.0
#: contended-window annotation thresholds (VERDICT r7 item 6): a sweep
#: row whose ledger shows loadavg above LOAD_FACTOR×cores at either
#: end, or hypervisor steal above STEAL_PCT per cpu over the row's
#: window, is printed as "contended — solo re-run advised". Annotation
#: only, never a gate failure: contention makes a reading unreliable,
#: not wrong.
CONTENDED_LOAD_FACTOR = 1.5
CONTENDED_STEAL_PCT = 2.0
#: don't advise re-running sub-5s rows — the solo protocol costs more
#: than the information is worth below that.
CONTENDED_MIN_S = 5.0


def contended_rows(data: dict, n_cpus: int) -> list[str]:
    """Rows of one sweep whose noise ledger marks a hostile window.

    steal percent per cpu = steal_cs / (wall_s · n_cpus): steal_cs is
    centiseconds summed over every cpu, so dividing by wall·cpus gives
    the average fraction of each cpu stolen, in percent.
    """
    out = []
    for name, row in (data.get("results") or {}).items():
        noise = row.get("noise") or {}
        wall = noise.get("wall_s") or 0
        # engine-side seconds ONLY (same semantics rule the scaling
        # gate follows, ADVICE r8): mixing spark_sec with the
        # engine+oracle wall "sec" would compare different time
        # semantics across rows against one CONTENDED_MIN_S threshold.
        # Pre-split rows (no spark_sec) are skipped — they are legacy
        # artifacts the gate also excludes.
        sec = row.get("spark_sec")
        if sec is None or wall <= 0 or sec < CONTENDED_MIN_S:
            continue
        load = max(noise.get("loadavg1") or 0, noise.get("loadavg1_start") or 0)
        steal_pct = (noise.get("steal_cs") or 0) / (wall * n_cpus)
        reasons = []
        if load > CONTENDED_LOAD_FACTOR * n_cpus:
            reasons.append(f"loadavg {load:.1f} > {CONTENDED_LOAD_FACTOR:g}x{n_cpus}cpu")
        if steal_pct > CONTENDED_STEAL_PCT:
            reasons.append(f"steal {steal_pct:.1f}%/cpu")
        if reasons:
            out.append(f"{name} (engine {sec:.1f}s: " + ", ".join(reasons) + ")")
    return out


def _sf_of(sweep: dict) -> float | None:
    """Scale factor parsed from the sweep's fixture dir (…/sf0.01)."""
    m = re.search(r"sf(\d+(?:\.\d+)?)/*$", (sweep.get("sf_dir") or "").rstrip("/"))
    return float(m.group(1)) if m else None


def _sweep_report(root: str) -> None:
    sweeps: list[tuple[int, float, str, dict]] = []  # (round, sf, label, data)
    for path in glob.glob(os.path.join(root, "SWEEP*_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        sf = _sf_of(data)
        if m and sf is not None and isinstance(data.get("results"), dict):
            sweeps.append((int(m.group(1)), sf, os.path.basename(path), data))
    if not sweeps:
        return
    sweeps.sort(key=lambda t: (t[1], t[0]))  # columns: by SF, then round

    names: list[str] = []
    for _, _, _, data in sweeps:
        for q in data["results"]:
            if q not in names:
                names.append(q)

    #: row statuses whose timing is meaningful for scaling analysis —
    #: COUNT_OK (exact count compare, values hash-pinned at sf0.01)
    #: and SPARK_ONLY_OK (oracle intractable at this SF) are exactly
    #: the heaviest pair-join queries; excluding them left the gate
    #: blind to the rows where a scaling regression matters most
    #: (round 6: prefix_join_near_dups at sf1 sat outside the gate).
    _GREEN = {"OK", "COUNT_OK", "SPARK_ONLY_OK", "ROWS_ONLY"}

    def engine_sec(data: dict, name: str) -> float | None:
        """Engine-only seconds — the ONLY timing the scaling gate may
        compare. No fallback to the combined ``sec``: mixing an
        engine+oracle total from an old artifact with an engine-only
        time from a new one lets a quadratic DuckDB oracle fake (or
        mask) an engine scaling flag."""
        row = data["results"].get(name)
        if not row or row.get("status") not in _GREEN:
            return None
        return row.get("spark_sec")

    def display_sec(data: dict, name: str) -> tuple[float, bool] | None:
        """(seconds, is_engine_only) for the table; totals lacking the
        split are shown but marked with '*' and excluded from the gate."""
        row = data["results"].get(name)
        if not row or row.get("status") not in _GREEN:
            return None
        if row.get("spark_sec") is not None:
            return (row["spark_sec"], True)
        return (row["sec"], False) if row.get("sec") is not None else None

    print("\n== sweep scaling (check_correctness per-query seconds) ==")
    labels = [f"{lab}@sf{sf:g}" for _, sf, lab, _ in sweeps]
    w = max(len(n) for n in names) + 2
    print("query".ljust(w) + "".join(lab.rjust(22) for lab in labels))
    flagged: list[str] = []
    # latest sweep per SF drives the cross-SF superlinearity check
    latest: dict[float, dict] = {}
    for rnd, sf, _, data in sweeps:
        cur = latest.get(sf)
        if cur is None or rnd >= cur["round"]:
            latest[sf] = {"round": rnd, "data": data}
    sfs = sorted(latest)
    saw_unsplit = False
    for name in names:
        cells = []
        for _, _, _, data in sweeps:
            d = display_sec(data, name)
            if d is None:
                cells.append("—".rjust(22))
            else:
                v, engine_only = d
                saw_unsplit |= not engine_only
                cells.append((f"{v:.2f}" + ("" if engine_only else "*")).rjust(22))
        marks = []
        for lo, hi in zip(sfs, sfs[1:]):
            t_lo = engine_sec(latest[lo]["data"], name)
            t_hi = engine_sec(latest[hi]["data"], name)
            if t_lo is None or t_hi is None:
                continue
            scale = hi / lo
            budget = max(t_lo - OVERHEAD_S, FLOOR_S) * scale * SLACK
            # two independent conditions must BOTH trip: the
            # overhead-discounted budget (catches quadratic growth
            # hiding under a tiny, fixed-cost-dominated t_lo) AND the
            # raw ratio exceeding the data ratio (a query whose total
            # time grew by LESS than the data grew is linear by
            # definition — the discount alone mis-flags sub-second
            # baselines where per-query fixed costs exceed OVERHEAD_S).
            # the raw-ratio test gets the same SLACK as the budget —
            # n·log n sort factors and cross-run noise apply to it
            # identically (a 110x ratio on 100x data is a sort, not a
            # scaling bug).
            if (
                t_hi > budget
                and t_hi > MIN_FLAG_S
                and t_hi / t_lo > scale * SLACK
            ):
                marks.append(
                    f"SUPERLINEAR sf{lo:g}->sf{hi:g}: {t_hi:.1f}s > "
                    f"{budget:.1f}s budget, ratio {t_hi / t_lo:.0f}x > "
                    f"{scale:g}x data"
                )
        if marks:
            flagged.append(f"{name}: " + "; ".join(marks))
        print(name.ljust(w) + "".join(cells) + ("   ⚠" if marks else ""))
    failed = {
        lab: data["failed"] for _, _, lab, data in sweeps if data.get("failed")
    }
    if failed:
        print(f"sweep failures: {failed}")
    if saw_unsplit:
        print("(* = engine+oracle total from a pre-split artifact; "
              "shown for history, EXCLUDED from the scaling gate)")
    if flagged:
        print(f"\n{len(flagged)} queries grow superlinearly in data scale:")
        for line in flagged:
            print("  " + line)
    else:
        print("\nno superlinear growth across "
              + " -> ".join(f"sf{s:g}" for s in sfs)
              + " (engine-side time, all green-status rows with a split)")
    # contended-window annotation over the LATEST sweep per SF — turns
    # the "which heavy rows need the solo protocol" judgment into a
    # mechanical list (annotation, not a gate)
    n_cpus = os.cpu_count() or 32
    for sf in sfs:
        rows = contended_rows(latest[sf]["data"], n_cpus)
        if rows:
            print(f"\nsf{sf:g}: {len(rows)} rows swept in a contended window "
                  "— solo re-run advised:")
            for r in sorted(rows):
                print("  " + r)


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
    _sweep_report(root)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
