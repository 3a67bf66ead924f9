"""Host-side noise counters shared by the bench and sweep ledgers.

Two signals, complementary:

- :func:`steal_cs` — hypervisor steal (centiseconds, all CPUs) from
  ``/proc/stat``. Catches a noisy NEIGHBOR VM, but is structurally
  blind to same-box load: other processes inside this VM never show
  up as steal (VERDICT r11 item 2 — six sweep rows regressed 2-10x
  at loadavg 9-21 with quiet steal ledgers).
- :func:`tree_cpu_s` — total CPU seconds (utime+stime) of the calling
  process and every live descendant: in local mode the JVM and its
  Python workers are all children, so a per-row delta is the work the
  row actually burned. Contention inflates WALL, not CPU, so this is
  the contention-immune signal for cross-round comparisons.
"""

from __future__ import annotations

import os


def steal_cs() -> int:
    """Hypervisor steal time (centiseconds, all CPUs) from /proc/stat."""
    try:
        return int(open("/proc/stat").readline().split()[8])
    except (OSError, IndexError, ValueError):
        return 0


def tree_cpu_s() -> float:
    """CPU seconds of this process + every live descendant.

    Best-effort: a pid that exits mid-walk is skipped (its CPU is
    charged to the parent via waited-children times only after reap —
    acceptable drift for an adjudication signal, not a benchmark
    number).
    """
    hz = os.sysconf("SC_CLK_TCK")
    ppid_of, cpu_of = {}, {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(") ", 1)[1].split()
        except OSError:
            continue
        # fields after comm: state ppid ... utime(11) stime(12)
        ppid_of[int(pid)] = int(parts[1])
        cpu_of[int(pid)] = (int(parts[11]) + int(parts[12])) / hz
    kids: dict[int, list[int]] = {}
    for pid, ppid in ppid_of.items():
        kids.setdefault(ppid, []).append(pid)
    total, stack = 0.0, [os.getpid()]
    while stack:
        pid = stack.pop()
        total += cpu_of.get(pid, 0.0)
        stack.extend(kids.get(pid, ()))
    return total
