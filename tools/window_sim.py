"""Simulate the driver's bounded correctness window BEFORE committing
new registrations — the check SURVEY §8's registration budget tells
every round to run.

    python tools/window_sim.py [WINDOW_SIZE]

Prints the first WINDOW_SIZE (default 50) queries in registry
iteration order with each one's latest committed proof round, plus the
histogram — so you can see exactly which backlog proofs a new
registration would displace (never-proven queries sort to the front
and eat window slots)."""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as e

    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    latest: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(path.split("_r")[1].split(".")[0])
        for name in json.load(open(path)):
            latest[name] = max(latest.get(name, 0), rnd)
    names = list(e.queries())
    print(f"{len(names)} registered; window = first {window} in "
          f"registry order\n")
    hist: dict[int, int] = {}
    for i, name in enumerate(names[:window]):
        r = latest.get(name, 0)
        hist[r] = hist.get(r, 0) + 1
        tag = "NEVER" if r == 0 else f"r{r}"
        print(f"{i + 1:3d}. {name:45s} {tag}")
    print("\nwindow histogram (0 = never driver-proven):",
          dict(sorted(hist.items())))
    beyond = [n for n in names[window:] if latest.get(n, 0) <= 2]
    if beyond:
        print(f"\nr1/r2-era proofs OUTSIDE the window ({len(beyond)}):",
              ", ".join(beyond))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
