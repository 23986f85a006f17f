"""Format the multi-scale headline bench table (r7 verdict #1) from
bench.py JSON outputs at sf0.1 / 30x / 100x into BENCH-format markdown:
per-query min-of-3 walls plus the control-normalized ratio columns the
host-drift invariant (BASELINE.md r8) says to compare.

Usage: python tools/fmt_multiscale.py sf01.json bench30.json bench100.json
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    paths = sys.argv[1:4]
    runs = [json.load(open(p)) for p in paths]
    labels = ["sf0.1", "30x", "100x"]
    names = list(runs[0]["queries"])
    print("| query | " + " | ".join(labels) + " | 100x/30x (3.33x data) |")
    print("|---|" + "---|" * (len(labels) + 1))
    for n in names:
        walls = [r["queries"].get(n) for r in runs]
        ratio = (
            f"{walls[2] / walls[1]:.1f}x"
            if walls[1] and walls[2] and walls[1] > 0
            else "—"
        )
        cells = " | ".join("—" if w is None else f"{w:.2f}s" for w in walls)
        print(f"| {n} | {cells} | {ratio} |")
    total = " | ".join(f"{r['value']:.1f}s" for r in runs)
    ctrl = " | ".join(f"{r['control_wall']:.1f}s" for r in runs)
    print(f"| **total** | {total} | {runs[2]['value'] / runs[1]['value']:.1f}x |")
    print(f"| control ({runs[0]['control']}) | {ctrl} |"
          f" {runs[2]['control_wall'] / runs[1]['control_wall']:.1f}x |")


if __name__ == "__main__":
    main()
