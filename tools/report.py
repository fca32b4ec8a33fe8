"""Render sweep results (tools/sweep.sh terse lines) as 2-D tables —
the equivalent of the reference's awk reporter
(/root/reference/test/report.awk:171-185): rep-averaged workers x
frame-size tables for wall time, throughput, per-worker throughput,
CPU %, max RSS, and compression ratio.

Usage: python tools/report.py results.txt
"""

from __future__ import annotations

import sys
from collections import defaultdict

COLS = ["codec", "workers", "frame", "wall", "user", "sys", "cpu",
        "mibs", "mibs_w", "lat_mean", "lat_std", "rss", "ratio"]
TABLES = [("wall", "wall time (s)"), ("mibs", "throughput (MiB/s)"),
          ("mibs_w", "per-worker throughput (MiB/s)"), ("cpu", "CPU (%)"),
          ("rss", "max RSS (MiB)"), ("ratio", "compression ratio")]


def main(path: str) -> None:
    acc: dict[tuple, dict[str, list[float]]] = defaultdict(
        lambda: defaultdict(list))
    for line in open(path):
        parts = line.split()
        if len(parts) != len(COLS):
            continue
        row = dict(zip(COLS, parts))
        key = (row["codec"], int(row["workers"]), int(row["frame"]))
        for c in COLS[3:]:
            acc[key][c].append(float(row[c]))
    if not acc:
        sys.exit(f"no terse benchmark lines in {path}")
    workers = sorted({k[1] for k in acc})
    frames = sorted({k[2] for k in acc})
    codecs = sorted({k[0] for k in acc})
    for codec in codecs:
        for col, title in TABLES:
            print(f"\n== {codec}: {title} (rows=workers, cols=frame MiB) ==")
            print("      " + "".join(f"{f:>10}" for f in frames))
            for w in workers:
                cells = []
                for f in frames:
                    v = acc.get((codec, w, f), {}).get(col)
                    cells.append(f"{sum(v)/len(v):>10.2f}" if v else
                                 f"{'-':>10}")
                print(f"w={w:<4}" + "".join(cells))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "results.txt")
