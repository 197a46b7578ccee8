#!/usr/bin/env python
"""Render the hardware-queue perf artifacts as the markdown blocks that
docs/performance.md embeds (shape sweep, coldstart, flagship table).

Purely a formatter: reads ``outputs/shape_sweep_tpu.csv``,
``outputs/coldstart_tpu.json`` and ``outputs/flagship_scale_tpu.csv``
(whichever exist) and prints markdown to stdout.  Run after
``tools/run_round5_hw.sh`` lands its artifacts::

    python tools/render_perf_artifacts.py
"""

from __future__ import annotations

import csv
import json
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "outputs"


def shape_table() -> str | None:
    p = OUT / "shape_sweep_tpu.csv"
    if not p.exists():
        return None
    rows = list(csv.DictReader(open(p)))
    if not rows:
        return None
    lines = [
        "| config | M×N | K | routing | sweeps/s | ms/sweep "
        "| % of MXU roofline | % of same-K matmul floor |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['config']} | {int(r['M']):,}×{int(r['N']):,} | {r['K']} "
            f"| {r['routing']} | {r['sweeps_per_sec']} | {r['ms_per_sweep']} "
            f"| {r['pct_of_mxu_roofline']} % | {r['pct_of_matmul_floor']} % |"
        )
    lines.append(
        f"\n(session-calibrated f32-DEFAULT MXU rate: {rows[0]['mxu_tf_s']} "
        f"TF/s; device `{rows[0]['device']}`; slope-timed at "
        "per-shape iteration pairs sized to ≥1.5 s device time)"
    )
    return "\n".join(lines)


def coldstart_block() -> str | None:
    p = OUT / "coldstart_tpu.json"
    if not p.exists():
        return None
    d = json.loads(p.read_text())
    lines = ["```json", json.dumps(d, indent=1), "```"]
    return "\n".join(lines)


def flagship_table() -> str | None:
    p = OUT / "flagship_scale_tpu.csv"
    if not p.exists():
        return None
    rows = list(csv.DictReader(open(p)))
    if not rows:
        return None
    cols = list(rows[0])
    lines = ["| " + " | ".join(cols) + " |", "|" + "---|" * len(cols)]
    for r in rows:
        lines.append("| " + " | ".join(r[c] for c in cols) + " |")
    return "\n".join(lines)


def main():
    for title, block in [
        ("Shape sweep (outputs/shape_sweep_tpu.csv)", shape_table()),
        ("Coldstart (outputs/coldstart_tpu.json)", coldstart_block()),
        ("Flagship scale (outputs/flagship_scale_tpu.csv)", flagship_table()),
    ]:
        print(f"## {title}\n")
        print(block if block else "_artifact not present_")
        print()


if __name__ == "__main__":
    main()
