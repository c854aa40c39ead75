#!/usr/bin/env python3
"""Render a metrics JSONL stream as ASCII sparkline summaries (stdin or
file).  Companion to dream_go_tpu.train.metrics (TensorBoard replacement)."""

import json
import sys


def spark(values, width=60):
    if not values:
        return ""
    blocks = "▁▂▃▄▅▆▇█"
    lo, hi = min(values), max(values)
    span = (hi - lo) or 1.0
    step = max(1, len(values) // width)
    sampled = values[::step][:width]
    return "".join(blocks[int((v - lo) / span * 7)] for v in sampled)


def main():
    fh = open(sys.argv[1]) if len(sys.argv) > 1 else sys.stdin
    series: dict[str, list] = {}
    for line in fh:
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        for k, v in rec.items():
            if k in ("time",) or not isinstance(v, (int, float)):
                continue
            series.setdefault(k, []).append(v)
    for k in sorted(series):
        vals = series[k]
        print(f"{k:28s} n={len(vals):6d} last={vals[-1]:10.4f} "
              f"min={min(vals):10.4f} max={max(vals):10.4f}  {spark(vals)}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:
        pass
