#!/usr/bin/env python3
"""Subset a big-SGF stream so black and white win equally often.

Replaces the reference's `tools/sgf2balance.py` (de-biases the value head,
`README.md:63-74`): reads big SGF on stdin, emits a maximal prefix-balanced
subset to stdout.
"""

import re
import sys

_RESULT = re.compile(r"RE\[([BW])\+")


def main():
    black, white = [], []
    for line in sys.stdin:
        line = line.strip()
        m = _RESULT.search(line)
        if not m:
            continue
        (black if m.group(1) == "B" else white).append(line)
    n = min(len(black), len(white))
    for i in range(n):
        print(black[i])
        print(white[i])
    print(f"kept {2 * n} of {len(black) + len(white)} games "
          f"(B {len(black)} / W {len(white)})", file=sys.stderr)


if __name__ == "__main__":
    main()
