#!/usr/bin/env python3
"""Keep the most recent N games of a big-SGF stream (reference
`tools/sgf2recent.py`: windowing for the replay buffer)."""

import collections
import sys


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    window = collections.deque(maxlen=n)
    for line in sys.stdin:
        line = line.strip()
        if line:
            window.append(line)
    for line in window:
        print(line)


if __name__ == "__main__":
    main()
