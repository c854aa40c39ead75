#!/usr/bin/env python3
"""Convert Sabaki-coordinate SGF to CGoban coordinates (reference
`tools/sgf2cgoban.py`): flips the row axis of every move/territory point."""

import re
import sys

sys.path.insert(0, "/root/repo")

from dream_go_tpu.utils import coords  # noqa: E402


def _flip(m):
    prop, val = m.group(1), m.group(2)
    if len(val) == 2:
        p = coords.from_sabaki(val)
        return f"{prop}[{coords.to_sgf(p)}]"
    return m.group(0)


def main():
    pattern = re.compile(r"\b([BW]|TB|TW|TR|AB|AW)\[([a-z]{0,2})\]")
    for line in sys.stdin:
        print(pattern.sub(_flip, line.rstrip("\n")))


if __name__ == "__main__":
    main()
