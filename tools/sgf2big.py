#!/usr/bin/env python3
"""Merge directories of SGF files into big-SGF (one game per line).

Replaces `tools/sgf2big.py` in the reference pipeline (`README.md:23-27`):
strips newlines inside each game record so downstream tools can treat every
line as one game.
"""

import os
import sys


def iter_sgf_files(paths):
    for path in paths:
        if os.path.isdir(path):
            for root, _, names in os.walk(path):
                for name in sorted(names):
                    if name.endswith(".sgf"):
                        yield os.path.join(root, name)
        else:
            yield path


def main(argv):
    if not argv:
        print("usage: sgf2big.py <dir-or-file>...", file=sys.stderr)
        return 1
    for path in iter_sgf_files(argv):
        with open(path, errors="replace") as fh:
            content = fh.read()
        line = " ".join(content.split())
        if line.startswith("("):
            print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
