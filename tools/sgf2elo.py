#!/usr/bin/env python3
"""Estimate Elo ratings from game records (reference `tools/sgf2elo.py`).

Reads big SGF on stdin with PB[]/PW[]/RE[] properties; fits ratings by
logistic maximum likelihood (simple gradient iterations), prints a table
sorted by rating with the first player anchored at 0.
"""

import math
import re
import sys

_PB = re.compile(r"PB\[([^\]]*)\]")
_PW = re.compile(r"PW\[([^\]]*)\]")
_RE = re.compile(r"RE\[([BW])")


def main():
    games = []
    players = {}
    for line in sys.stdin:
        pb, pw, res = _PB.search(line), _PW.search(line), _RE.search(line)
        if not (pb and pw and res):
            continue
        b, w = pb.group(1), pw.group(1)
        for name in (b, w):
            players.setdefault(name, 0.0)
        games.append((b, w, 1.0 if res.group(1) == "B" else 0.0))
    if not games:
        print("no rated games found", file=sys.stderr)
        return 1

    names = sorted(players)
    rating = {n: 0.0 for n in names}
    lr = 8.0
    for _ in range(2000):
        grad = {n: 0.0 for n in names}
        for b, w, score in games:
            p = 1.0 / (1.0 + 10 ** ((rating[w] - rating[b]) / 400.0))
            grad[b] += score - p
            grad[w] -= score - p
        for n in names:
            rating[n] += lr * grad[n] / max(1, len(games))
        anchor = rating[names[0]]
        for n in names:
            rating[n] -= anchor

    for n in sorted(names, key=lambda n: -rating[n]):
        wins = sum(1 for b, w, s in games
                   if (b == n and s == 1.0) or (w == n and s == 0.0))
        total = sum(1 for b, w, _ in games if n in (b, w))
        print(f"{n:24s} {rating[n]:+8.1f}  ({wins}/{total})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
