#!/usr/bin/env python3
"""Convert leela-zero training data chunks to dream-go big-SGF lines.

Reads the leela-zero text chunk format from stdin (19-line records: 16
hex-encoded stone-history bitplanes, a to-move flag line, a 362-float policy
line, a value line) and reconstructs games as one-line SGFs with ``P[...]``
b85/f16 policy annotations — the distillation data path.

Behavioral parity with the reference tool `tools/lz_decode2sgf.py` (same
record syntax, continuation detection over the 7 shifted history planes,
prefix reconstruction from the 8-step history, RFC-1924 b85 policy blobs);
the implementation here is vectorized numpy over [2, 8, 361] plane stacks
rather than per-plane Python loops.

Usage: unzip -p train_ffe8ba44.zip | gunzip | ./lz_decode2sgf.py > big.sgf
"""

import base64
import sys

import numpy as np

N = 19
PLANES = 16


def _hex_plane(line: str) -> np.ndarray:
    """One hex-encoded 361-bit stone plane -> bool[361]."""
    return np.unpackbits(
        np.frombuffer(bytes.fromhex(line + "0"), np.uint8))[:361].astype(bool)


def _vertices(color: str, now: np.ndarray, before: np.ndarray):
    """SGF move nodes for stones present in ``now`` but not ``before``,
    in board-index order."""
    for idx in np.nonzero(now & ~before)[0]:
        x, y = int(idx) % N, int(idx) // N
        yield ";%s[%c%c]" % (color, chr(97 + x), chr(97 + y))


def _interleave(a, b):
    out = []
    for i in range(max(len(a), len(b))):
        if i < len(a):
            out.append(a[i])
        if i < len(b):
            out.append(b[i])
    return "".join(out)


class Record:
    """One training position: stones[2, 8, 361] (player 0 = side to move,
    history step 0 = current), policy[362], value, to_move."""

    __slots__ = ("stones", "policy", "value", "to_move")

    def __init__(self, planes, to_move, policy, value):
        self.stones = np.asarray(planes, bool).reshape(2, 8, 361)
        self.to_move = to_move
        self.policy = policy
        self.value = value

    def continues(self, prev: "Record | None") -> bool:
        """True when this position extends ``prev`` by exactly one move:
        our history steps 1..7 must equal prev's steps 0..6 (player axes
        swapped when the side to move flipped)."""
        if prev is None:
            return False
        ours = prev.stones if self.to_move == prev.to_move \
            else prev.stones[::-1]
        return bool(np.array_equal(self.stones[:, 1:8], ours[:, 0:7]))

    def opening(self) -> str:
        """Reconstruct the last <=8 moves of history into an SGF prefix."""
        winner = self.to_move if self.value > 0 else _opp(self.to_move)
        parts = ["(;GM[1]FF[4]SZ[19]RU[Chinese]KM[7.5]RE[%s+R]" % winner]
        zeros = np.zeros(361, bool)
        for i in range(8):
            mine = list(_vertices(self.to_move, self.stones[0, 7 - i],
                                  self.stones[0, 8 - i] if i else zeros))
            theirs = list(_vertices(_opp(self.to_move), self.stones[1, 7 - i],
                                    self.stones[1, 8 - i] if i else zeros))
            if self.to_move != "B":
                mine, theirs = theirs, mine
            parts.append(_interleave(mine, theirs))
        return "".join(parts)

    def extension(self, prev: "Record") -> str:
        """The move added since ``prev``, with prev's policy annotation."""
        ours = prev.stones if self.to_move == prev.to_move \
            else prev.stones[::-1]
        mine = list(_vertices(self.to_move, self.stones[0, 0], ours[0, 0]))
        theirs = list(_vertices(_opp(self.to_move), self.stones[1, 0],
                                ours[1, 0]))
        if self.to_move != "B":
            mine, theirs = theirs, mine
        blob = base64.b85encode(
            np.asarray(prev.policy, np.float16).tobytes(), pad=True)
        return _interleave(mine, theirs) + "P[%s]" % blob.decode("ascii")


def _opp(c):
    return "W" if c == "B" else "B"


def records(stream):
    """Yield Records from the 19-line chunk syntax."""
    planes, to_move, policy = [], None, None
    for lineno, line in enumerate(stream):
        line = line.rstrip().lower()
        state = lineno % 19
        if state < PLANES:
            planes.append(_hex_plane(line))
        elif state == PLANES:
            to_move = "B" if line == "0" else "W"
        elif state == PLANES + 1:
            policy = np.asarray(line.split(), np.float32)
        else:
            yield Record(planes, to_move, policy, float(line))
            planes = []


def main(stream=sys.stdin, out=sys.stdout):
    game, prev = "", None
    for rec in records(stream):
        if rec.continues(prev):
            game += rec.extension(prev)
        else:
            if game:
                print(game + ")", file=out, flush=True)
            game = rec.opening()
        prev = rec
    if game:
        print(game + ")", file=out, flush=True)


if __name__ == "__main__":
    main()
