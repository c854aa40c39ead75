"""Board coordinate codecs.

Parity with the reference codecs:
- CGoban SGF coordinates (`src/libdg_go/utils/sgf.rs:34-68`): two lowercase
  letters column-then-row, empty string for pass.
- Sabaki SGF coordinates (`src/libdg_go/utils/sgf.rs:70-92`): like CGoban with
  the row axis flipped.
- GTP vertices (`src/dg/gtp/vertex.rs`): letter (skipping I) + 1-based row.

Internally a point is a flat index ``p = 19*y + x`` in ``[0, 361)``;
361 (`PASS`) denotes a pass.
"""

from __future__ import annotations

N = 19
NN = N * N
PASS = NN

_SGF_LETTERS = "abcdefghijklmnopqrs"
_GTP_LETTERS = "ABCDEFGHJKLMNOPQRST"  # no I


def point(x: int, y: int) -> int:
    return N * y + x


def point_xy(p: int) -> tuple[int, int]:
    return p % N, p // N


def to_sgf(p: int) -> str:
    """CGoban coordinates; empty string for pass."""
    if p == PASS or p < 0:
        return ""
    x, y = point_xy(p)
    return _SGF_LETTERS[x] + _SGF_LETTERS[y]


def from_sgf(s: str) -> int:
    """Parse CGoban coordinates; '' or 'tt' is a pass."""
    if s == "" or s == "tt":
        return PASS
    if len(s) != 2:
        raise ValueError(f"bad SGF coordinate {s!r}")
    x = _SGF_LETTERS.index(s[0])
    y = _SGF_LETTERS.index(s[1])
    return point(x, y)


def to_sabaki(p: int) -> str:
    if p == PASS or p < 0:
        return ""
    x, y = point_xy(p)
    return _SGF_LETTERS[x] + _SGF_LETTERS[18 - y]


def from_sabaki(s: str) -> int:
    p = from_sgf(s)
    if p == PASS:
        return p
    x, y = point_xy(p)
    return point(x, 18 - y)


def to_gtp(p: int) -> str:
    if p == PASS or p < 0:
        return "pass"
    x, y = point_xy(p)
    return f"{_GTP_LETTERS[x]}{19 - y}"


def from_gtp(s: str) -> int:
    s = s.strip().lower()
    if s in ("pass", "resign"):
        return PASS
    col = s[0].upper()
    x = _GTP_LETTERS.index(col)
    y = 19 - int(s[1:])
    if not (0 <= y < N):
        raise ValueError(f"bad GTP vertex {s!r}")
    return point(x, y)
