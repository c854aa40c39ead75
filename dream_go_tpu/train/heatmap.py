"""Board heat-map rendering for training observability.

Replaces the reference's C++ TensorBoard op `tensor_to_heat_image`
(`contrib/trainer/libdg_tf/tensor_to_image.cc:297-308`): renders a 19x19
board with stones plus a per-point scalar heat map (ownership, policy, ...)
into an RGB image.  Pure numpy + PIL; used by `tools/` and ad-hoc debugging
rather than an in-graph summary op.
"""

from __future__ import annotations

import numpy as np

_CELL = 16


def heat_image(stones: np.ndarray, heat: np.ndarray | None = None
               ) -> np.ndarray:
    """uint8[H, W, 3] image of the board with an optional heat overlay.

    ``stones``: int[361] 0/1/2; ``heat``: float[361] in [-1, 1] (blue
    negative, red positive) or [0, 1] (red scale).
    """
    stones = np.asarray(stones).reshape(19, 19)
    img = np.full((19 * _CELL, 19 * _CELL, 3), 219, np.uint8)
    img[..., 0] = 222  # board-ish background
    img[..., 1] = 184
    img[..., 2] = 135

    if heat is not None:
        h = np.asarray(heat, np.float32).reshape(19, 19)
        h = np.clip(h, -1.0, 1.0)
        for y in range(19):
            for x in range(19):
                v = h[y, x]
                if v == 0:
                    continue
                sl = (slice(y * _CELL, (y + 1) * _CELL),
                      slice(x * _CELL, (x + 1) * _CELL))
                base = img[sl].astype(np.float32)
                color = np.asarray([255, 40, 40] if v > 0 else [40, 40, 255],
                                   np.float32)
                img[sl] = (base * (1 - abs(v)) + color * abs(v)) \
                    .astype(np.uint8)

    # grid lines
    for i in range(19):
        c = i * _CELL + _CELL // 2
        img[c, _CELL // 2:19 * _CELL - _CELL // 2] //= 2
        img[_CELL // 2:19 * _CELL - _CELL // 2, c] //= 2

    # stones
    yy, xx = np.mgrid[0:_CELL, 0:_CELL]
    disc = (yy - _CELL / 2 + 0.5) ** 2 + (xx - _CELL / 2 + 0.5) ** 2 \
        <= (_CELL / 2 - 1) ** 2
    for y in range(19):
        for x in range(19):
            if stones[y, x] == 0:
                continue
            sl = (slice(y * _CELL, (y + 1) * _CELL),
                  slice(x * _CELL, (x + 1) * _CELL))
            color = 20 if stones[y, x] == 1 else 245
            region = img[sl]
            region[disc] = color
            img[sl] = region
    return img


def save_heat_image(path: str, stones, heat=None):
    from PIL import Image

    Image.fromarray(heat_image(stones, heat)).save(path)
