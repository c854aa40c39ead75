#!/usr/bin/env python3
"""Add TB[]/TW[] territory labels to big-SGF games (reference
`tools/sgf2territory.py`): replay, Benson-clear the final board, label
ownership."""

import re
import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax
    if "--tpu" not in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dream_go_tpu.go import benson, engine
    from dream_go_tpu.selfplay.replay import states_at
    from dream_go_tpu.utils import coords, sgf

    lines = [l.strip() for l in sys.stdin if l.strip()]
    parsed = [sgf.parse_line(l) for l in lines]
    idx = [i for i, g in enumerate(parsed) if g is not None]
    if idx:
        t_max = max(len(parsed[i].moves) for i in idx)
        moves = np.full((len(idx), t_max), engine.PASS, np.int32)
        lengths = np.zeros(len(idx), np.int32)
        komi = np.zeros(len(idx), np.float32)
        for row, i in enumerate(idx):
            seq = [m.point for m in parsed[i].moves]
            moves[row, :len(seq)] = seq
            lengths[row] = len(seq)
            komi[row] = parsed[i].komi
        states = jax.jit(states_at, static_argnums=3)(
            jnp.asarray(moves), jnp.asarray(lengths), jnp.asarray(komi), 64)
        _, terr = jax.jit(jax.vmap(benson.stone_status))(
            states.stones, states.chain_id, states.stones, states.chain_id)
        terr = np.asarray(terr)
        for row, i in enumerate(idx):
            line = re.sub(r"T[BW](\[[a-z]{2}\])+", "", lines[i])
            tb = "".join(f"[{coords.to_sgf(int(p))}]"
                         for p in np.flatnonzero(terr[row] == 1))
            tw = "".join(f"[{coords.to_sgf(int(p))}]"
                         for p in np.flatnonzero(terr[row] == 2))
            suffix = (f"TB{tb}" if tb else "") + (f"TW{tw}" if tw else "")
            lines[i] = line[:-1] + suffix + ")" if line.endswith(")") \
                else line + suffix
    for line in lines:
        print(line)


if __name__ == "__main__":
    main()
