#!/usr/bin/env python3
"""Re-score big-SGF games with the engine (reference `tools/sgf2score.py`).

Replays each game on the vectorized engine, finishes it with the greedy
scorer if needed, and rewrites ``RE[]`` with the Tromp-Taylor result after
Benson clearing.  Games that cannot be parsed pass through unchanged.
"""

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
    from dream_go_tpu.utils import sgf
    import re

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
        scores = np.asarray(jax.jit(jax.vmap(benson.guess_score))(
            states.stones, states.chain_id, states.komi))
        for row, i in enumerate(idx):
            s = float(scores[row])
            res = f"B+{s:.1f}" if s > 0 else f"W+{-s:.1f}" if s < 0 else "0"
            if re.search(r"RE\[[^\]]*\]", lines[i]):
                lines[i] = re.sub(r"RE\[[^\]]*\]", f"RE[{res}]", lines[i], 1)
            else:
                lines[i] = lines[i].replace(";B[", f"RE[{res}];B[", 1)
    for line in lines:
        print(line)


if __name__ == "__main__":
    main()
