#!/usr/bin/env python3
"""Convert SGF games to numpy test fixtures (reference `tools/sgf2array.py`
emitted Rust test arrays; here: .npz with moves/colors/final stones/hash).

Usage: sgf2array.py out.npz < games.sgf
"""

import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dream_go_tpu.go import engine
    from dream_go_tpu.utils import sgf

    out_path = sys.argv[1] if len(sys.argv) > 1 else "games.npz"
    jit_step = jax.jit(engine.step)

    arrays = {}
    for gi, line in enumerate(l.strip() for l in sys.stdin if l.strip()):
        game = sgf.parse_line(line)
        if game is None:
            continue
        s = engine.new_state(game.komi)
        for mv in game.moves:
            s = jit_step(s.replace(to_move=jnp.int8(mv.color)),
                         jnp.int32(mv.point))
        arrays[f"game{gi}_moves"] = np.asarray(
            [m.point for m in game.moves], np.int32)
        arrays[f"game{gi}_colors"] = np.asarray(
            [m.color for m in game.moves], np.int8)
        arrays[f"game{gi}_stones"] = np.asarray(s.stones)
        arrays[f"game{gi}_hash"] = np.asarray(s.hash)
        arrays[f"game{gi}_komi"] = np.float32(game.komi)
    np.savez_compressed(out_path, **arrays)
    print(f"wrote {len(arrays) // 5} games to {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
