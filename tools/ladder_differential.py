#!/usr/bin/env python3
"""Measure DFS-reader vs recursive-oracle ladder disagreement at scale.

The engine's ladder reader (`go/ladder.py`) runs the reference's branching
recursion (`/root/reference/src/libdg_go/utils/ladder.rs:110-119`) as an
explicit-stack DFS with bounded stack depth and step budget; agreement with
the unbounded recursive oracle should be exact on anything but pathological
branch trees.  This tool quantifies it over tens of thousands of candidate
points drawn from random whole-board and crowded sub-board games, the same
distribution the engine sees in self-play.

Usage: python tools/ladder_differential.py [--positions N] [--seed S]
Prints a JSON summary; exit code 1 if disagreement exceeds 0.1%.
"""

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--positions", type=int, default=1500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-per-position", type=int, default=64)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from dream_go_tpu.go import engine, ladder
    from dream_go_tpu.go.reference import PyBoard, neighbors

    rng = np.random.default_rng(args.seed)
    jit_step = jax.jit(engine.step)
    jit_planes = jax.jit(
        lambda st: ladder.ladder_planes(st, max_candidates=64))

    n_cap = n_esc = 0
    cap_dis = esc_dis = 0
    examples = []
    t0 = time.time()
    pos_done = 0
    while pos_done < args.positions:
        # play a fresh random game to a random depth; half of the games are
        # confined to a sub-board to force capture-dense, ladder-rich shapes
        s = engine.new_state()
        b = PyBoard()
        depth = int(rng.integers(20, 160))
        region = np.ones(361, bool)
        if rng.random() < 0.5:
            w = int(rng.integers(6, 10))
            x0, y0 = rng.integers(0, 19 - w, 2)
            m = np.zeros((19, 19), bool)
            m[y0:y0 + w, x0:x0 + w] = True
            region = m.reshape(361)
        ok = True
        for _ in range(depth):
            mask = b.legal_mask()
            pts = np.flatnonzero(mask[:361] & region)
            if len(pts) == 0:
                pts = np.flatnonzero(mask[:361])
            if len(pts) == 0:
                ok = False
                break
            mv = int(rng.choice(pts))
            b.play(mv)
            s = jit_step(s, jnp.int32(mv))
        if not ok:
            continue
        pos_done += 1
        s = s.replace(to_move=jnp.int8(b.to_move))
        cap, esc = jit_planes(s)
        cap, esc = np.asarray(cap), np.asarray(esc)
        color = b.to_move
        opp = 3 - color
        checked = 0
        for p in range(361):
            if checked >= args.max_per_position:
                break
            if not b.is_pseudo_legal(color, p):
                continue
            is_cap_cand = any(
                b.stones[q] == opp and b.num_liberties(q) == 2
                for q in neighbors(p))
            is_esc_cand = any(
                b.stones[q] == color and b.num_liberties(q) == 1
                for q in neighbors(p))
            if is_cap_cand:
                want = b.is_ladder_capture(color, p)
                n_cap += 1
                checked += 1
                if bool(cap[p]) != want:
                    cap_dis += 1
                    if len(examples) < 20:
                        examples.append(("cap", pos_done, p, want))
            if is_esc_cand:
                want = b.is_ladder_escape(color, p)
                n_esc += 1
                checked += 1
                if bool(esc[p]) != want:
                    esc_dis += 1
                    if len(examples) < 20:
                        examples.append(("esc", pos_done, p, want))

    total = n_cap + n_esc
    dis = cap_dis + esc_dis
    out = {
        "positions": pos_done,
        "capture_points": n_cap,
        "capture_disagree": cap_dis,
        "escape_points": n_esc,
        "escape_disagree": esc_dis,
        "total_points": total,
        "total_disagree": dis,
        "disagree_rate": dis / max(total, 1),
        "seconds": round(time.time() - t0, 1),
        "examples": examples,
    }
    print(json.dumps(out))
    return 1 if dis / max(total, 1) > 0.001 else 0


if __name__ == "__main__":
    sys.exit(main())
