"""Reanalyze + ex-it annotation: re-search recorded positions in batches.

Replaces `src/libdg_mcts/reanalyze.rs` and the ex-it arm of
`self_play.rs:287-319`.  Both take SGF lines, select a subset of positions,
re-search them with fresh trees (batched across positions — the TPU-native
replacement for the reference's per-thread fresh trees), and re-emit the
lines with updated ``TV[n]P[...]V[...]`` annotations on those moves.

- reanalyze: ~5% of all positions, uniformly at random (`reanalyze.rs:98-104`)
- ex-it: ~5% of positions whose recorded to-move win rate is <= 0.8
  (`self_play.rs:315-319` `is_good_candidate`)
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..config import SearchConfig
from ..go import engine
from ..mcts import search as S
from ..mcts.predictor import Predictor
from ..utils import sgf
from .records import Played, game_result_sgf
from .replay import states_at


def _build_search_fn(predictor: Predictor, search_cfg: SearchConfig,
                     num_sims: int):
    """One jitted fresh-tree search program, built once per annotate pass.

    Must be constructed OUTSIDE the chunk loop: a fresh ``jax.jit`` wrapper
    per chunk is a new callable identity, so every chunk would retrace and
    recompile the whole search program (minutes each on a remote-compile
    TPU) even when the shapes repeat.
    """
    return jax.jit(lambda st, rng: S.search(st, predictor, rng, search_cfg,
                                            num_sims, None,
                                            adaptive=search_cfg.adaptive))


def _search_positions(states: engine.GoState, search_fn, seed: int):
    """Batched fresh-tree search of one position chunk -> (targets, values)."""
    trees = search_fn(states, jax.random.PRNGKey(seed))
    targets = np.asarray(jax.vmap(S.softmax_targets)(trees),
                         dtype=np.float16)
    q = np.asarray(jax.vmap(S.root_q)(trees))
    visits = np.asarray(jax.vmap(S.root_visits)(trees))
    best = visits.argmax(axis=-1)
    values = q[np.arange(q.shape[0]), best]
    return targets, values


def annotate_lines(lines: list[str], predictor: Predictor,
                   search_cfg: SearchConfig | None = None,
                   num_sims: int = 100, fraction: float = 0.05,
                   max_value: float | None = None, seed: int = 0,
                   position_batch: int = 64) -> list[str]:
    """Re-search selected positions and patch the SGF annotations."""
    search_cfg = search_cfg or SearchConfig()
    rng = np.random.default_rng(seed)

    parsed = [sgf.parse_line(line) for line in lines]
    # collect candidate (game, move_idx) pairs
    candidates: list[tuple[int, int]] = []
    for gi, game in enumerate(parsed):
        if game is None:
            continue
        for mi, mv in enumerate(game.moves):
            if max_value is not None and mv.value is not None:
                wr = (mv.value + 1.0) / 2.0  # V[] is black-perspective
                if mv.color == 2:
                    wr = 1.0 - wr
                if wr > max_value:
                    continue
            if rng.random() < fraction:
                candidates.append((gi, mi))

    if not candidates:
        return list(lines)

    # batched replay + search, padding the final chunk; both programs are
    # jitted ONCE here so chunks with the same bucketed shapes reuse them
    states_fn = jax.jit(states_at, static_argnums=3)
    search_fn = _build_search_fn(predictor, search_cfg, num_sims)
    new_annotations: dict[tuple[int, int], tuple[np.ndarray, float]] = {}
    for start in range(0, len(candidates), position_batch):
        chunk = candidates[start:start + position_batch]
        pad = position_batch - len(chunk)
        chunk_p = chunk + [chunk[-1]] * pad
        t_max = max(len(parsed[g].moves) for g, _ in chunk_p)
        t_max = ((t_max + 127) // 128) * 128  # bucket to limit recompiles
        moves = np.full((position_batch, t_max), engine.PASS, np.int32)
        komi = np.zeros(position_batch, np.float32)
        tgt = np.zeros(position_batch, np.int32)
        for row, (g, mi) in enumerate(chunk_p):
            seq = [mv.point for mv in parsed[g].moves]
            moves[row, :len(seq)] = seq
            komi[row] = parsed[g].komi
            tgt[row] = mi
        states = states_fn(
            jnp.asarray(moves), jnp.asarray(tgt), jnp.asarray(komi), 64)
        targets, values = _search_positions(states, search_fn, seed + start)
        for row, (g, mi) in enumerate(chunk):
            new_annotations[(g, mi)] = (targets[row], float(values[row]))

    # re-emit lines with patched annotations
    out = []
    for gi, (line, game) in enumerate(zip(lines, parsed)):
        if game is None:
            out.append(line)
            continue
        sgf_moves = []
        for mi, mv in enumerate(game.moves):
            if (gi, mi) in new_annotations:
                tgts, val = new_annotations[(gi, mi)]
                sgf_moves.append(Played(
                    to_move=mv.color, point=mv.point, value=val,
                    num_rollout=num_sims, softmax=tgts).to_sgf())
            else:
                black_value = mv.value
                tm_value = None
                if black_value is not None:
                    tm_value = (black_value + 1.0) / 2.0 if mv.color == 1 \
                        else (1.0 - black_value) / 2.0
                sgf_moves.append(Played(
                    to_move=mv.color, point=mv.point, value=tm_value,
                    num_rollout=mv.num_rollout or 1,
                    softmax=mv.policy).to_sgf())
        terr = np.zeros(361, np.int8)
        terr[game.black_territory] = 1
        terr[game.white_territory] = 2
        out.append(game_result_sgf("".join(sgf_moves), komi=game.komi,
                                   territory=terr if terr.any() else None,
                                   resign_winner=game.winner
                                   if game.by_resign else None))
    return out


def reanalyze(lines: list[str], predictor: Predictor,
              search_cfg: SearchConfig | None = None, num_sims: int = 100,
              fraction: float = 0.05, seed: int = 0,
              position_batch: int = 64) -> list[str]:
    """`--reanalyze`: refresh ~5% of positions with new search annotations."""
    return annotate_lines(lines, predictor, search_cfg, num_sims,
                          fraction=fraction, max_value=None, seed=seed,
                          position_batch=position_batch)


def ex_it(lines: list[str], predictor: Predictor,
          search_cfg: SearchConfig | None = None, num_sims: int = 100,
          fraction: float = 0.05, seed: int = 0,
          position_batch: int = 64) -> list[str]:
    """`--ex-it`: expert-iteration annotation of mid-value positions."""
    return annotate_lines(lines, predictor, search_cfg, num_sims,
                          fraction=fraction, max_value=0.8, seed=seed,
                          position_batch=position_batch)
