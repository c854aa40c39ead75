"""Policy-only self-play: the reference's ``--num-rollout 1`` fast path.

Replaces `src/libdg_mcts/self_play.rs:370-459` with a fully vectorized
driver: all games advance in lockstep on device, one network evaluation per
move for the whole batch; the host loop only records per-move arrays and
assembles SGF lines.

Reference semantics preserved:
- passing is forbidden until the board is scorable (`self_play_one`,
  `self_play.rs:434-436`): before that the ScoringSearch candidate mask
  applies (no pass, no Benson/heuristic eye fills, `options.rs:110-214`);
- the move is drawn with percentile-cutoff temperature sampling over the
  masked policy (`choose(policy, 0.5, 1/T, rand)`, `self_play.rs:381-386`);
  if no candidate survives, pass (`unwrap_or(361)`);
- games end on two consecutive passes or after 722 moves;
- per-move records carry the full policy softmax (``P[...]``) and the
  black-perspective value (``V[...]``), and the finished board is scored by
  Benson-clearing + Tromp-Taylor for ``RE``/``TB``/``TW``
  (`game_result.rs:31-44`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SelfPlayConfig
from ..go import benson as bn
from ..go import engine, features
from ..go.options import scoring_mask
from ..mcts.choose import choose
from ..mcts.predictor import Predictor, symmetrize
from .records import Played, game_result_sgf


def random_komi(n: int, seed: int = 0):
    """Weighted random komi (`lib.rs:202-224`): 40% 7.5, 40% 6.5, 10% 0.5,
    10% uniform half-integer in [-7.5, 7.5]."""
    import numpy as _np
    rng = _np.random.default_rng(seed)
    u = rng.random(n)
    out = _np.full(n, 7.5, _np.float32)
    out[u >= 0.4] = 6.5
    out[u >= 0.8] = 0.5
    rand_mask = u >= 0.9
    out[rand_mask] = rng.integers(-8, 8, rand_mask.sum()) + 0.5
    return out


class PolicyPlayer:
    """Bundles a predictor with sampling settings."""

    def __init__(self, predictor: Predictor, *, temperature: float = 0.7,
                 cutoff_percentile: float = 0.5, sym_average: bool = False,
                 ladder_features: bool = False, feature_set: str = "v1"):
        self.predict = symmetrize(predictor) if sym_average else predictor
        self.temperature = temperature
        self.cutoff_percentile = cutoff_percentile
        self.ladder_features = ladder_features
        self.feature_set = feature_set


def _build_move_fn(player: PolicyPlayer):
    """One lockstep move for the whole batch, jitted."""

    ladders = getattr(player, "ladder_features", False)
    feature_set = getattr(player, "feature_set", "v1")

    @jax.jit
    def move_fn(states: engine.GoState, rng: jax.Array):
        feats = features.extract_batch(states, feature_set, ladders)
        value, policy = player.predict(feats)

        scorable = jax.vmap(bn.is_scorable)(states)
        std_mask = engine.legal_mask_batch(states)
        scoring = jax.vmap(scoring_mask)(states)
        mask = jnp.where(scorable[:, None], std_mask, scoring)

        masked = jnp.where(mask, policy, 0.0)
        move = choose(rng, masked, player.cutoff_percentile,
                      player.temperature)
        # finished games only pass
        move = jnp.where(states.done, engine.PASS, move)
        new_states = engine.step_batch(states, move.astype(jnp.int32))
        return new_states, move, value, masked / jnp.maximum(
            jnp.sum(masked, axis=-1, keepdims=True), 1e-9)

    return move_fn


def _build_scan_fn(player: PolicyPlayer, chunk: int):
    """``chunk`` lockstep moves in ONE device program (lax.scan).

    Through a remote-tunnel platform every host round-trip costs ~30ms;
    per-move fetches dominate actor wall-clock.  The scan emits the
    per-move records as stacked device arrays fetched once per chunk
    (policy compressed to f16 on device).
    """
    move_fn = _build_move_fn(player)

    @jax.jit
    def scan_fn(states: engine.GoState, rng: jax.Array):
        def step(carry, key):
            states = carry
            active = ~states.done
            to_move = states.to_move
            new_states, move, value, policy = move_fn(states, key)
            return new_states, (active, move, value, to_move,
                                policy.astype(jnp.float16))

        keys = jax.random.split(rng, chunk)
        states, recs = jax.lax.scan(step, states, keys)
        return states, recs

    return scan_fn


@functools.partial(jax.jit)
def _final_territory(states: engine.GoState):
    return jax.vmap(bn.stone_status)(
        states.stones, states.chain_id, states.stones, states.chain_id)[1]


def policy_self_play(player: PolicyPlayer, cfg: SelfPlayConfig,
                     seed: int = 0, sharding=None) -> list[str]:
    """Play ``cfg.num_games`` games to completion; returns SGF lines.

    ``sharding`` (an optional ``NamedSharding`` over the batch axis) shards
    the game batch across the mesh's data axis; the jitted move function then
    runs data-parallel with XLA-inserted collectives (SURVEY §2.11 P2/P4).
    """
    states = engine.new_states(cfg.num_games, komi=cfg.komi,
                               history_len=cfg.history_len)
    if cfg.random_komi:
        states = states.replace(komi=jnp.asarray(
            random_komi(cfg.num_games, seed), jnp.float32))
    if sharding is not None:
        states = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), states)
    chunk = min(32, cfg.max_moves)
    scan_fn = _build_scan_fn(player, chunk)
    key = jax.random.PRNGKey(seed)

    records = []  # (active[B], move[B], value[B], to_move[B], policy f16)
    done_moves = 0
    while done_moves < cfg.max_moves:
        step = min(chunk, cfg.max_moves - done_moves)
        fn = scan_fn if step == chunk else _build_scan_fn(player, step)
        key, sub = jax.random.split(key)
        states, recs = fn(states, sub)
        active, move, value, to_move, policy = (np.asarray(r) for r in recs)
        for k in range(step):
            records.append((active[k], move[k], value[k], to_move[k],
                            policy[k]))
        done_moves += step
        if bool(np.all(np.asarray(states.done))):
            break

    territory = np.asarray(_final_territory(states))
    komis = np.asarray(states.komi)
    games = []
    for g in range(cfg.num_games):
        sgf_moves = []
        for active, move, value, to_move, policy in records:
            if not active[g]:
                break
            sgf_moves.append(Played(
                to_move=int(to_move[g]), point=int(move[g]),
                value=float(value[g]), num_rollout=1,
                softmax=policy[g]).to_sgf())
        games.append(game_result_sgf(
            "".join(sgf_moves), komi=float(komis[g]),
            territory=territory[g]))
    return games
