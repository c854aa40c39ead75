"""Full-search self-play: batched MCTS games (the reference's default path).

Replaces `src/libdg_mcts/self_play.rs:423-499` (`self_play_one` with
``num_rollout > 1``).  All games run in lockstep: every move performs one
batched search (`mcts.search`) across the whole game batch, then one batched
env step.  Reference semantics preserved:

- passing forbidden until scorable; ScoringSearch masks apply in-tree for
  those games (`self_play.rs:434-436`, `options.rs`);
- dirichlet root noise, PUCT with schedule-interpolated constants;
- temperature `choose` over visit counts for the first 8 moves, LCB-greedy
  afterwards (`lib.rs:162-200`, `tree.rs:1262-1282`);
- per-move records carry ``TV[n]P[b85 visit softmax]V[value]``
  (`self_play.rs:187-214` `Played::from_mcts`);
- games end on two consecutive passes or the 722-move cap;
- per-player winrate-scaled rollout budgets: each player keeps a moving
  average of its search values (momentum 0.2, init 0.5) and searches
  ``clamp(4*w*(1-w), 0.1, 1) * num_rollout`` simulations per move
  (`self_play.rs:218-241`).  Lockstep batching realises the budget as a
  per-game cap inside the shared search loop; with ``adaptive`` search the
  whole batch exits once every game is decided or out of budget;
- reused subtree visits count toward the budget (``SearchConfig.
  reuse_budget``): RolloutLimit compares the root's TOTAL count to the
  limit (`rollout_limit.rs:18-45`), so a move with a fat reused subtree
  only tops the tree up instead of re-charging a full fresh budget.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SearchConfig, SelfPlayConfig
from ..go import benson as bn
from ..go import engine
from ..mcts import search as S
from ..mcts.predictor import Predictor, symmetrize
from .policy import _final_territory, random_komi
from .records import Played, game_result_sgf


def _finish_move(search_cfg: SearchConfig, temperature_moves: int,
                 states: engine.GoState, trees, k_move: jax.Array):
    """Pick moves from searched trees and step the boards (shared by the
    full-batch and bucketed move paths)."""
    temp = jnp.where(states.move_count < temperature_moves,
                     jnp.float32(search_cfg.temperature), 0.0)
    batch = states.stones.shape[0]
    move, value = jax.vmap(
        lambda t, r, tm: S.best_move(t, r, search_cfg, tm)
    )(trees, jax.random.split(k_move, batch), temp)
    move = jnp.where(states.done, engine.PASS, move)
    targets = jax.vmap(S.softmax_targets)(trees)
    new_states = engine.step_batch(states, move)
    return new_states, trees, move, value, targets


def _build_search_move_fn(predictor: Predictor, search_cfg: SearchConfig,
                          num_sims: int, temperature_moves: int,
                          tree_reuse: bool = True):
    """Two jitted paths: the first move searches fresh trees; subsequent
    moves re-root the previous move's trees (`tree.rs:1225-1249`).

    With the default ``reuse_budget`` (reference RolloutLimit semantics:
    reuse TOPS UP to the budget, `rollout_limit.rs:18-45`) a capacity of
    ``num_sims + 8`` always suffices — a subtree's node count never
    exceeds its root's visit count, so reused nodes + topped-up sims stay
    under the budget.  The legacy fresh-budget-per-move mode needs the old
    2x headroom.  ``search_cfg.max_nodes`` overrides either."""
    if search_cfg.max_nodes > 0:
        capacity = search_cfg.max_nodes
    elif not tree_reuse:
        capacity = num_sims + 1
    elif search_cfg.reuse_budget:
        capacity = num_sims + 8
    else:
        capacity = 2 * num_sims + 8

    def finish(states, trees, k_move):
        return _finish_move(search_cfg, temperature_moves, states, trees,
                            k_move)

    @jax.jit
    def first_move_fn(states: engine.GoState, rng: jax.Array,
                      budget: jax.Array):
        scorable = jax.vmap(bn.is_scorable)(states)
        use_scoring = ~scorable & ~states.done
        k_search, k_move = jax.random.split(rng)
        trees = S.search(states, predictor, k_search, search_cfg, num_sims,
                         use_scoring, capacity=capacity,
                         adaptive=search_cfg.adaptive, budget=budget)
        return finish(states, trees, k_move)

    # donate the previous trees: the caller rebinds them, and without the
    # alias the re-root step holds TWO full [B, 2*sims, ...] tree copies —
    # the difference between batch 128 and batch 256 fitting in 16G HBM
    @functools.partial(jax.jit, donate_argnums=(1,))
    def reuse_move_fn(states: engine.GoState, trees: S.Tree,
                      prev_move: jax.Array, rng: jax.Array,
                      budget: jax.Array, fresh_mask: jax.Array):
        scorable = jax.vmap(bn.is_scorable)(states)
        use_scoring = ~scorable & ~states.done
        k_search, k_move = jax.random.split(rng)
        trees = S.search_with_reuse(states, trees, prev_move, predictor,
                                    k_search, search_cfg, num_sims,
                                    use_scoring, budget=budget,
                                    fresh_mask=fresh_mask,
                                    adaptive=search_cfg.adaptive)
        return finish(states, trees, k_move)

    if not tree_reuse:
        return first_move_fn, None
    return first_move_fn, reuse_move_fn


def search_self_play(predictor: Predictor, cfg: SelfPlayConfig,
                     search_cfg: SearchConfig | None = None,
                     seed: int = 0, sym_average: bool = False,
                     tree_reuse: bool = True, sharding=None) -> list[str]:
    """Play ``cfg.num_games`` MCTS games to completion; returns SGF lines.

    ``sharding`` (optional ``NamedSharding`` over the batch axis) runs the
    search data-parallel across the mesh (SURVEY §2.11 P2/P4).
    """
    search_cfg = search_cfg or SearchConfig()
    if sym_average:
        predictor = symmetrize(predictor)
    states = engine.new_states(cfg.num_games, komi=cfg.komi,
                               history_len=cfg.history_len)
    if cfg.random_komi:
        states = states.replace(komi=jnp.asarray(
            random_komi(cfg.num_games, seed), jnp.float32))
    if sharding is not None:
        states = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), states)
    first_fn, reuse_fn = _build_search_move_fn(
        predictor, search_cfg, cfg.num_rollout, cfg.temperature_moves,
        tree_reuse=tree_reuse)
    key = jax.random.PRNGKey(seed)

    # per-player winrate moving average -> per-move rollout budget
    # (`self_play.rs:218-241`; column 0 = black, 1 = white)
    winrate = np.full((cfg.num_games, 2), 0.5, np.float32)
    rows = np.arange(cfg.num_games)

    records = []
    trees, prev_move = None, None
    for _ in range(cfg.max_moves):
        key, sub = jax.random.split(key)
        active = ~np.asarray(states.done)
        to_move = np.asarray(states.to_move)
        if cfg.winrate_rollouts:
            w = winrate[rows, np.maximum(to_move, 1) - 1]
            m = np.maximum(4.0 * w * (1.0 - w), 0.1)
            budget = (m * cfg.num_rollout).astype(np.int32)
        else:
            budget = np.full(cfg.num_games, cfg.num_rollout, np.int32)
        jbudget = jnp.asarray(budget)
        if trees is None or reuse_fn is None:
            states, trees, move, value, targets = first_fn(
                states, sub, jbudget)
        else:
            states, trees, move, value, targets = reuse_fn(
                states, trees, prev_move, sub, jbudget,
                jnp.zeros(cfg.num_games, bool))
        prev_move = move
        value = np.asarray(value)
        if cfg.winrate_rollouts:
            col = np.maximum(to_move, 1) - 1
            upd = winrate[rows, col] - cfg.winrate_momentum * (
                winrate[rows, col] - value)
            winrate[rows, col] = np.where(active, upd, winrate[rows, col])
        records.append((active, np.asarray(move), value, to_move,
                        np.asarray(targets, dtype=np.float16), budget))
        if bool(np.all(np.asarray(states.done))):
            break

    territory = np.asarray(_final_territory(states))
    komis = np.asarray(states.komi)
    games = []
    for g in range(cfg.num_games):
        sgf_moves = []
        for active, move, value, to_move, targets, budget in records:
            if not active[g]:
                break
            sgf_moves.append(Played(
                to_move=int(to_move[g]), point=int(move[g]),
                value=float(value[g]), num_rollout=int(budget[g]),
                softmax=targets[g]).to_sgf())
        games.append(game_result_sgf(
            "".join(sgf_moves), komi=float(komis[g]),
            territory=territory[g]))
    return games


def _policy_stagger(predictor: Predictor, cfg: SelfPlayConfig,
                    search_cfg: SearchConfig, states: engine.GoState,
                    seed: int) -> engine.GoState:
    """Stagger the batch across game progress with policy-only moves.

    Slot ``g`` advances ~``g/B`` of a max game length by sampling directly
    from the policy head (the `--num-rollout 1` move rule,
    `self_play.rs:370-405`), so a continuous-batching benchmark window
    starts in steady state: completions arrive throughout the window
    instead of after one full game length (~hours at 1600 rollouts from a
    cold batch).  Slots whose game ends during warm-up restart fresh and
    keep advancing.  The resulting games mix a policy-played prefix with a
    searched suffix — benchmark material, NOT training data.
    """
    import numpy as np

    from .policy import PolicyPlayer, _build_move_fn

    b = states.stones.shape[0]
    player = PolicyPlayer(predictor, temperature=search_cfg.temperature,
                          cutoff_percentile=search_cfg.cutoff_percentile,
                          ladder_features=search_cfg.ladder_features,
                          feature_set=search_cfg.feature_set)
    move_fn = _build_move_fn(player)
    targets = jnp.asarray((np.arange(b) * cfg.max_moves) // b, jnp.int32)
    chunk = 64  # one modest program called ~12x: a single max_moves-trip
    #             fori_loop is the same math but a much larger XLA program,
    #             which the remote-tunnel platform handles poorly

    @jax.jit
    def warm_chunk(states, rng, i0):
        def body(j, carry):
            states, key = carry
            key, k1 = jax.random.split(key)
            stepped, *_ = move_fn(states, k1)
            stepped = _reset_slots(stepped, stepped.done, stepped.komi,
                                   cfg.history_len)
            adv = (i0 + j) < targets
            pick = lambda a, o: jnp.where(
                adv.reshape((b,) + (1,) * (o.ndim - 1)), a, o)
            return jax.tree_util.tree_map(pick, stepped, states), key

        states, _ = jax.lax.fori_loop(0, chunk, body, (states, rng))
        return states

    key = jax.random.PRNGKey(seed ^ 0x5744)
    for i0 in range(0, cfg.max_moves, chunk):
        key, sub = jax.random.split(key)
        states = warm_chunk(states, sub, jnp.int32(i0))
    return states


@functools.partial(jax.jit, static_argnums=(3,))
def _reset_slots(states: engine.GoState, mask: jax.Array,
                 new_komi: jax.Array, history_len: int) -> engine.GoState:
    """Replace masked slots with fresh initial states (continuous refill)."""
    b = states.stones.shape[0]
    fresh = engine.new_states(b, komi=0.0,
                              history_len=history_len).replace(komi=new_komi)
    pick = lambda f, o: jnp.where(
        mask.reshape((b,) + (1,) * (o.ndim - 1)), f, o)
    return jax.tree_util.tree_map(pick, fresh, states)


def search_self_play_continuous(predictor: Predictor, cfg: SelfPlayConfig,
                                search_cfg: SearchConfig | None = None,
                                seed: int = 0, batch: int = 256,
                                refill_every: int = 8,
                                sym_average: bool = False,
                                sharding=None,
                                game_times: list | None = None,
                                deadline_s: float | None = None,
                                stats: dict | None = None,
                                stagger_warmup: bool = False,
                                initial_states: engine.GoState | None = None,
                                ) -> list[str]:
    """Full-search self-play with continuous batching: finished games are
    replaced by fresh ones so the device batch stays full of live games.

    The lockstep driver (`search_self_play`) runs its whole batch until the
    LAST game ends, so late in a batch most slots ride along finished — the
    long-tail waste the reference avoids with per-game worker threads
    (`self_play.rs:461-499` pulls a new game per thread as each ends).
    This is the TPU-native equivalent of that worker-pool behavior: every
    ``refill_every`` moves, finished slots are flushed (scored, recorded)
    and reset to fresh games with fresh trees (``fresh_mask`` in
    `search_with_reuse`) and reset winrate budgets.  Plays until
    ``cfg.num_games`` games have completed and returns their SGF lines —
    the sustained-throughput (games/s) mode used for production self-play
    and the bench.

    ``deadline_s`` (optional) stops the loop that many wall seconds after
    the FIRST move returns (jit compile + program load excluded — minutes
    through a remote-tunnel platform) even if fewer than ``cfg.num_games``
    games completed — the bench's fixed-window mode (completed games are
    still returned).

    ``stats`` (optional dict) receives ``move_events``: one
    ``(monotonic_time, active_games, charged_sims)`` tuple per search-move
    iteration, appended after the device sync.  A cold batch takes a full
    game length (~hours at 1600 rollouts) before its first completion, so
    a fixed-window bench observes zero completions; the steady-state rate
    is still fully determined by the aggregate move rate (completions/s =
    moves/s ÷ mean game length in steady state), which these events
    measure directly.
    """
    search_cfg = search_cfg or SearchConfig()
    if sym_average:
        predictor = symmetrize(predictor)
    rng_np = np.random.default_rng(seed)
    if initial_states is not None:
        # pre-staggered (or otherwise prepared) boards, e.g. from a
        # separate warm-up process (`bench.py --selfplay-warmup`)
        states = initial_states
        batch = int(states.stones.shape[0])
    else:
        komi0 = random_komi(batch, seed) if cfg.random_komi \
            else np.full(batch, cfg.komi, np.float32)
        states = engine.new_states(batch, komi=cfg.komi,
                                   history_len=cfg.history_len)
        states = states.replace(komi=jnp.asarray(komi0))
    if sharding is not None:
        states = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), states)
    if stagger_warmup and initial_states is None:
        # steady-state benchmarking: spread the batch across game progress
        # so completions arrive throughout a fixed window (see
        # `_policy_stagger` — the emitted games are bench material only)
        states = _policy_stagger(predictor, cfg, search_cfg, states, seed)
    first_fn, reuse_fn = _build_search_move_fn(
        predictor, search_cfg, cfg.num_rollout, cfg.temperature_moves,
        tree_reuse=True)
    key = jax.random.PRNGKey(seed)

    winrate = np.full((batch, 2), 0.5, np.float32)
    rows = np.arange(batch)
    records = []                 # time-major, as in the lockstep driver
    rec_base = 0                 # global index of records[0] (prefix trim)
    episode_start = np.zeros(batch, np.int64)
    fresh_mask = np.zeros(batch, bool)
    games: list[str] = []
    trees, prev_move = None, None
    move_i = 0
    # hard bound so a pathological predictor cannot spin forever
    max_total = cfg.max_moves * (cfg.num_games + batch)

    def flush_and_refill():
        nonlocal states, records, rec_base
        done = np.asarray(states.done) | (
            np.asarray(states.move_count) >= cfg.max_moves)
        if not done.any():
            return
        territory = np.asarray(_final_territory(states))
        komis = np.asarray(states.komi)
        for g in np.flatnonzero(done):
            sgf_moves = []
            for rec in records[int(episode_start[g]) - rec_base:]:
                active, move, value, to_move, targets, budget = rec
                if not active[g]:
                    break
                sgf_moves.append(Played(
                    to_move=int(to_move[g]), point=int(move[g]),
                    value=float(value[g]), num_rollout=int(budget[g]),
                    softmax=targets[g]).to_sgf())
            games.append(game_result_sgf(
                "".join(sgf_moves), komi=float(komis[g]),
                territory=territory[g]))
            if game_times is not None:
                game_times.append(time.monotonic())
        refill_komi = np.where(
            done,
            random_komi(batch, int(rng_np.integers(1, 2**31)))
            if cfg.random_komi else np.full(batch, cfg.komi, np.float32),
            komis).astype(np.float32)
        states = _reset_slots(states, jnp.asarray(done),
                              jnp.asarray(refill_komi), cfg.history_len)
        winrate[done] = 0.5
        episode_start[done] = rec_base + len(records)
        fresh_mask[done] = True
        # drop flushed record prefixes to bound host memory
        lo = int(episode_start.min())
        if lo > rec_base:
            records = records[lo - rec_base:]
            rec_base = lo

    # the deadline clock starts AFTER the first move returns: the first
    # iteration carries jit compile + program load (minutes through a
    # remote-tunnel platform), which would otherwise consume most of a
    # fixed measurement window
    t_deadline = None
    while len(games) < cfg.num_games and move_i < max_total and (
            t_deadline is None or time.monotonic() < t_deadline):
        key, sub = jax.random.split(key)
        active = ~np.asarray(states.done)
        to_move = np.asarray(states.to_move)
        if cfg.winrate_rollouts:
            w = winrate[rows, np.maximum(to_move, 1) - 1]
            m = np.maximum(4.0 * w * (1.0 - w), 0.1)
            budget = (m * cfg.num_rollout).astype(np.int32)
        else:
            budget = np.full(batch, cfg.num_rollout, np.int32)
        jbudget = jnp.asarray(budget)
        if trees is None:
            states, trees, move, value, targets = first_fn(
                states, sub, jbudget)
        else:
            states, trees, move, value, targets = reuse_fn(
                states, trees, prev_move, sub, jbudget,
                jnp.asarray(fresh_mask))
        fresh_mask[:] = False
        prev_move = move
        value = np.asarray(value)
        if stats is not None:
            stats.setdefault("move_events", []).append(
                (time.monotonic(), int(active.sum()),
                 int(budget[active].sum()) if active.any() else 0))
        if cfg.winrate_rollouts:
            col = np.maximum(to_move, 1) - 1
            upd = winrate[rows, col] - cfg.winrate_momentum * (
                winrate[rows, col] - value)
            winrate[rows, col] = np.where(active, upd, winrate[rows, col])
        records.append((active, np.asarray(move), value, to_move,
                        np.asarray(targets, dtype=np.float16), budget))
        move_i += 1
        if move_i == 1 and deadline_s is not None:
            t_deadline = time.monotonic() + deadline_s
        if move_i % refill_every == 0:
            flush_and_refill()

    return games[:cfg.num_games]
