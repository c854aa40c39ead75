"""Input pipeline: big-SGF lines -> training example batches.

Replaces the reference's TextLineDataset + C++/Rust extraction stack
(`contrib/trainer/dream_tf/input_fn.py`, `libdg_tf/sgf_to_features.cc`,
`src/libdg_go/utils/extract_example.rs`): SGF parsing happens on the host,
board replay + feature extraction + D8 augmentation run vectorized on device.

Reference semantics preserved:
- one example per game line per visit, position drawn with the value-weighted
  distribution favouring |v - 0.5| close to 0 (`extract_example.rs:235-266`);
- when the game is scored but lacks the final passes, two passes are appended
  (`extract_example.rs:199-214`); games shorter than 30 moves are dropped
  (`:216-219`);
- policy label = recorded search distribution (P[...]) with the residual mass
  added at the played move, else a one-hot of the played move
  (`sgf_to_features.cc:240-241`);
- value label = +1 if the player to move won else -1; ownership labels are
  +-1 relative to the player to move from TB/TW (`extract_example.rs:329-371`);
- random D8 augmentation of features/policy/ownership and 5% history-plane
  dropout (`input_fn.py:101-138`).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..go import engine, features
from ..go.topology import SYM
from ..utils import sgf
from ..selfplay.replay import (lz_features, states_and_stone_history_at,
                               states_at, states_at_multi)


@dataclasses.dataclass
class ParsedGame:
    moves: np.ndarray          # int32[T]
    colors: np.ndarray         # int8[T] 1/2 per move
    values: np.ndarray         # f32[T] to-move win rate (nan if absent)
    policies: list             # list[None | f16[362]]
    winner: int
    komi: float
    ownership: np.ndarray      # int8[361] 0/1/2 (absolute colors)


def parse_game(line: str) -> ParsedGame | None:
    game = sgf.parse_line(line)
    if game is None:
        return None
    moves = [m.point for m in game.moves]
    colors = [m.color for m in game.moves]
    values, policies = [], []
    pass_count = 0
    for m in game.moves:
        pass_count = pass_count + 1 if m.point == engine.PASS else 0
        if m.value is None:
            values.append(np.nan)
        else:  # V[] is black-perspective in [-1, 1]
            wr = (m.value + 1.0) / 2.0
            values.append(wr if m.color == 1 else 1.0 - wr)
        policies.append(m.policy)
    # append missing final passes on scored games
    if game.score is not None:
        while pass_count < 2:
            moves.append(engine.PASS)
            colors.append(3 - colors[-1] if colors else 1)
            values.append(np.nan)
            policies.append(None)
            pass_count += 1
    if len(moves) < 30:
        return None
    ownership = np.zeros(361, np.int8)
    ownership[game.black_territory] = 1
    ownership[game.white_territory] = 2
    return ParsedGame(
        moves=np.asarray(moves, np.int32),
        colors=np.asarray(colors, np.int8),
        values=np.asarray(values, np.float32),
        policies=policies, winner=game.winner, komi=game.komi,
        ownership=ownership)


def choose_position(game: ParsedGame, rng: np.random.Generator) -> int:
    """Value-weighted position choice (`extract_example.rs:235-266`).

    When any position has a recorded policy, only those are candidates."""
    has_policy = any(p is not None for p in game.policies)
    cand = [i for i in range(len(game.moves))
            if not has_policy or game.policies[i] is not None]
    w = np.empty(len(cand))
    for j, i in enumerate(cand):
        v = game.values[i]
        w[j] = 0.5 if np.isnan(v) else 0.6 - abs(v - 0.5)
    w = np.maximum(w, 1e-6)
    return int(cand[rng.choice(len(cand), p=w / w.sum())])


def make_labels(game: ParsedGame, pos: int) -> dict:
    """Host-side labels for the example at position ``pos``."""
    color = int(game.colors[pos])
    policy = np.zeros(362, np.float32)
    blob = game.policies[pos]
    if blob is not None:
        policy[:] = np.asarray(blob[:362], np.float32)
    total = float(policy.sum())
    policy[game.moves[pos]] += max(0.0, 1.0 - total)

    value = 1.0 if game.winner == color else -1.0
    if game.winner == 0:
        value = 0.0

    own = np.zeros(361, np.float32)
    own[game.ownership == color] = 1.0
    own[game.ownership == (3 - color)] = -1.0
    return dict(policy=policy, value=np.float32(value), ownership=own,
                has_ownership=np.float32(1.0 if game.ownership.any() else 0.0))


class ExampleSource:
    """Iterates shuffled example batches from big-SGF lines.

    Two modes:

    - per-batch (default): every batch replays ``batch_size //
      positions_per_game`` fresh games on device and draws
      ``positions_per_game`` value-weighted positions from each.
    - banked (``bank_games > 0``): ONE device replay over ``bank_games``
      games builds a device-resident example bank (pre-augmentation
      features + labels); batches then just gather rows and apply the
      random D8 augmentation / history dropout per draw.  This amortizes
      the sequential replay scan — by far the dominant input cost on TPU —
      across the whole training segment, the way shuffled-window pipelines
      do, at the cost of positions being fixed for the bank's lifetime.
    """

    def __init__(self, lines: list[str], batch_size: int, seed: int = 0,
                 history_len: int = 16, augment: bool = True,
                 ladder_features: bool = False, lz_history: bool = False,
                 use_native: bool | None = None, feature_set: str = "v1",
                 positions_per_game: int = 1, bank_games: int = 0):
        self.ladder_features = ladder_features
        self.lz_history = lz_history
        self.feature_set = feature_set
        if lz_history:
            positions_per_game = 1  # the history ring is single-target
            bank_games = 0
        while batch_size % positions_per_game:
            positions_per_game -= 1  # largest divisor of the batch size
        self.positions_per_game = positions_per_game
        self.bank_games = bank_games
        self._bank = None
        if use_native is None:
            from .. import native
            use_native = native.available()
        self.use_native = use_native
        if use_native:
            from .. import native
            probe = native.extract_batch(lines, seed=1)
            self.lines = [l for l, ok in zip(lines, probe["valid"]) if ok]
            self.games = None
            if not self.lines:
                raise ValueError("no usable games")
        else:
            self.games = [g for g in (parse_game(l) for l in lines)
                          if g is not None]
            if not self.games:
                raise ValueError("no usable games")
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.history_len = history_len
        self.augment = augment
        self._key = jax.random.PRNGKey(seed)

    def batches(self, num_batches: int):
        if self.bank_games:
            yield from self._banked_batches(num_batches)
            return
        g = self.batch_size // self.positions_per_game
        for _ in range(num_batches):
            moves, targets, komi, labels = self._sample_arrays(g)
            self._key, sub = jax.random.split(self._key)
            yield _device_batch(
                jnp.asarray(moves), jnp.asarray(targets), jnp.asarray(komi),
                {key: jnp.asarray(v) for key, v in labels.items()},
                sub, self.history_len, self.augment, self.ladder_features,
                self.lz_history, self.feature_set)

    def _banked_batches(self, num_batches: int):
        b = self.batch_size
        for _ in range(num_batches):
            if self._bank is None:
                moves, targets, komi, labels = \
                    self._sample_arrays(self.bank_games)
                self._bank = _device_batch(
                    jnp.asarray(moves), jnp.asarray(targets),
                    jnp.asarray(komi),
                    {key: jnp.asarray(v) for key, v in labels.items()},
                    self._key, self.history_len, False,
                    self.ladder_features, False, self.feature_set)
            feats, labels = self._bank
            idx = jnp.asarray(
                self.rng.integers(0, feats.shape[0], b), jnp.int32)
            self._key, sub = jax.random.split(self._key)
            yield _bank_batch(feats, labels, idx, sub, self.augment,
                              self.feature_set)

    def _sample_arrays(self, g: int):
        """Host arrays for ``g`` games x K positions: (moves int32[G, T],
        targets int32[G, K], komi f32[G], labels dict of [G*K, ...])."""
        k = self.positions_per_game
        if self.use_native:
            from .. import native
            idx = self.rng.integers(0, len(self.lines), g)
            lines = [self.lines[i] for i in idx]
            # K independent value-weighted position draws per game: one
            # device replay serves K examples per game (states_at_multi)
            outs = [native.extract_batch(
                lines, seed=int(self.rng.integers(1, 2**62)))
                for _ in range(k)]
            out = outs[0]
            t_max = int(out["num_moves"].max())
            t_max = ((t_max + 127) // 128) * 128
            targets = np.stack([o["targets"] for o in outs], axis=1)
            label_of = lambda key: np.stack(
                [o[key] for o in outs], axis=1).reshape(
                    (g * k,) + out[key].shape[1:])
            labels = {key: label_of(key) for key in
                      ("policy", "value", "ownership", "has_ownership")}
            return out["moves"][:, :t_max], targets, out["komi"], labels

        games = [self.games[i]
                 for i in self.rng.integers(0, len(self.games), g)]
        t_max = max(len(gm.moves) for gm in games)
        t_max = ((t_max + 127) // 128) * 128
        moves = np.full((g, t_max), engine.PASS, np.int32)
        targets = np.zeros((g, k), np.int32)
        komi = np.zeros(g, np.float32)
        labels = dict(policy=np.zeros((g * k, 362), np.float32),
                      value=np.zeros(g * k, np.float32),
                      ownership=np.zeros((g * k, 361), np.float32),
                      has_ownership=np.zeros(g * k, np.float32))
        for row, gm in enumerate(games):
            moves[row, :len(gm.moves)] = gm.moves
            komi[row] = gm.komi
            for j in range(k):
                pos = choose_position(gm, self.rng)
                targets[row, j] = pos
                ex = make_labels(gm, pos)
                for key in labels:
                    labels[key][row * k + j] = ex[key]
        return moves, targets, komi, labels


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def _device_batch(moves, targets, komi, labels, rng, history_len, augment,
                  ladder_features=False, lz_history=False,
                  feature_set="v1"):
    """Replay -> features -> random D8 augmentation + history dropout.

    With ``lz_history`` the labels dict gains an ``lz_features`` entry
    ([B,19,19,18] leela-zero planes) for distillation teachers.

    ``targets`` may be int32[G] (one example per replayed game) or
    int32[G, K] (K examples per replay — the batch is G*K examples in
    game-major order, matching the host-side label layout)."""
    if lz_history:
        if targets.ndim == 2:
            targets = targets[:, 0]
        states, hist = states_and_stone_history_at(moves, targets, komi,
                                                   history_len)
        labels = dict(labels,
                      lz_features=jax.vmap(lz_features)(states, hist))
    elif targets.ndim == 2:
        g, k = targets.shape
        states = states_at_multi(moves, targets, komi, history_len)
        states = jax.tree_util.tree_map(
            lambda x: x.reshape((g * k,) + x.shape[2:]), states)
    else:
        states = states_at(moves, targets, komi, history_len)
    feats = features.extract_batch(states, feature_set, ladder_features)
    if not augment:
        return feats, labels
    return _augment(feats, labels, rng, feature_set)


def _augment(feats, labels, rng, feature_set):
    """Random per-example D8 symmetry + 5% history-plane dropout."""
    b = feats.shape[0]
    k_sym, k_hist = jax.random.split(rng)
    sym = jax.random.randint(k_sym, (b,), 0, 8)
    perm = jnp.asarray(SYM)[sym]                          # [B, 361]

    flat = feats.reshape(b, 361, feats.shape[-1])
    feats = jnp.take_along_axis(flat, perm[:, :, None], axis=1) \
        .reshape(b, 19, 19, feats.shape[-1])

    pol, pol_pass = labels["policy"][:, :361], labels["policy"][:, 361:]
    pol = jnp.take_along_axis(pol, perm, axis=1)
    own = jnp.take_along_axis(labels["ownership"], perm, axis=1)
    labels = dict(labels, policy=jnp.concatenate([pol, pol_pass], 1),
                  ownership=own)
    if "lz_features" in labels:
        lz = labels["lz_features"].reshape(b, 361, 18)
        lz = jnp.take_along_axis(lz, perm[:, :, None], axis=1)
        labels = dict(labels, lz_features=lz.reshape(b, 19, 19, 18))

    # history-plane dropout: zero the last-move planes (3:5) 5% of the time
    # (v1 only — the v2 set has no history planes)
    if feature_set == "v1":
        drop = jax.random.uniform(k_hist, (b,)) < 0.05
        hist_mask = jnp.ones((feats.shape[-1],)).at[3:5].set(0.0)
        feats = jnp.where(drop[:, None, None, None],
                          feats * hist_mask, feats)
    return feats, labels


@functools.partial(jax.jit, static_argnums=(4, 5))
def _bank_batch(bank_feats, bank_labels, idx, rng, augment, feature_set):
    """Gather one batch from the device-resident example bank, then apply
    the same per-draw augmentation as the per-batch path."""
    feats = jnp.take(bank_feats, idx, axis=0)
    labels = {k: jnp.take(v, idx, axis=0) for k, v in bank_labels.items()}
    if not augment:
        return feats, labels
    return _augment(feats, labels, rng, feature_set)
