"""Unified configuration for engine, search, self-play, and training.

Re-designs the reference's two config systems into one set of dataclasses:
- the Rust argv/`DG_OPTS` flag globals with visit-count-interpolated schedules
  (`src/libdg_utils/config.rs:93-196`, interpolation `config.rs:297-313`)
- the trainer argparse params persisted into checkpoints
  (`contrib/trainer/dream_tf/__main__.py:147-207`)

Schedules are piecewise-linear tables over the *total visit count* of the
search so far, written ``"100=1.87,200=1.49,..."`` exactly like the reference
(tunable by CLOP, `contrib/clop/README.md`).  :func:`Schedule.at` is jittable.

Environment overrides: every scalar/schedule can be overridden via the
``DG_OPTS`` environment variable (semicolon-separated ``NAME=VALUE`` pairs) or
a per-name ``DG_<NAME>`` variable, mirroring `config.rs`'s env handling.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Schedule:
    """Piecewise-linear schedule keyed by total visit count.

    Parity with `src/libdg_utils/config.rs:297-313` (`get_intp_value`): values
    are linearly interpolated between the two neighbouring knots and clamped at
    the ends.
    """

    knots: tuple[tuple[float, float], ...]  # (visits, value), ascending

    @staticmethod
    def parse(text: str) -> "Schedule":
        knots = []
        for part in str(text).split(","):
            part = part.strip()
            if not part:
                continue
            if "=" in part:
                k, v = part.split("=")
                knots.append((float(k), float(v)))
            else:
                knots.append((0.0, float(part)))
        knots.sort()
        return Schedule(tuple(knots))

    @staticmethod
    def constant(value: float) -> "Schedule":
        return Schedule(((0.0, float(value)),))

    def at(self, visits):
        """Interpolated value at the given visit count (jittable)."""
        xs = jnp.asarray([k for k, _ in self.knots], jnp.float32)
        ys = jnp.asarray([v for _, v in self.knots], jnp.float32)
        return jnp.interp(jnp.asarray(visits, jnp.float32), xs, ys)

    def at_host(self, visits: float) -> float:
        xs = np.asarray([k for k, _ in self.knots])
        ys = np.asarray([v for _, v in self.knots])
        return float(np.interp(visits, xs, ys))


def _env_override(name: str, default: Any) -> Any:
    """DG_OPTS / DG_<NAME> environment overrides (config.rs parity)."""
    opts = os.environ.get("DG_OPTS", "")
    value = None
    for pair in opts.split(";"):
        if "=" in pair:
            k, v = pair.split("=", 1)
            if k.strip().upper() == name.upper():
                value = v.strip()
    value = os.environ.get(f"DG_{name.upper()}", value)
    if value is None:
        return default
    if isinstance(default, Schedule):
        return Schedule.parse(value)
    if isinstance(default, bool):
        return value.lower() in ("1", "true", "yes")
    return type(default)(value)


@dataclasses.dataclass(frozen=True)
class SearchConfig:
    """MCTS hyperparameters (defaults match `src/libdg_utils/config.rs`)."""

    num_rollout: int = 1600            # config.rs:133
    # UCT exploration constant schedule (config.rs:190-191)
    uct_exp: Schedule = dataclasses.field(
        default_factory=lambda: Schedule.parse("44=1.87,2536=1.48"))
    # first-play-urgency reduction schedule (config.rs:181-182)
    fpu_reduce: Schedule = dataclasses.field(
        default_factory=lambda: Schedule.parse("44=0.67,3817=0.46"))
    # LCB critical value z(m) schedule (config.rs:194-195)
    critical_value: Schedule = dataclasses.field(
        default_factory=lambda: Schedule.parse("1=0.0,44=1.49,200=2.12"))
    dirichlet_noise: float = 0.25      # mixing beta (lib.rs:162-165)
    dirichlet_alpha: float = 0.03
    temperature: float = 0.7           # config.rs:171-172
    softmax_temperature: float = 1.0   # config.rs:176-177
    vloss_cnt: int = 2                 # virtual-loss count per pending probe
    batch_size: int = 16               # leaf minibatch (config.rs:137)
    max_nodes: int = 0                 # 0 => num_rollout + 8
    root_symmetries: int = 1           # 8 => full_forward 8-symmetry root eval
    cutoff_percentile: float = 0.5     # choose.rs pruning percentile
    deterministic: bool = False
    ladder_features: bool = False      # feature planes 30/31.  The reference
    #                                    always computes them (features.rs:
    #                                    101-148); here they default OFF as a
    #                                    measured disposition: with the exact
    #                                    Pallas kernel in the fused flagship
    #                                    search the chip runs 9.7k sims/s vs
    #                                    28.9k without planes (+199%,
    #                                    tools/measure_ladder_cost.py) — so
    #                                    the default training contract
    #                                    excludes them and the weights JSON
    #                                    carries the flag either way.
    #                                    Serving a net whose contract
    #                                    includes them flips this on
    #                                    automatically (cli).
    ladders_exact: bool | None = None  # exact branching DFS; False = greedy
    #                                    single line (97.9% per-candidate
    #                                    agreement on real games); None =
    #                                    auto: exact on tpu (the Pallas
    #                                    kernel makes it the fast path),
    #                                    greedy elsewhere.  ONE flag drives
    #                                    BOTH the root eval and the fused
    #                                    leaf path, so the net always sees
    #                                    planes 30/31 under one semantics.
    adaptive: bool | None = None       # EARLY-C chunked early termination;
    #                                    None = auto (on for tpu backend)
    children_slots: int = 32           # sparse child slots per non-root tree
    #                                    node.  The reference stores full
    #                                    prior[368] per node but keeps edges
    #                                    in an 8-slot sparse table until
    #                                    promotion (`tree.rs:535-991`); here
    #                                    the root is always "promoted"
    #                                    (full-width arrays) and non-root
    #                                    nodes never are — 32 slots cover
    #                                    the fan-out a non-root node reaches
    #                                    in practice, and a re-rooted child
    #                                    regains full width every move.
    reuse_budget: bool = True          # reference RolloutLimit semantics
    #                                    (`rollout_limit.rs:18-45` compares
    #                                    root.total_count to the limit): a
    #                                    reused subtree's visits count
    #                                    toward the per-move budget, so
    #                                    reuse TOPS UP to num_rollout
    #                                    instead of adding a full fresh
    #                                    budget on top.  False restores the
    #                                    round-4 behaviour (fresh budget
    #                                    per move regardless of reuse).
    feature_kernel: bool = False       # Pallas liberties-after kernel (TPU)
    step_kernel: bool = False          # Pallas env-step for leaf expansion
    fused: bool | None = None          # fused leaf kernel (step+features+
    #                                    masks in one Pallas pass, TPU);
    #                                    tree states kept in kernel layout;
    #                                    None = auto (on for tpu backend)
    feature_set: str = "v1"            # input plane family ("v1" / "v2")

    def resolved_max_nodes(self) -> int:
        return self.max_nodes if self.max_nodes > 0 else self.num_rollout + 8

    def resolve_auto(self) -> "SearchConfig":
        """Fill the ``None`` (auto) knobs for the active backend.

        ``fused`` and ``adaptive`` default to the production search stack on
        real chips (bench-measured ~3.5x the portable XLA path) and to the
        portable path on CPU, where Pallas would need interpret mode.
        ``ladders_exact`` defaults to exact on tpu (the Pallas ladder kernel
        is both exact and fast there) and greedy elsewhere, so the root eval
        and the fused leaf path always compute planes 30/31 under the same
        semantics.  An explicit ``True``/``False`` from the caller always
        wins — the auto default never overrides an opt-out
        (`--no-fused`/`--no-adaptive`).
        """
        import jax

        on_tpu = jax.default_backend() == "tpu"
        fused = on_tpu if self.fused is None else self.fused
        adaptive = on_tpu if self.adaptive is None else self.adaptive
        exact = on_tpu if self.ladders_exact is None else self.ladders_exact
        if (fused == self.fused and adaptive == self.adaptive
                and exact == self.ladders_exact):
            return self
        return dataclasses.replace(self, fused=fused, adaptive=adaptive,
                                   ladders_exact=exact)


@dataclasses.dataclass(frozen=True)
class SelfPlayConfig:
    """Self-play driver settings (`src/libdg_mcts/self_play.rs`)."""

    num_games: int = 1024              # parallel games (batch dim)
    num_rollout: int = 1600
    ex_it: bool = False
    ex_it_fraction: float = 0.05       # self_play.rs:315-319
    max_moves: int = 722               # self_play.rs move cap
    temperature_moves: int = 8         # sample w/ temperature for first 8 moves
    resign_threshold: float = 0.05
    komi: float = 7.5
    random_komi: bool = False          # lib.rs:210-224 komi distribution
    history_len: int = 64              # super-ko hash ring (SmallSet64 parity)
    ladder_features: bool = False      # feature planes 30/31 (reference: on;
    #                                    see SearchConfig.ladder_features)
    winrate_rollouts: bool = True      # self_play.rs:232-241 budget scaling
    winrate_momentum: float = 0.2      # self_play.rs:36 MOMENTUM


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Network architecture (`contrib/trainer/dream_tf/__main__.py:154-156`)."""

    num_channels: int = 128
    num_blocks: int = 9
    num_samples: int = 8               # policy-head channels
    num_features: int = 32             # input planes (32 for v1, 18 for v2)
    feature_set: str = "v1"            # "v1" (default) or "v2"
    ladder_features: bool = False      # input contract: were planes 30/31
    #                                    populated when this net was trained?
    #                                    (carried in the weights JSON so
    #                                    serving auto-configures the search;
    #                                    reference nets: always True, here
    #                                    default False — a measured TPU
    #                                    disposition, see SearchConfig)
    compute_dtype: str = "bfloat16"
    remat: bool = False                # recompute residual-block activations
    #                                    in backward (recompute_grad.py:25-56
    #                                    semantics via jax.checkpoint); off by
    #                                    default -- at 9x128 the activations
    #                                    fit HBM comfortably


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Trainer settings (`contrib/trainer/dream_tf/__main__.py:36-39,149`)."""

    batch_size: int = 2048
    max_examples: int = 524_288_000
    initial_lr: float = 3e-4
    warm_start_lr: float = 1e-4
    lr_decay: float = 3.0              # divide by 3 on plateau
    min_lr: float = 1e-5               # stop below this
    l2_coef: float = 1e-4              # decoupled L2 (model_fn.py:104)
    max_norm: bool = True              # conv column-norm clip (layers:33-50)
    policy_coef: float = 0.12          # model_fn.py:48-78
    value_coef: float = 1.0
    ownership_coef: float = 1.0
    label_smoothing: float = 0.2
    history_dropout: float = 0.05      # input_fn.py:124-138
    shuffle_buffer: int = 262_144
    plateau_window: int = 4096         # hooks/learning_rate.py:34
    checkpoint_every: int = 10_000


@dataclasses.dataclass(frozen=True)
class Config:
    search: SearchConfig = dataclasses.field(default_factory=SearchConfig)
    self_play: SelfPlayConfig = dataclasses.field(default_factory=SelfPlayConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    @staticmethod
    def from_env() -> "Config":
        """Build the default config with DG_OPTS / DG_* env overrides applied."""
        search = SearchConfig(
            num_rollout=_env_override("NUM_ROLLOUT", SearchConfig.num_rollout),
            uct_exp=_env_override("UCT_EXP", Schedule.parse("44=1.87,2536=1.48")),
            fpu_reduce=_env_override("FPU_REDUCE", Schedule.parse("44=0.67,3817=0.46")),
            critical_value=_env_override(
                "CRITICAL_VALUE", Schedule.parse("1=0.0,44=1.49,200=2.12")),
            dirichlet_noise=_env_override("DIRICHLET_NOISE", SearchConfig.dirichlet_noise),
            temperature=_env_override("TEMPERATURE", SearchConfig.temperature),
            softmax_temperature=_env_override(
                "SOFTMAX_TEMPERATURE", SearchConfig.softmax_temperature),
            vloss_cnt=_env_override("VLOSS_CNT", SearchConfig.vloss_cnt),
            batch_size=_env_override("BATCH_SIZE", SearchConfig.batch_size),
        )
        self_play = SelfPlayConfig(
            num_games=_env_override("NUM_GAMES", SelfPlayConfig.num_games),
            num_rollout=search.num_rollout,
        )
        return Config(search=search, self_play=self_play)
