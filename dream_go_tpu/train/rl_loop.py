"""The closed reinforcement-learning loop: self-play -> replay -> learner.

Replaces the reference's file-and-shell pipeline (`README.md:63-93`:
dream_go --self-play | sgf2big | sgf2balance | shuf -> dream_tf --start ->
--dump -> next generation) with a single in-process driver:

- actor: batched self-play with the current weights (policy-only + ex-it or
  full search, per config);
- replay: a sliding window of recent games (sgf2recent semantics) with
  optional win-balancing (sgf2balance semantics);
- learner: train steps over the window with the reference losses;
- per generation: orbax checkpoint + big-SGF archive + weights JSON dump.

On a pod slice this loop runs per-host actors with a data-parallel learner
(see `parallel/mesh.py`); on one chip it alternates actor and learner phases.
"""

from __future__ import annotations

import collections
import dataclasses
import os
import re
import sys
import time

import jax

from ..config import ModelConfig, SearchConfig, SelfPlayConfig, TrainConfig
from ..mcts.predictor import net_predictor
from .pipeline import ExampleSource
from .train_loop import Trainer

_RESULT = re.compile(r"RE\[([BW])\+")


def balance_games(lines: list[str]) -> list[str]:
    """Equal black/white wins (sgf2balance)."""
    black = [l for l in lines if (m := _RESULT.search(l)) and m.group(1) == "B"]
    white = [l for l in lines if (m := _RESULT.search(l)) and m.group(1) == "W"]
    n = min(len(black), len(white))
    out = []
    for i in range(n):
        out.append(black[i])
        out.append(white[i])
    return out or lines  # never return an empty training set


@dataclasses.dataclass
class RLLoopConfig:
    generations: int = 10
    games_per_generation: int = 128
    train_steps_per_generation: int = 256
    positions_per_game: int = 8         # examples per replayed game per batch
    ex_it_batch: int = 256              # positions per ex-it search program
    bank_games: int = 1024              # games per example bank (0: per-batch
    #                                     replay; see ExampleSource)
    replay_window_games: int = 4096
    balance: bool = True
    use_search: bool = False            # False: policy-play (+ ex-it)
    ex_it: bool = True
    out_dir: str | None = None
    seed: int = 0
    use_mesh: bool = False              # shard actor+learner over all devices
    mesh_model: int = 1                 # tensor-parallel width for head kernels
    resume: bool = False                # continue from out_dir's last ckpt_NNNN
    #                                     + refill replay from gen_NNNN.sgf
    warm_restart: bool = False          # on resume, discard the plateau-LR
    #                                     state and restart the schedule at
    #                                     train_cfg.warm_start_lr (reference
    #                                     --warm-start semantics,
    #                                     __main__.py:36-39) — continues a run
    #                                     whose LR schedule ran to its floor


def run_rl_loop(model_cfg: ModelConfig, train_cfg: TrainConfig,
                selfplay_cfg: SelfPlayConfig, search_cfg: SearchConfig,
                loop_cfg: RLLoopConfig, log_fn=None) -> Trainer:
    """The product RL loop; with ``use_mesh`` both phases run on a device
    mesh: the actor's game batch is sharded over ``data`` and the learner is
    data-parallel (tensor-parallel head kernels over ``model``)."""
    import contextlib

    log = log_fn or (lambda msg: print(msg, file=sys.stderr, flush=True))
    start_gen = 0
    if loop_cfg.resume and loop_cfg.out_dir:
        ckpts = sorted(
            int(m.group(1)) for name in os.listdir(loop_cfg.out_dir)
            if (m := re.fullmatch(r"ckpt_(\d+)", name))
        ) if os.path.isdir(loop_cfg.out_dir) else []
        if ckpts:
            start_gen = ckpts[-1] + 1
            trainer = Trainer.restore(
                os.path.join(loop_cfg.out_dir, f"ckpt_{ckpts[-1]:04d}"),
                train_cfg)
            log(f"resume: generation {start_gen} from ckpt_{ckpts[-1]:04d}")
            if loop_cfg.warm_restart:
                from .lr_schedule import LearningRateScheduler
                trainer.scheduler = LearningRateScheduler(
                    train_cfg.warm_start_lr, train_cfg.lr_decay)
                log(f"resume: warm restart, lr schedule reset to "
                    f"{train_cfg.warm_start_lr:.2e}")
            # the checkpoint's recovered hyperparams win over the flags, so a
            # resume never has to restate --num-channels/--num-blocks
            # (`__main__.py:93-104` hyperparam-recovery semantics)
            model_cfg = trainer.model_cfg
            if (trainer.model_cfg.ladder_features
                    != selfplay_cfg.ladder_features):
                # the net's input contract wins over flags on resume
                lf = trainer.model_cfg.ladder_features
                log(f"resume: checkpoint ladder-feature contract = {lf}")
                selfplay_cfg = dataclasses.replace(
                    selfplay_cfg, ladder_features=lf)
                search_cfg = dataclasses.replace(
                    search_cfg, ladder_features=lf)
        else:
            trainer = Trainer.create(model_cfg, train_cfg,
                                     seed=loop_cfg.seed)
    else:
        trainer = Trainer.create(model_cfg, train_cfg, seed=loop_cfg.seed)

    # fill the auto (None) search knobs for the active backend: fused leaf
    # kernel + EARLY-C on real chips (the reference applies EARLY-C to every
    # search strategy, `time_control/mod.rs:48-70`), portable path on CPU.
    # An explicit fused=False/adaptive=False from the caller is respected.
    resolved = search_cfg.resolve_auto()
    if resolved is not search_cfg:
        search_cfg = resolved
        log(f"search: auto stack for {jax.default_backend()} backend "
            f"(fused={search_cfg.fused}, adaptive={search_cfg.adaptive})")

    mesh_ctx: contextlib.AbstractContextManager = contextlib.nullcontext()
    actor_sharding = None
    if loop_cfg.use_mesh:
        from ..parallel import mesh as M
        mesh = M.make_mesh(model=loop_cfg.mesh_model)
        log(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
        trainer.shard_over(mesh)
        actor_sharding = M.shard_batch(mesh)
        mesh_ctx = mesh

    with mesh_ctx:
        return _run_generations(trainer, model_cfg, train_cfg, selfplay_cfg,
                                search_cfg, loop_cfg, actor_sharding, log,
                                start_gen)


def _run_generations(trainer: Trainer, model_cfg: ModelConfig,
                     train_cfg: TrainConfig, selfplay_cfg: SelfPlayConfig,
                     search_cfg: SearchConfig, loop_cfg: RLLoopConfig,
                     actor_sharding, log, start_gen: int = 0) -> Trainer:
    replay: collections.deque[str] = collections.deque(
        maxlen=loop_cfg.replay_window_games)
    if start_gen and loop_cfg.out_dir:
        # refill the sliding window from the archived generations
        for g in range(max(0, start_gen - 16), start_gen):
            path = os.path.join(loop_cfg.out_dir, f"gen_{g:04d}.sgf")
            if os.path.exists(path):
                with open(path) as fh:
                    replay.extend(l.strip() for l in fh if l.strip())

    for gen in range(start_gen, loop_cfg.generations):
        predictor = net_predictor(model_cfg, trainer.state.params,
                                  trainer.state.batch_stats)
        sp_cfg = dataclasses.replace(
            selfplay_cfg, num_games=loop_cfg.games_per_generation)

        t0 = time.monotonic()
        if loop_cfg.use_search:
            from ..selfplay.search_play import search_self_play
            games = search_self_play(predictor, sp_cfg, search_cfg,
                                     seed=loop_cfg.seed + gen,
                                     sharding=actor_sharding)
            t_play, t_exit = time.monotonic() - t0, 0.0
        else:
            from ..selfplay.policy import PolicyPlayer, policy_self_play
            games = policy_self_play(
                PolicyPlayer(predictor,
                             ladder_features=sp_cfg.ladder_features),
                sp_cfg, seed=loop_cfg.seed + gen,
                sharding=actor_sharding)
            t_play = time.monotonic() - t0
            t_exit = 0.0
            if loop_cfg.ex_it:
                from ..selfplay.reanalyze import ex_it as run_ex_it
                games = run_ex_it(games, predictor, search_cfg,
                                  num_sims=selfplay_cfg.num_rollout,
                                  fraction=selfplay_cfg.ex_it_fraction,
                                  seed=loop_cfg.seed + gen,
                                  position_batch=loop_cfg.ex_it_batch)
                t_exit = time.monotonic() - t0 - t_play

        replay.extend(games)
        pool = balance_games(list(replay)) if loop_cfg.balance \
            else list(replay)
        log(f"gen {gen}: {len(games)} games, replay {len(replay)}, "
            f"training pool {len(pool)} "
            f"[play {t_play:.0f}s, ex-it {t_exit:.0f}s]")

        t1 = time.monotonic()
        source = ExampleSource(pool, batch_size=train_cfg.batch_size,
                               seed=loop_cfg.seed + gen,
                               ladder_features=sp_cfg.ladder_features,
                               positions_per_game=loop_cfg.positions_per_game,
                               bank_games=loop_cfg.bank_games)
        metrics = trainer.fit(source,
                              loop_cfg.train_steps_per_generation,
                              log_every=0)
        log(f"gen {gen}: loss {metrics.get('loss', float('nan')):.4f} "
            f"top1 {metrics.get('policy_top1', 0.0):.3f} "
            f"lr {trainer.scheduler.learning_rate:.2e} "
            f"[train {time.monotonic() - t1:.0f}s]")

        if loop_cfg.out_dir:
            os.makedirs(loop_cfg.out_dir, exist_ok=True)
            with open(os.path.join(loop_cfg.out_dir,
                                   f"gen_{gen:04d}.sgf"), "w") as fh:
                fh.write("\n".join(games) + "\n")
            trainer.save(os.path.abspath(
                os.path.join(loop_cfg.out_dir, f"ckpt_{gen:04d}")))
            from ..models import params as MP
            blob = MP.dump_json(model_cfg, trainer.state.params,
                                trainer.state.batch_stats)
            with open(os.path.join(loop_cfg.out_dir, "dream_go.json"),
                      "w") as fh:
                fh.write(blob)
            # per-generation copy so tools/arena.py can round-robin them
            with open(os.path.join(loop_cfg.out_dir,
                                   f"weights_{gen:04d}.json"), "w") as fh:
                fh.write(blob)
        if trainer.scheduler.should_stop:
            log(f"gen {gen}: learning rate floor reached, stopping")
            break

    return trainer
