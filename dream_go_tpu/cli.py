"""Command-line front-end: the `dream_go` binary equivalent.

Replaces `src/dg/main.rs:31-90`: ``--self-play [--ex-it]``, ``--reanalyze``,
``--bench``, ``--gtp`` (default), plus trainer procedures ``--start`` /
``--resume`` / ``--verify`` / ``--dump`` (from
`contrib/trainer/dream_tf/__main__.py:71-78`).  Self-play and reanalyze write
one SGF per line to stdout with progress on stderr, byte-compatible with the
reference pipeline (`README.md:63-74`).
"""

from __future__ import annotations

import argparse
import os
import sys


def _load_predictor(args):
    import jax

    from .config import ModelConfig
    from .mcts import predictor as P
    from .models import params as MP
    from .models import tower as T

    if args.weights:
        with open(args.weights) as fh:
            cfg, params = MP.load_json(fh.read())
        params = jax.tree_util.tree_map(jax.numpy.asarray, params)
        if args.ladder_features is None:
            # serving follows the net's input contract unless overridden
            args.ladder_features = cfg.ladder_features
        return P.net_predictor(cfg, params, folded=True,
                               softmax_temp=args.softmax_temperature)
    # no weights: random-init net (useful for smoke tests / first generation)
    cfg = ModelConfig(num_channels=args.num_channels,
                      num_blocks=args.num_blocks,
                      num_samples=args.num_samples)
    if args.ladder_features is None:
        args.ladder_features = cfg.ladder_features
    params, stats = T.init_tower(cfg, jax.random.PRNGKey(0))
    return P.net_predictor(cfg, params, stats,
                           softmax_temp=args.softmax_temperature)


def main(argv=None):
    parser = argparse.ArgumentParser(prog="dream_go_tpu")
    mode = parser.add_mutually_exclusive_group()
    mode.add_argument("--self-play", type=int, nargs="?", const=1,
                      metavar="N", help="generate N self-play games")
    mode.add_argument("--policy-play", type=int, nargs="?", const=1,
                      metavar="N", help="generate N policy-only games")
    mode.add_argument("--reanalyze", nargs="+", metavar="FILE",
                      help="re-annotate games from SGF files")
    mode.add_argument("--bench", action="store_true")
    parser.add_argument("--cpu", action="store_true",
                        help="run on local CPU instead of the TPU")
    parser.add_argument("--full", action="store_true",
                        help="bench: also report SGF/feature/MCTS rates")
    mode.add_argument("--gtp", action="store_true", default=False)
    mode.add_argument("--start", metavar="DATA", help="train from big SGF")
    mode.add_argument("--resume", metavar="CKPT", help="resume training")
    mode.add_argument("--verify", metavar="DATA", help="eval on big SGF")
    mode.add_argument("--dump", action="store_true",
                      help="dump weights JSON to stdout")
    mode.add_argument("--loop", type=int, metavar="GENS",
                      help="run the closed RL loop for N generations")
    mode.add_argument("--print", dest="print_tensors", nargs="*",
                      metavar="TENSOR",
                      help="print tensor statistics (no names) or values "
                           "(named tensors) of a model; parity with "
                           "`dream_tf --print` (__main__.py:246-268)")

    parser.add_argument("--weights", help="dream_go.json weights file")
    parser.add_argument("--checkpoint", help="orbax checkpoint dir")
    parser.add_argument("--lz-weights", help="leela-zero weights for "
                        "distillation (trainer) ")
    parser.add_argument("--ponder", action="store_true",
                        help="background search on opponent time (GTP)")
    parser.add_argument("--profile", metavar="DIR",
                        help="write a jax.profiler trace to DIR")
    parser.add_argument("--metrics", metavar="FILE",
                        help="append training metrics JSONL to FILE")
    parser.add_argument("--out-dir", default="models/rl",
                        help="output directory for --loop")
    parser.add_argument("--mesh", action="store_true",
                        help="--loop: shard actor+learner over all devices")
    parser.add_argument("--resume-loop", action="store_true",
                        help="--loop: continue from out-dir's last "
                             "checkpointed generation")
    parser.add_argument("--warm-restart", action="store_true",
                        help="--loop --resume-loop: reset the plateau-LR "
                             "schedule to the warm-start rate (continues a "
                             "run whose schedule reached its floor; "
                             "reference --warm-start semantics)")
    parser.add_argument("--mesh-model", type=int, default=1,
                        help="tensor-parallel width for head kernels")
    parser.add_argument("--positions-per-game", type=int, default=8,
                        help="--loop: training examples drawn per replayed "
                             "game (one device replay serves this many)")
    parser.add_argument("--bank-games", type=int, default=1024,
                        help="--loop: games replayed into the per-generation "
                             "example bank (0 disables banking)")
    parser.add_argument("--continuous", action="store_true",
                        help="--self-play: continuous batching (finished "
                             "games are replaced by fresh ones; --num-games "
                             "is the live batch width)")
    parser.add_argument("--ex-it", action="store_true")
    parser.add_argument("--num-rollout", type=int, default=1600)
    parser.add_argument("--num-games", type=int, default=128)
    parser.add_argument("--num-channels", type=int, default=128)
    parser.add_argument("--num-blocks", type=int, default=9)
    parser.add_argument("--num-samples", type=int, default=8)
    parser.add_argument("--batch-size", type=int, default=2048)
    parser.add_argument("--softmax-temperature", type=float, default=1.0)
    parser.add_argument("--komi", type=float, default=7.5)
    parser.add_argument("--ladder-features", action="store_true",
                        default=None, dest="ladder_features",
                        help="compute ladder planes 30/31 (the reference "
                             "always does; here they default OFF — measured "
                             "+199%% fused-search cost, ARCHITECTURE.md "
                             "'Ladder planes').  Unset: follow the loaded "
                             "net's input contract (the ladder_features:0 "
                             "tensor of the weights JSON)")
    parser.add_argument("--no-ladder-features", action="store_false",
                        default=None, dest="ladder_features",
                        help="skip ladder planes even if the loaded net's "
                             "contract enables them")
    parser.add_argument("--max-moves", type=int, default=None,
                        help="self-play: cap game length (default: engine "
                             "limit, 722 as in the reference)")
    parser.add_argument("--no-fused", action="store_true",
                        help="disable the fused Pallas leaf kernel (on by "
                             "default on a tpu backend)")
    parser.add_argument("--no-adaptive", action="store_true",
                        help="disable EARLY-C chunked early termination for "
                             "self-play searches (on by default on a tpu "
                             "backend; `time_control/mod.rs:48-70`)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--steps", type=int, default=1000)
    args = parser.parse_args(argv)

    if args.cpu:
        # hermetic local run for any mode; must precede first backend use
        # (the env var is consumed at interpreter startup, too late here)
        import jax
        jax.config.update("jax_platforms", "cpu")
    elif not os.environ.get("DG_NO_COMPILE_CACHE"):
        # persistent compilation cache: restarts of long runs (rl loop
        # supervisor, GTP servers) skip the remote compile service, whose
        # first-compiles cost minutes per program through the tunnel.
        # Accelerators only: XLA:CPU caches AOT machine code keyed loosely
        # enough that entries written under different XLA flags / hosts load
        # with mismatched machine features and crawl (observed: CPU self-play
        # hung loading stale AOT entries), and CPU compiles are cheap anyway.
        import jax
        backend = jax.default_backend()
        if backend != "cpu":
            cache = os.environ.get("DG_COMPILE_CACHE",
                                   f"/tmp/dream_go_tpu_jax_cache_{backend}")
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              2.0)

    from .config import SearchConfig, SelfPlayConfig

    profile_ctx = None
    if args.profile:
        import jax
        profile_ctx = jax.profiler.trace(args.profile)
        profile_ctx.__enter__()
    try:
        _run(args)
    finally:
        if profile_ctx is not None:
            profile_ctx.__exit__(None, None, None)


def _search_cfg(args, adaptive_ok=True, **kw):
    """SearchConfig with production defaults for the active backend: the
    fused Pallas leaf kernel and EARLY-C adaptive termination are on for
    real chips (bench-measured ~3.5x the portable path), off for CPU where
    Pallas would need interpret mode.  ``--no-fused``/``--no-adaptive``
    force the portable knobs off everywhere (incl. ``--loop``)."""
    from .config import SearchConfig

    kw.setdefault("ladder_features", args.ladder_features)
    kw.setdefault("fused", False if args.no_fused else None)
    kw.setdefault("adaptive",
                  False if (args.no_adaptive or not adaptive_ok) else None)
    return SearchConfig(**kw).resolve_auto()


def _run(args):
    import sys

    from .config import SearchConfig, SelfPlayConfig

    if args.loop:
        _rl_loop(args)
        return

    if args.bench:
        import bench
        bench.main()
        return

    if args.print_tensors is not None:
        _print_tensors(args)
        return

    if args.start or args.resume or args.verify or args.dump:
        _trainer_procedures(args)
        return

    if args.reanalyze:
        from .selfplay.reanalyze import ex_it as run_ex_it
        from .selfplay.reanalyze import reanalyze as run_reanalyze
        predictor = _load_predictor(args)
        lines = []
        for path in args.reanalyze:
            with open(path) as fh:
                lines.extend(l.strip() for l in fh if l.strip())
        fn = run_ex_it if args.ex_it else run_reanalyze
        for line in fn(lines, predictor, _search_cfg(args),
                       num_sims=args.num_rollout, seed=args.seed):
            print(line)
        return

    if args.self_play and args.continuous and args.num_rollout > 1:
        # one continuous-batching run produces the whole target: finished
        # games are replaced by fresh ones so the device batch stays full
        predictor = _load_predictor(args)
        total = args.self_play
        from .selfplay.search_play import search_self_play_continuous
        extra = {} if args.max_moves is None else \
            {"max_moves": args.max_moves}
        cfg = SelfPlayConfig(num_games=total, num_rollout=args.num_rollout,
                             komi=args.komi, ex_it=args.ex_it,
                             ladder_features=args.ladder_features, **extra)
        games = search_self_play_continuous(
            predictor, cfg,
            _search_cfg(args, num_rollout=args.num_rollout),
            seed=args.seed, batch=min(total, args.num_games))
        if args.ex_it:
            from .selfplay.reanalyze import ex_it as run_ex_it
            games = run_ex_it(
                games, predictor, _search_cfg(args),
                num_sims=args.num_rollout, seed=args.seed)
        for line in games:
            print(line, flush=True)
        return

    if args.self_play or args.policy_play:
        predictor = _load_predictor(args)
        total = args.self_play or args.policy_play
        done = 0
        batch = min(total, args.num_games)
        while done < total:
            n = min(batch, total - done)
            extra = {} if args.max_moves is None else \
                {"max_moves": args.max_moves}
            cfg = SelfPlayConfig(num_games=n, num_rollout=args.num_rollout,
                                 komi=args.komi, ex_it=args.ex_it,
                                 ladder_features=args.ladder_features,
                                 **extra)
            if args.policy_play or args.num_rollout <= 1:
                from .selfplay.policy import PolicyPlayer, policy_self_play
                games = policy_self_play(
                    PolicyPlayer(predictor,
                                 ladder_features=args.ladder_features),
                    cfg, seed=args.seed + done)
            else:
                from .selfplay.search_play import search_self_play
                games = search_self_play(
                    predictor, cfg,
                    _search_cfg(args, num_rollout=args.num_rollout),
                    seed=args.seed + done)
            if args.ex_it:
                from .selfplay.reanalyze import ex_it as run_ex_it
                games = run_ex_it(
                    games, predictor, _search_cfg(args),
                    num_sims=args.num_rollout, seed=args.seed + done)
            for line in games:
                print(line, flush=True)
            done += n
            print("." * n, file=sys.stderr, flush=True)
        return

    # default: GTP server
    from .gtp import GtpEngine, run_server
    predictor = _load_predictor(args)
    run_server(GtpEngine(
        predictor, _search_cfg(args, adaptive_ok=False),
        num_rollout=args.num_rollout, ponder=args.ponder, seed=args.seed))


def _rl_loop(args):
    from .config import ModelConfig, SelfPlayConfig, TrainConfig
    from .train.rl_loop import RLLoopConfig, run_rl_loop

    if args.ladder_features is None:
        args.ladder_features = ModelConfig.ladder_features

    run_rl_loop(
        ModelConfig(num_channels=args.num_channels,
                    num_blocks=args.num_blocks,
                    num_samples=args.num_samples,
                    ladder_features=args.ladder_features),
        TrainConfig(batch_size=args.batch_size),
        SelfPlayConfig(num_games=args.num_games,
                       num_rollout=args.num_rollout, komi=args.komi,
                       ladder_features=args.ladder_features),
        _search_cfg(args, num_rollout=args.num_rollout),
        RLLoopConfig(generations=args.loop,
                     games_per_generation=args.num_games,
                     ex_it=args.ex_it, out_dir=args.out_dir,
                     seed=args.seed, use_mesh=args.mesh,
                     mesh_model=args.mesh_model,
                     positions_per_game=args.positions_per_game,
                     bank_games=args.bank_games,
                     resume=args.resume_loop,
                     warm_restart=args.warm_restart))


def _print_tensors(args):
    """`--print`: tensor statistics / values of a model.

    Parity with `contrib/trainer/dream_tf/__main__.py:246-268`: without
    tensor names, print a JSON map ``{name: {mean, std}}`` over every dumped
    tensor; with names, print each tensor's values.  The model comes from
    ``--weights`` (reference-format JSON) or ``--checkpoint`` (orbax).
    """
    import json

    import numpy as np

    from .models import params as MP

    if args.weights:
        with open(args.weights) as fh:
            tensors = MP.decode_raw(fh.read())
    elif args.checkpoint:
        from .config import TrainConfig
        from .train.train_loop import Trainer
        trainer = Trainer.restore(args.checkpoint,
                                  TrainConfig(batch_size=args.batch_size))
        tensors = MP.decode_raw(MP.dump_json(
            trainer.model_cfg, trainer.dump_params(),
            trainer.state.batch_stats))
    else:
        raise SystemExit("--print needs --weights or --checkpoint")

    if not args.print_tensors:
        out = {name: {"mean": float(np.mean(v)), "std": float(np.std(v))}
               for name, v in tensors.items()}
        print(json.dumps(out, sort_keys=True, indent=4,
                         separators=(",", ": ")))
    else:
        for name in args.print_tensors:
            print(name, tensors[name].tolist())


def _trainer_procedures(args):
    from .config import ModelConfig, TrainConfig
    from .train.pipeline import ExampleSource
    from .train.train_loop import Trainer

    if args.ladder_features is None:
        args.ladder_features = ModelConfig.ladder_features
    tcfg = TrainConfig(batch_size=args.batch_size)
    data_path = args.start or args.resume or args.verify
    lines = None
    if data_path:
        with open(data_path) as fh:
            lines = [l.strip() for l in fh if l.strip()]

    # --resume DATA --checkpoint CKPT: restore weights, keep training on DATA
    if (args.resume or args.verify or args.dump) and args.checkpoint:
        trainer = Trainer.restore(args.checkpoint, tcfg)
    else:
        mcfg = ModelConfig(num_channels=args.num_channels,
                           num_blocks=args.num_blocks,
                           num_samples=args.num_samples,
                           ladder_features=args.ladder_features)
        # fresh model: seed the policy bias with the data's log move
        # frequency (the reference's policy_offset_op, computed not shipped)
        policy_bias = None
        if lines:
            from .train.train_loop import policy_bias_from_lines
            policy_bias = policy_bias_from_lines(lines[:2048])
        trainer = Trainer.create(mcfg, tcfg, seed=args.seed,
                                 policy_bias=policy_bias)

    if args.dump:
        from .models import params as MP
        print(MP.dump_json(trainer.model_cfg, trainer.dump_params(),
                           trainer.state.batch_stats))
        return
    source = ExampleSource(lines, batch_size=args.batch_size, seed=args.seed,
                           ladder_features=args.ladder_features,
                           lz_history=bool(args.lz_weights),
                           positions_per_game=args.positions_per_game,
                           bank_games=args.bank_games)
    if args.lz_weights:
        from .train.distill import DistillationSource
        source = DistillationSource(source, args.lz_weights)

    if args.verify:
        metrics = trainer.evaluate(source, num_batches=32)
        import json
        print(json.dumps(metrics))
        return

    trainer.fit(source, num_steps=args.steps,
                log_fn=lambda msg: print(msg, file=sys.stderr),
                metrics_path=args.metrics)
    if args.checkpoint:
        import os
        trainer.save(os.path.abspath(args.checkpoint))


if __name__ == "__main__":
    main()
