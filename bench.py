"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): env-steps/s/chip for batched self-play — 4096
parallel 19x19 boards stepped in lockstep (full legality incl. super-ko +
uniform-random move sampling + capture/merge updates), the vectorized
replacement for the reference's `--bench` MCTS/feature throughput
(`src/dg/bench/`).  ``vs_baseline`` is measured against the 100k
env-steps/s/chip north star.

Secondary metrics (stderr): NN forwards/s on the flagship 9x128 tower and
feature extractions/s.

Run plainly (``python bench.py``) to use the real TPU chip via the axon
platform; pass ``--cpu`` for a local smoke run.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def _is_oom(e: Exception) -> bool:
    """True only for device memory exhaustion; anything else must surface."""
    s = f"{type(e).__name__}: {e}"
    return ("RESOURCE_EXHAUSTED" in s or "Out of memory" in s
            or "exceeds the amount of memory available" in s
            or "Attempting to reserve" in s)


def _selfplay_subprocess(window_s: float = 600.0):
    """Orchestrate the self-play stage as TWO fresh child processes per
    ladder batch: policy-stagger warm-up, then the measured search window.

    The remote axon worker repeatedly crashed (UNAVAILABLE) when the big
    1600-rollout search program started in a process that had already run
    other device programs (the env/forward/sims stages, or even just the
    small warm-up programs), while the identical search runs clean from a
    fresh process.  The staggered boards cross processes as an npz file;
    the persistent compile cache keeps recompiles cheap.  A child crash or
    OOM steps the ladder down instead of killing the bench.
    """
    import subprocess
    import tempfile

    def run_search(npz):
        p = subprocess.run(
            [sys.executable, __file__, "--selfplay-search", npz],
            capture_output=True, text=True, timeout=3000)
        sys.stderr.write(p.stderr[-3000:])
        if p.returncode == 0:
            for line in reversed(p.stdout.strip().splitlines()):
                if line.strip().startswith("{"):
                    return json.loads(line)
        return None

    # preferred rung: policy-staggered boards -> completions-based games/s.
    # Known issue (round 5): the search child crashes the remote worker on
    # STAGGERED (mid-game) boards while running the identical program clean
    # on fresh boards — a data-dependent fault still unlocated (see
    # ARCHITECTURE.md).  The fresh-board rungs below keep the bench
    # producing a (marked, extrapolated) number until it is fixed.
    for sp_batch, staggered in ((256, True), (256, False), (128, False)):
        with tempfile.TemporaryDirectory() as td:
            npz = f"{td}/boards.npz"
            if staggered:
                w = subprocess.run(
                    [sys.executable, __file__, "--selfplay-warmup", npz,
                     str(sp_batch)],
                    capture_output=True, text=True, timeout=1800)
                sys.stderr.write(w.stderr[-2000:])
                if w.returncode != 0:
                    print(f"selfplay warmup failed at batch {sp_batch}",
                          file=sys.stderr)
                    continue
            else:
                # pure-numpy fresh boards (GoState schema, engine.py): the
                # parent must not touch the device — its backend may be
                # dead after a crashed child took the worker down
                import numpy as _np
                B, NN, PASS = sp_batch, 361, 361
                _np.savez(
                    npz,
                    stones=_np.zeros((B, NN), _np.int8),
                    chain_id=_np.tile(_np.arange(NN, dtype=_np.int32), (B, 1)),
                    chain_xor=_np.zeros((B, NN, 2), _np.uint32),
                    to_move=_np.full((B,), 1, _np.int8),
                    hash=_np.zeros((B, 2), _np.uint32),
                    hash_hist=_np.zeros((B, 64, 2), _np.uint32),
                    placed_count=_np.zeros((B,), _np.int32),
                    move_count=_np.zeros((B,), _np.int32),
                    pass_count=_np.zeros((B,), _np.int32),
                    last_two=_np.full((B, 2), PASS, _np.int32),
                    komi=_np.full((B,), 7.5, _np.float32),
                    done=_np.zeros((B,), bool))
            got = run_search(npz)
            if got is not None:
                got["selfplay_boards"] = ("staggered" if staggered
                                          else "fresh")
                return got
            print(f"selfplay search failed (batch {sp_batch}, "
                  f"{'staggered' if staggered else 'fresh'}); stepping down",
                  file=sys.stderr)
    raise RuntimeError("selfplay stage failed at every ladder rung")


def _stage_jax():
    import jax

    import os as _os
    cache = _os.environ.get("DG_COMPILE_CACHE",
                            "/tmp/dream_go_tpu_jax_cache_tpu")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return jax


def _stage_pred(jax):
    from dream_go_tpu.config import ModelConfig
    from dream_go_tpu.mcts.predictor import net_predictor
    from dream_go_tpu.models import tower as T

    mcfg = ModelConfig()
    mp, mstats = T.init_tower(mcfg, jax.random.PRNGKey(0))
    return net_predictor(mcfg, mp, mstats)


def _selfplay_warmup_main(npz_path: str, sp_batch: int):
    """Child 1: policy-stagger a fresh batch and save the boards."""
    import dataclasses

    import numpy as np

    jax = _stage_jax()
    from dream_go_tpu.config import SearchConfig, SelfPlayConfig
    from dream_go_tpu.go import engine
    from dream_go_tpu.selfplay.search_play import _policy_stagger

    pred = _stage_pred(jax)
    sp = SelfPlayConfig(num_games=100_000, num_rollout=1600)
    ssc = SearchConfig(num_rollout=1600).resolve_auto()
    states = engine.new_states(sp_batch, komi=sp.komi,
                               history_len=sp.history_len)
    states = _policy_stagger(pred, sp, ssc, states, seed=0)
    np.savez(npz_path, **{f.name: np.asarray(getattr(states, f.name))
                          for f in dataclasses.fields(states)})
    mc = np.asarray(states.move_count)
    print(f"warmup: batch {sp_batch} staggered, move_count "
          f"{mc.min()}..{mc.max()}", file=sys.stderr)


def _selfplay_search_main(npz_path: str):
    """Child 2: run the measured window from the staggered boards and
    print the metrics dict as one JSON line."""
    import jax.numpy as jnp
    import numpy as np

    jax = _stage_jax()
    from dream_go_tpu.go import engine

    data = np.load(npz_path)
    states = engine.new_states(int(data["stones"].shape[0]))
    states = states.replace(**{k: jnp.asarray(data[k]) for k in data.files})
    pred = _stage_pred(jax)
    print(json.dumps(_selfplay_stage(pred, initial_states=states)))


def _selfplay_stage(pred, window_s: float = 600.0, initial_states=None):
    """Sustained full-search self-play throughput (the reference's true
    headline: ~0.02 games/s at 1600 rollouts, `README.md:61-64`).

    The batch starts POLICY-STAGGERED across game progress
    (`search_play._policy_stagger`), so completions arrive throughout the
    window and games/s comes from actual completion timestamps — the
    moves/s extrapolation only remains as a marked fallback.  Returns a
    dict with:

      selfplay_games_per_sec   completions/s (or marked extrapolation)
      selfplay_rate_mode       "completions" | "extrapolated_moves_per_s"
      selfplay_sims_per_sec    charged simulations/s in the production
                               configuration (reuse top-up, winrate
                               budgets, EARLY-C) — the effective rate that
                               actually determines games/s, vs the
                               headline mcts_sims_per_sec
    """
    import numpy as np

    from dream_go_tpu.config import SearchConfig, SelfPlayConfig
    from dream_go_tpu.selfplay.search_play import search_self_play_continuous

    sp = SelfPlayConfig(num_games=100_000, num_rollout=1600)
    ssc = SearchConfig(num_rollout=1600).resolve_auto()
    game_times, sstats = [], {}
    sp_batch = int(initial_states.stones.shape[0]) \
        if initial_states is not None else 256
    t0 = time.time()
    games = search_self_play_continuous(
        pred, sp, ssc, seed=0, batch=sp_batch,
        game_times=game_times, deadline_s=window_s,
        stats=sstats, stagger_warmup=initial_states is None,
        initial_states=initial_states)
    dt = time.time() - t0
    out = {}

    ev = sstats.get("move_events", [])
    if len(ev) >= 4:
        # drop the first iteration (compile + first search)
        span_ev = max(ev[-1][0] - ev[1][0], 1e-9)
        out["selfplay_sims_per_sec"] = sum(e[2] for e in ev[2:]) / span_ev
        moves_per_s = sum(e[1] for e in ev[2:]) / span_ev
    else:
        moves_per_s = None

    ramp = 4
    if len(game_times) > ramp + 1:
        w = game_times[ramp:]
        rate = (len(w) - 1) / max(w[-1] - w[0], 1e-9)
        out["selfplay_games_per_sec"] = rate
        out["selfplay_rate_mode"] = "completions"
    elif moves_per_s is not None:
        # steady-state identity completions/s = moves/s / mean game length;
        # 452 measured over 768 production games (models/rl20
        # gen_00{00,46,47}.sgf) — only reachable when the window saw too
        # few completions for a direct measurement
        out["selfplay_games_per_sec"] = moves_per_s / 452.0
        out["selfplay_rate_mode"] = "extrapolated_moves_per_s"
    print(f"selfplay: {len(games)} completions in {dt:.0f}s (batch "
          f"{sp_batch}, 1600 rollouts, {len(ev)} search moves"
          + (f", {moves_per_s:.2f} moves/s" if moves_per_s else "")
          + (f", {out['selfplay_sims_per_sec']:,.0f} charged sims/s"
             if "selfplay_sims_per_sec" in out else "")
          + f"); games/s {out.get('selfplay_games_per_sec', 0):.4f} "
          f"[{out.get('selfplay_rate_mode', 'none')}]", file=sys.stderr)
    out["selfplay_batch"] = sp_batch
    return out


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    else:
        # persistent compile cache: measured rates are post-warmup either
        # way, this only keeps repeat runs from paying the remote compile
        # service minutes per program (cli.py semantics)
        import os
        cache = os.environ.get("DG_COMPILE_CACHE",
                               "/tmp/dream_go_tpu_jax_cache_tpu")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp
    import numpy as np

    from dream_go_tpu.go import engine

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    from dream_go_tpu.ops import env_step as K

    on_tpu = "--cpu" not in sys.argv
    batch = 4096 if on_tpu else 64

    def sync(states):
        # force a real device->host fetch: async dispatch through remote
        # platforms can make block_until_ready return early
        return int(np.asarray(jnp.sum(states.move_count)))

    states = engine.new_states(batch)
    weights = jnp.ones((batch, 361))

    if on_tpu:
        # headline path: the fused Pallas env-step kernel
        @jax.jit
        def one(states, seed):
            st, _ = K.env_step(states, weights, seed)
            return st
    else:
        # CPU smoke run: the XLA reference path (kernel needs interpret mode)
        @jax.jit
        def one(states, seed):
            key = jax.random.PRNGKey(seed)
            mask = engine.legal_mask_batch(states)[:, :361]
            logits = jnp.where(mask, 0.0, -jnp.inf)
            moves = jax.random.categorical(key, logits, axis=-1)
            moves = jnp.where(jnp.any(mask, axis=1), moves, engine.PASS)
            return engine.step_batch(states, moves.astype(jnp.int32))

    # warm up / compile (must FETCH: block_until_ready can return early)
    t0 = time.time()
    states = one(states, jnp.int32(1))
    sync(states)
    print(f"compile+first call: {time.time() - t0:.1f}s", file=sys.stderr)

    # measure (fetch-synced; dispatches pipeline); median of 5 repeats so
    # tunnel jitter does not move the headline between rounds
    calls = 30 if on_tpu else 8
    rates = []
    for rep in range(5):
        t0 = time.time()
        for c in range(calls):
            states = one(states, jnp.int32(100 + rep * calls + c))
        total_moves = sync(states)
        dt = max(time.time() - t0, 1e-9)
        rates.append(batch * calls / dt)
    steps_per_s = float(np.median(rates))
    print(f"env steps/s over 5 repeats of {batch * calls}: "
          f"min {min(rates):,.0f} median {steps_per_s:,.0f} "
          f"max {max(rates):,.0f} (moves on device: {total_moves})",
          file=sys.stderr)

    # secondary: NN forward throughput on the flagship tower
    try:
        from dream_go_tpu.config import ModelConfig
        from dream_go_tpu.models import tower as T

        cfg = ModelConfig()
        params, stats = T.init_tower(cfg, jax.random.PRNGKey(0))
        fwd_batch = 1024 if "--cpu" not in sys.argv else 32

        @jax.jit
        def fwd(x):
            out, _ = T.apply_tower(cfg, params, stats, x)
            return out.policy_logits

        x = jnp.zeros((fwd_batch, 19, 19, cfg.num_features))
        # warmup must FETCH: block_until_ready can return early on remote
        # platforms, leaving program-load cost to pollute the timed calls
        float(np.asarray(jnp.sum(fwd(x))))
        t0 = time.time()
        n = 8
        for _ in range(n):
            r = fwd(x)
        float(np.asarray(jnp.sum(r)))
        fps = fwd_batch * n / (time.time() - t0)
        print(f"nn forward/s (9x128, batch {fwd_batch}): {fps:,.0f}",
              file=sys.stderr)
        del params, stats, x, r
    except Exception as e:  # secondary metrics must not break the bench
        print(f"forward bench skipped: {e}", file=sys.stderr)

    # full-search production throughput (the reference's true headline is
    # GAMES/s: ~0.02 games/s at 1600 rollouts, `README.md:61-64`).  Two
    # always-on numbers land in the JSON line:
    #   mcts_sims_per_sec      raw fused-search simulation rate (9x128 net)
    #   selfplay_games_per_sec sustained continuous-batching self-play rate
    #                          (1600 rollouts, winrate budgets, EARLY-C)
    mcts_sims_per_sec = None
    selfplay = {}
    if on_tpu and "--no-selfplay" not in sys.argv:
        try:
            from dream_go_tpu.config import ModelConfig, SearchConfig
            from dream_go_tpu.mcts import search as S
            from dream_go_tpu.mcts.predictor import net_predictor
            from dream_go_tpu.models import tower as T

            mcfg = ModelConfig()
            mp, mstats = T.init_tower(mcfg, jax.random.PRNGKey(0))
            pred = net_predictor(mcfg, mp, mstats)

            # raw fused-search sims/s (batch 1024, fixed 16-sim chunks)
            mb, sims, reps = 1024, 16, 5
            scfg = SearchConfig(fused=True, adaptive=False).resolve_auto()
            mstates = engine.new_states(mb)
            trees = jax.jit(lambda st, r: S.init_trees(
                st, pred, r, scfg, sims * (reps + 2) + 1, None))(
                mstates, jax.random.PRNGKey(0))
            run = jax.jit(lambda t: S.run_search(t, pred, scfg, sims, None))
            trees = run(trees)
            int(np.asarray(jnp.sum(trees.node_n)))
            times = []
            for _ in range(reps):
                t0 = time.time()
                trees = run(trees)
                int(np.asarray(jnp.sum(trees.node_n)))
                times.append(time.time() - t0)
            mcts_sims_per_sec = mb * sims / float(np.median(times))
            print(f"mcts simulations/s (9x128, fused, batch {mb}): "
                  f"{mcts_sims_per_sec:,.0f}", file=sys.stderr)
            del trees, mstates

        except Exception as e:  # secondary metrics must not break the bench
            pred = None
            print(f"mcts sims bench skipped: {e}", file=sys.stderr)
        if pred is not None:
            # free the env-stage device buffers before the HBM-hungry
            # self-play stage (its own function: no stale locals)
            states = weights = None
            try:
                selfplay = _selfplay_subprocess()
            except Exception as e:
                # record the failure IN the JSON line (the driver archives
                # stdout): a missing-but-explained metric beats losing the
                # whole line to a flaky remote worker, and an all-sizes-OOM
                # regression still shows up as selfplay_error
                selfplay = {"selfplay_error":
                            f"{type(e).__name__}: {str(e)[:160]}"}
                print(f"selfplay stage failed: {e}", file=sys.stderr)

    # --full: the reference's remaining --bench categories (`src/dg/bench/`):
    # SGF parse/s, feature extraction/s, MCTS simulations/s
    if "--full" in sys.argv:
        try:
            from dream_go_tpu.utils import sgf as sgf_mod
            path = "/root/repo/tests/fixtures/sample_games.sgf"
            with open(path) as fh:
                lines = [l.strip() for l in fh if l.strip()]
            reps = 200
            t0 = time.time()
            for _ in range(reps):
                for l in lines:
                    sgf_mod.parse_line(l)
            pps = reps * len(lines) / (time.time() - t0)
            print(f"sgf parse/s (host): {pps:,.0f}", file=sys.stderr)
        except Exception as e:
            print(f"sgf bench skipped: {e}", file=sys.stderr)

        try:
            from dream_go_tpu.go import features

            fb = 1024 if on_tpu else 64
            fstates = engine.new_states(fb)
            feat = jax.jit(lambda s: features.extract_batch(
                s, "v1", False, use_kernel=on_tpu))
            float(np.asarray(jnp.sum(feat(fstates))))
            t0 = time.time()
            n = 8
            for _ in range(n):
                r = feat(fstates)
            float(np.asarray(jnp.sum(r)))
            print(f"feature extraction/s (batch {fb}): "
                  f"{fb * n / (time.time() - t0):,.0f}", file=sys.stderr)
        except Exception as e:
            print(f"feature bench skipped: {e}", file=sys.stderr)

        try:
            from dream_go_tpu.config import ModelConfig, SearchConfig
            from dream_go_tpu.mcts import search as S
            from dream_go_tpu.mcts.predictor import net_predictor
            from dream_go_tpu.models import tower as T

            # FLAGSHIP net (9x128), fused leaf kernel, batch 1024: warm the
            # trees once, then median-of-5 over fixed 16-sim chunks
            mb, sims, reps = (1024, 16, 5) if on_tpu else (8, 4, 2)
            mcfg = ModelConfig()
            mp, mstats = T.init_tower(mcfg, jax.random.PRNGKey(0))
            pred = net_predictor(mcfg, mp, mstats)
            scfg = SearchConfig(fused=on_tpu, feature_kernel=not on_tpu)
            mstates = engine.new_states(mb)
            trees = jax.jit(lambda st, r: S.init_trees(
                st, pred, r, scfg, sims * (reps + 2) + 1, None))(
                mstates, jax.random.PRNGKey(0))
            run = jax.jit(lambda t: S.run_search(t, pred, scfg, sims, None))
            trees = run(trees)
            int(np.asarray(jnp.sum(trees.node_n)))
            times = []
            for _ in range(reps):
                t0 = time.time()
                trees = run(trees)
                int(np.asarray(jnp.sum(trees.node_n)))
                times.append(time.time() - t0)
            sps = mb * sims / float(np.median(times))
            print(f"mcts simulations/s (9x128 net, fused, batch {mb}, "
                  f"median of {reps}x{sims} sims): {sps:,.0f}",
                  file=sys.stderr)
        except Exception as e:
            print(f"mcts bench skipped: {e}", file=sys.stderr)

        try:
            # serving latency: one flagship genmove (B=1, 100 sims)
            gstates = engine.new_states(1)
            # same production config GTP serving now defaults to on tpu
            gcfg = SearchConfig(fused=on_tpu, feature_kernel=not on_tpu)
            gsims = 100 if on_tpu else 8
            grun = jax.jit(lambda st, r: S.search(st, pred, r, gcfg, gsims))
            t = grun(gstates, jax.random.PRNGKey(0))
            int(np.asarray(jnp.sum(t.node_n)))
            t0 = time.time()
            t = grun(gstates, jax.random.PRNGKey(1))
            int(np.asarray(jnp.sum(t.node_n)))
            print(f"genmove latency (9x128, {gsims} sims, batch 1): "
                  f"{1e3 * (time.time() - t0):,.0f} ms", file=sys.stderr)
        except Exception as e:
            print(f"genmove bench skipped: {e}", file=sys.stderr)

    line = {
        "metric": "env_steps_per_sec_per_chip",
        "value": round(steps_per_s, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / 100_000.0, 3),
    }
    if mcts_sims_per_sec is not None:
        line["mcts_sims_per_sec"] = round(mcts_sims_per_sec, 1)
    if selfplay.get("selfplay_games_per_sec") is not None:
        # reference: ~0.02 games/s full search (README.md:61-64)
        line["selfplay_games_per_sec"] = round(
            selfplay["selfplay_games_per_sec"], 4)
        line["selfplay_vs_reference"] = round(
            selfplay["selfplay_games_per_sec"] / 0.02, 1)
        line["selfplay_rate_mode"] = selfplay["selfplay_rate_mode"]
        line["selfplay_batch"] = selfplay["selfplay_batch"]
    if selfplay.get("selfplay_sims_per_sec") is not None:
        line["selfplay_sims_per_sec"] = round(
            selfplay["selfplay_sims_per_sec"], 1)
    if selfplay.get("selfplay_error") is not None:
        line["selfplay_error"] = selfplay["selfplay_error"]
    print(json.dumps(line))


if __name__ == "__main__":
    if "--selfplay-warmup" in sys.argv:
        i = sys.argv.index("--selfplay-warmup")
        _selfplay_warmup_main(sys.argv[i + 1], int(sys.argv[i + 2]))
    elif "--selfplay-search" in sys.argv:
        i = sys.argv.index("--selfplay-search")
        _selfplay_search_main(sys.argv[i + 1])
    else:
        main()
