"""Closed-loop smoke test: two generations of self-play + training."""

from dream_go_tpu.config import (ModelConfig, SearchConfig, SelfPlayConfig,
                                 TrainConfig)
from dream_go_tpu.train.rl_loop import RLLoopConfig, balance_games, run_rl_loop


def test_two_generations_close_the_loop(tmp_path):
    trainer = run_rl_loop(
        ModelConfig(num_channels=8, num_blocks=1, num_samples=2),
        TrainConfig(batch_size=8),
        SelfPlayConfig(num_games=4, num_rollout=6, max_moves=36),
        SearchConfig(num_rollout=6),
        RLLoopConfig(generations=2, games_per_generation=4,
                     train_steps_per_generation=3, ex_it=False,
                     out_dir=str(tmp_path), seed=0),
        log_fn=lambda m: None)
    assert int(trainer.state.step) == 6
    assert (tmp_path / "gen_0000.sgf").exists()
    assert (tmp_path / "gen_0001.sgf").exists()
    assert (tmp_path / "dream_go.json").exists()
    assert (tmp_path / "ckpt_0001").exists()


def test_balance_games():
    b = "(;GM[1]RE[B+1.5];B[aa])"
    w = "(;GM[1]RE[W+1.5];B[aa])"
    out = balance_games([b, b, b, w])
    assert len(out) == 2
    assert sorted(out) == sorted([b, w])
    # never empties the pool
    assert balance_games([b, b]) == [b, b]


def test_resume_continues_from_last_checkpoint(tmp_path):
    """The loop is restartable after a crash: it restores the last
    generation's trainer checkpoint and refills the replay window from the
    archived SGFs (SURVEY §5 restartability)."""
    args = (
        ModelConfig(num_channels=8, num_blocks=1, num_samples=2),
        TrainConfig(batch_size=8),
        SelfPlayConfig(num_games=4, num_rollout=6, max_moves=36),
        SearchConfig(num_rollout=6),
    )
    run_rl_loop(*args, RLLoopConfig(
        generations=2, games_per_generation=4,
        train_steps_per_generation=3, ex_it=False,
        out_dir=str(tmp_path), seed=0), log_fn=lambda m: None)
    logs = []
    trainer = run_rl_loop(*args, RLLoopConfig(
        generations=3, games_per_generation=4,
        train_steps_per_generation=3, ex_it=False,
        out_dir=str(tmp_path), seed=0, resume=True), log_fn=logs.append)
    assert any("resume: generation 2" in m for m in logs)
    assert int(trainer.state.step) == 9            # 6 restored + 3 new
    assert (tmp_path / "ckpt_0002").exists()
    assert (tmp_path / "weights_0002.json").exists()

    # a warm restart continues a floored LR schedule at the warm-start rate
    # (reference --warm-start, __main__.py:36-39)
    logs = []
    trainer = run_rl_loop(*args, RLLoopConfig(
        generations=4, games_per_generation=4,
        train_steps_per_generation=0, ex_it=False,
        out_dir=str(tmp_path), seed=0, resume=True,
        warm_restart=True), log_fn=logs.append)
    assert any("warm restart" in m for m in logs)
    assert trainer.scheduler.learning_rate == args[1].warm_start_lr
    assert trainer.scheduler.step == 0
