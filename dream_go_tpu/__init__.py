"""dream_go_tpu — a TPU-native AlphaZero-style Go framework.

A from-scratch re-design of the capabilities of kblomdahl/dream-go
(Rust + CUDA/cuDNN + TF1 trainer) as an idiomatic JAX/XLA/Pallas system:

- ``go``        vectorized Go rules engine (replaces src/libdg_go): thousands of
                boards stepped in lockstep under ``jit``; Tromp-Taylor legality,
                positional super-ko, scoring, Benson life, ladders, features.
- ``models``    flax residual tower + policy/value/ownership heads (replaces
                src/libdg_nn layers + contrib/trainer/dream_tf/layers), one
                model definition for both training and inference; bf16 compute.
- ``mcts``      on-device batched PUCT search over array trees (replaces
                src/libdg_mcts's threaded pointer tree + worker pool).
- ``selfplay``  vectorized self-play / reanalyze drivers + SGF emission
                (replaces self_play.rs / reanalyze.rs / game_result.rs).
- ``train``     losses, optimizer, plateau LR schedule, input pipeline
                (replaces contrib/trainer/dream_tf).
- ``parallel``  jax.sharding mesh utilities: data-parallel learner,
                per-chip self-play shards (replaces multi-GPU round-robin).
- ``gtp``       GTP protocol front-end (replaces src/dg/gtp).
- ``utils``     b85 codec, LCB statistics, SGF/coordinate codecs, config
                (replaces src/libdg_utils).
"""

__version__ = "0.1.0"
