"""Feature-plane tests: liberties-after-move vs the oracle, plane semantics,
and shape checks (mirrors `features.rs:472-493` + adds differential fuzz)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dream_go_tpu.go import engine, features
from dream_go_tpu.go.reference import PyBoard
from dream_go_tpu.go.topology import PASS
from dream_go_tpu.utils import coords


def play_random(seed, n_moves):
    rng = np.random.default_rng(seed)
    s = engine.new_state()
    b = PyBoard()
    jit_step = jax.jit(engine.step)
    for _ in range(n_moves):
        mask = b.legal_mask()
        pts = np.flatnonzero(mask[:361])
        mv = int(rng.choice(pts)) if len(pts) else PASS
        b.play(mv)
        s = jit_step(s, jnp.int32(mv))
    return s, b


@pytest.mark.parametrize("seed,n_moves", [(0, 30), (1, 80), (2, 150), (3, 220)])
def test_liberties_if_matches_oracle(seed, n_moves):
    s, b = play_random(seed, n_moves)
    jlibs = jax.jit(features.liberties_if, static_argnums=1)
    for color in (engine.BLACK, engine.WHITE):
        got = np.asarray(jlibs(s, color))
        pseudo = np.asarray(jax.jit(
            engine.pseudo_legal_mask, static_argnums=1)(s, color))
        for p in range(361):
            if pseudo[p]:
                want = b.liberties_if(color, p)
                assert got[p] == want, (
                    f"libs_if mismatch at {coords.to_gtp(p)} color={color}: "
                    f"got {got[p]} want {want} (seed {seed})")


def test_feature_shape_and_dtype():
    s = engine.new_state()
    f = jax.jit(features.features_v1)(s)
    assert f.shape == (19, 19, 32)
    assert f.dtype == jnp.float32


def test_komi_and_color_planes():
    s = engine.new_state(komi=7.5)
    f = np.asarray(jax.jit(features.features_v1)(s))
    assert np.all(f[:, :, 0] == 1.0)   # black to move, komi 7.5 -> 1.0
    assert np.all(f[:, :, 1] == 0.0)
    s2 = engine.step(s, jnp.int32(coords.from_gtp("D4")))
    f2 = np.asarray(jax.jit(features.features_v1)(s2))
    assert np.all(f2[:, :, 0] == 0.0)  # white to move
    assert np.all(f2[:, :, 1] == 1.0)


def test_last_move_planes():
    s = engine.new_state()
    p1, p2 = coords.from_gtp("D4"), coords.from_gtp("Q16")
    s = engine.step(s, jnp.int32(p1))
    s = engine.step(s, jnp.int32(p2))
    f = np.asarray(jax.jit(features.features_v1)(s)).reshape(361, 32)
    assert f[p2, 3] == 1.0 and f[:, 3].sum() == 1.0   # most recent
    assert f[p1, 4] == 1.0 and f[:, 4].sum() == 1.0   # previous


def test_liberty_planes_match_oracle():
    s, b = play_random(5, 60)
    f = np.asarray(jax.jit(features.features_v1)(s)).reshape(361, 32)
    libs = b.liberty_map()
    to_move = b.to_move
    for p in range(361):
        if b.stones[p] == to_move:
            n = min(libs[p], 6)
            assert f[p, 5:11].sum() == n, p
        elif b.stones[p] != 0:
            n = min(libs[p], 6)
            assert f[p, 17:23].sum() == n, p
        else:
            assert f[p, 5:11].sum() == 0 and f[p, 17:23].sum() == 0


def test_symmetry_permutes_planes():
    s, _ = play_random(6, 40)
    f0 = np.asarray(features.features_v1(s, symmetry=0)).reshape(361, 32)
    f1 = np.asarray(features.features_v1(s, symmetry=1)).reshape(361, 32)
    from dream_go_tpu.go.topology import SYM
    np.testing.assert_array_equal(f1, f0[SYM[1]])
    # traced-symmetry path agrees with static path
    f1b = np.asarray(jax.jit(features.apply_symmetry)(
        features.features_v1(s, symmetry=0), jnp.int32(1))).reshape(361, 32)
    np.testing.assert_array_equal(f1b, f1)


def test_features_v2_planes():
    s, b = play_random(8, 50)
    f = np.asarray(jax.jit(features.features_v2)(s)).reshape(361, 18)
    assert np.all(f[:, 0] == 1.0)                      # ones plane
    to_move = int(np.asarray(s.to_move))
    np.testing.assert_array_equal(
        f[:, 2], (np.asarray(s.stones) == to_move).astype(np.float32))
    # exactly-one-liberty plane matches the oracle liberty map
    libs = b.liberty_map()
    np.testing.assert_array_equal(f[:, 4], (libs == 1).astype(np.float32))
    # corners and edges are static
    assert f[0, 16] == 1.0 and f[1, 17] == 1.0 and f[20, 16] == 0.0
