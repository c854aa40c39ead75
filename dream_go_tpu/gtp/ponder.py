"""Background pondering: keep searching while waiting for the opponent.

Replaces `src/dg/gtp/ponder_service.rs:36-239`: a daemon thread runs chunked
searches on the current position (bounded by ``max_visits``, reference caps
at 500k, `ponder_service.rs:78`); commands pause it via :meth:`take`, which
hands back the accumulated trees when they still match the position (by
zobrist hash), and :meth:`start` resumes on a new position.  JAX dispatch
releases the GIL during device execution, so the GTP loop stays responsive.
"""

from __future__ import annotations

import threading

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SearchConfig
from ..mcts import search as S
from ..mcts.predictor import Predictor


class PonderService:
    def __init__(self, predictor: Predictor, search_cfg: SearchConfig,
                 chunk: int = 64, max_visits: int = 500_000,
                 capacity: int = 4096):
        self.predictor = predictor
        self.cfg = search_cfg
        self.chunk = chunk
        self.max_visits = max_visits
        self.capacity = capacity
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self._trees = None
        self._root_hash: bytes | None = None
        self.cpu_visits = 0

        self._init_fn = jax.jit(lambda st, r: S.init_trees(
            st, self.predictor, r, self.cfg, self.capacity, None))
        self._chunk_fn = jax.jit(lambda t: S.run_search(
            t, self.predictor, self.cfg, self.chunk, None))

    def start(self, state):
        """Begin pondering the given (single) GoState."""
        self.stop()
        states = jax.tree_util.tree_map(lambda x: x[None], state)
        self._root_hash = (np.asarray(state.hash).tobytes()
                           + bytes([int(state.to_move)]))
        self._stop.clear()

        def worker():
            trees = self._init_fn(states, jax.random.PRNGKey(0))
            visits = 1
            while not self._stop.is_set() and visits < self.max_visits \
                    and visits + self.chunk < self.capacity:
                trees = self._chunk_fn(trees)
                jax.block_until_ready(trees.size)
                visits += self.chunk
                with self._lock:
                    self._trees = trees
            with self._lock:
                self._trees = trees

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=60)
            self._thread = None

    def take(self, state):
        """Pause pondering; return the trees if they match ``state``."""
        self.stop()
        with self._lock:
            trees = self._trees
            self._trees = None
        if trees is None:
            return None
        key = np.asarray(state.hash).tobytes() + bytes([int(state.to_move)])
        if self._root_hash != key:
            return None
        return trees
