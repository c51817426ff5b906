"""Small framework utilities.

- :class:`AllReduceCommPattern`: the hypercube-style reduce-scatter
  schedule used for sparse multipole exchange (mirrors
  ``boxtree/tools.py:756-856``; exercised in pure Python by the
  reference's tests for 1..17 ranks, ``test/test_tools.py:54-97``).
  The distributed runner's dense ``psum`` path doesn't need it; it is the
  schedule for the masked sparse exchange (a ``ppermute``-round plan).
- :class:`StageTimer`: wall-clock per-stage timing with proper device
  synchronization, for feeding
  :meth:`boxtree_tpu.cost.model.AbstractFMMCostModel.estimate_calibration_params`
  (the reference leaves timing to the array context,
  ``boxtree/fmm.py:88-91``).
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class AllReduceCommPattern:
    """Recursive-doubling (hypercube) all-reduce schedule for a possibly
    non-power-of-two number of ranks.

    Stages: (1) ranks beyond the largest power of two fold their data
    into ``rank - p2``; (2) ``log2(p2)`` hypercube exchange rounds with
    partner ``rank ^ (1 << k)``; (3) the folded ranks receive the full
    result back.  ``sources()``/``sinks()`` give the current stage's
    partner sets (interface mirrors ``boxtree/tools.py:767-850``).
    """

    def __init__(self, rank, size):
        if not 0 <= rank < size:
            raise ValueError("bad rank")
        self.rank = rank
        self.size = size
        self.p2 = 1
        while self.p2 * 2 <= size:
            self.p2 *= 2
        self.extras = size - self.p2
        self.hyper_rounds = self.p2.bit_length() - 1
        self.stages = ([("fold_in",)] if self.extras else []) \
            + [("hyper", k) for k in range(self.hyper_rounds)] \
            + ([("fold_out",)] if self.extras else [])
        self.stage = 0

    def nrounds(self):
        return len(self.stages)

    def done(self):
        return self.stage >= len(self.stages)

    def _kind(self):
        return self.stages[self.stage]

    def sources(self):
        kind = self._kind()
        r, p2, size = self.rank, self.p2, self.size
        if kind[0] == "fold_in":
            return {r + p2} if (r < p2 and r + p2 < size) else set()
        if kind[0] == "hyper":
            if r >= p2:
                return set()
            return {r ^ (1 << kind[1])}
        return {r - p2} if r >= p2 else set()

    def sinks(self):
        kind = self._kind()
        r, p2, size = self.rank, self.p2, self.size
        if kind[0] == "fold_in":
            return {r - p2} if r >= p2 else set()
        if kind[0] == "hyper":
            if r >= p2:
                return set()
            return {r ^ (1 << kind[1])}
        return {r + p2} if (r < p2 and r + p2 < size) else set()

    def messages(self):
        """Ranks whose data this rank currently holds (hypercube
        sub-block semantics during the exchange rounds)."""
        kind = self._kind()
        r, p2 = self.rank, self.p2
        if kind[0] != "hyper" or r >= p2:
            return set(range(self.size))
        mask = ~((1 << (kind[1] + 1)) - 1)
        base = r & mask
        block = {q for q in range(p2) if (q & mask) == base}
        # include folded extras
        return block | {q + p2 for q in block if q + p2 < self.size}

    def advance(self):
        self.stage += 1


@contextmanager
def stage_timer(timings, name, sync=None):
    """Record wall time of a stage into *timings[name]* (accumulating),
    synchronizing the device if *sync* (an array or callable) is given."""
    t0 = time.perf_counter()
    yield
    if sync is not None:
        import jax
        jax.block_until_ready(sync() if callable(sync) else sync)
    timings[name] = timings.get(name, 0.0) + time.perf_counter() - t0


class StageTimer:
    """Collects per-stage wall times; dict-like result via ``.timings``."""

    def __init__(self):
        self.timings = {}

    def __call__(self, name, sync=None):
        return stage_timer(self.timings, name, sync)
