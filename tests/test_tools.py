"""Tool tests: the hypercube all-reduce schedule simulated in pure Python
for 1..17 ranks (mirrors ``test/test_tools.py:54-97``)."""

import numpy as np
import pytest

from boxtree_tpu.utils.tools import AllReduceCommPattern


@pytest.mark.parametrize("size", range(1, 18))
def test_allreduce_comm_pattern(size):
    # Each rank starts with {rank}; simulate exchanges; all ranks must
    # end up with the full set.
    data = [{r} for r in range(size)]
    patterns = [AllReduceCommPattern(r, size) for r in range(size)]
    nrounds = patterns[0].nrounds()
    for _ in range(nrounds):
        incoming = [set() for _ in range(size)]
        for r in range(size):
            for snk in patterns[r].sinks():
                incoming[snk] |= data[r]
        for r in range(size):
            # sanity: senders to r claim r as sink
            for src in patterns[r].sources():
                assert r in patterns[src].sinks()
            data[r] |= incoming[r]
        for r in range(size):
            patterns[r].advance()
    for r in range(size):
        assert data[r] == set(range(size)), (size, r, data[r])
        assert patterns[r].done()
