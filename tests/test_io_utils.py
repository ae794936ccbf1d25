"""IO utility tests (ref:pytracking/utils/io.py)."""

import pytest

from woft_tpu.utils.io import LookaheadIter


def test_lookahead_iter_peek_and_consume():
    it = LookaheadIter(iter([1, 2, 3]))
    assert it.peek() == 1                       # non-consuming
    assert list(it.lookahead()) == [1, 2, 3]    # still non-consuming
    assert next(it) == 1
    assert it.peek() == 2
    assert list(it) == [2, 3]


def test_lookahead_iter_exhaustion():
    it = LookaheadIter([])
    assert it.peek("fallback") == "fallback"
    with pytest.raises(StopIteration):
        it.peek()
    with pytest.raises(StopIteration):
        next(it)


def test_lookahead_interleaved():
    it = LookaheadIter(range(5))
    la = it.lookahead()
    assert next(la) == 0
    assert next(la) == 1
    assert next(it) == 0          # consuming drains the staged buffer first
    assert it.peek() == 1
    assert list(it) == [1, 2, 3, 4]
