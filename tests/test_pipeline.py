"""Data-pipeline semantics: ordering, reshuffle, fault tolerance."""

import numpy as np
import pytest

from tssep_tpu.data.pipeline import FilterException, new


def test_map_batch_len():
    ds = new(list(range(10))).map(lambda x: x * 2).batch(3)
    batches = list(ds)
    assert batches[0] == [0, 2, 4]
    assert len(ds) == 4


def test_shuffle_reshuffles_per_epoch():
    ds = new(list(range(50))).shuffle(reshuffle=True, seed=3)
    a, b = list(ds), list(ds)
    assert sorted(a) == sorted(b) == list(range(50))
    assert a != b  # different epoch order


def test_prefetch_preserves_order():
    ds = new(list(range(100))).map(lambda x: x + 1).prefetch(4, 8)
    assert list(ds) == list(range(1, 101))


def test_prefetch_drops_failing_examples():
    def fn(x):
        if x % 3 == 0:
            raise ValueError(x)
        return x

    ds = new(list(range(10))).map(fn).prefetch(
        2, 4, catch_filter_exception=True)
    assert list(ds) == [x for x in range(10) if x % 3 != 0]


def test_prefetch_raises_without_catch():
    def fn(x):
        if x == 5:
            raise ValueError(x)
        return x

    ds = new(list(range(10))).map(fn).prefetch(2, 4)
    with pytest.raises(ValueError):
        list(ds)


def test_catch_dataset():
    def fn(x):
        if x == 2:
            raise RuntimeError('boom')
        return x
    ds = new([1, 2, 3]).map(fn).catch()
    assert list(ds) == [1, 3]


def test_sort_and_tile():
    ds = new([3, 1, 2]).sort(lambda x: x, reverse=True)
    assert list(ds) == [3, 2, 1]
    assert list(ds.tile(2)) == [3, 2, 1, 3, 2, 1]
