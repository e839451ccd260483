"""Prefetcher / AsyncWriter ordering and error-delivery semantics."""

import time

import pytest

from piccolo_tpu.harness.prefetch import AsyncWriter, Prefetcher


@pytest.mark.parametrize("enabled", [False, True])
def test_prefetcher_preserves_order_and_results(enabled):
    items = list(range(20))
    calls = []

    def prepare(i):
        calls.append(i)
        return i * i

    seen = [
        (item, Prefetcher.unwrap(out))
        for item, out in Prefetcher(items, prepare, enabled=enabled)
    ]
    assert seen == [(i, i * i) for i in items]
    assert calls == items  # prepare ran exactly once per item, in order


@pytest.mark.parametrize("enabled", [False, True])
def test_prefetcher_delivers_exception_at_its_item(enabled):
    def prepare(i):
        if i == 2:
            raise ValueError("boom")
        return i

    got, errors = [], []
    for item, out in Prefetcher([0, 1, 2, 3], prepare, enabled=enabled):
        try:
            got.append(Prefetcher.unwrap(out))
        except ValueError:
            errors.append(item)
    # the failure surfaces at item 2's turn and later items still arrive
    assert errors == [2]
    assert got == [0, 1, 3]


def test_prefetcher_runs_ahead_of_consumer():
    started = []

    def prepare(i):
        started.append(i)
        return i

    it = iter(Prefetcher(list(range(5)), prepare, enabled=True, depth=2))
    next(it)
    deadline = time.time() + 2.0
    # with the consumer stalled, preparation continues in the background
    while len(started) < 3 and time.time() < deadline:
        time.sleep(0.01)
    assert len(started) >= 3
    assert [Prefetcher.unwrap(o) for _, o in it] == [1, 2, 3, 4]


@pytest.mark.parametrize("enabled", [False, True])
def test_async_writer_runs_all_and_reraises(enabled):
    done = []
    w = AsyncWriter(enabled=enabled)
    for i in range(5):
        w.submit(done.append, i)
    w.close()
    assert done == list(range(5))

    w = AsyncWriter(enabled=enabled)
    with pytest.raises(RuntimeError, match="disk full"):
        w.submit(lambda: (_ for _ in ()).throw(RuntimeError("disk full")))
        # inline mode raises at submit; threaded mode at close
        w.close()


def test_async_writer_context_manager_drains():
    done = []
    with AsyncWriter(enabled=True) as w:
        for i in range(3):
            w.submit(done.append, i)
    assert done == [0, 1, 2]
