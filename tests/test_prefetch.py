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


def test_prefetcher_abandoned_mid_iteration_releases_thread():
    """Breaking out of the loop (uncaught query error with
    continue_on_error=False) must stop the prepare thread instead of
    leaving it blocked on the bounded queue holding staged bundles."""
    import threading

    items = list(range(50))
    prepared = []

    def prepare(i):
        prepared.append(i)
        time.sleep(0.005)
        return i

    pf = Prefetcher(items, prepare, enabled=True, depth=2)
    for item, out in pf:
        if item == 3:
            break
    pf.close()  # explicit close is idempotent with the generator's finally
    deadline = time.time() + 5
    while time.time() < deadline:
        if not any(
            t.name == "piccolo-prefetch" and t.is_alive()
            for t in threading.enumerate()
        ):
            break
        time.sleep(0.05)
    else:
        raise AssertionError("prepare thread still alive after abandonment")
    # and it stopped preparing almost immediately (not all 50 items)
    assert len(prepared) < 30


def test_prefetcher_close_then_fresh_iteration_unaffected():
    """close() on one instance must not poison a new one."""
    a = Prefetcher([1, 2, 3], lambda i: i, enabled=True)
    it = iter(a)
    next(it)
    a.close()
    b = Prefetcher([1, 2, 3], lambda i: i * 2, enabled=True)
    assert [Prefetcher.unwrap(o) for _, o in b] == [2, 4, 6]
