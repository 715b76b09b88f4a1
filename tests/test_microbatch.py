"""MicroBatcher (toolkit/microbatch.py): request coalescing, splitting,
error propagation, backpressure, and close semantics.

The batcher is the serving layer's single device-dispatch site; these
tests drive it with a host fake whose per-row results are deterministic
functions of the row, so correctness under any packing is checkable.
"""

import threading
import time

import numpy as np
import pytest

from protoclip_tpu.toolkit.microbatch import MicroBatcher

SHAPE = (2, 2, 1)


def _row_fn(block):
    """Per-row deterministic 'feature': row-sum and row-max stacked."""
    flat = block.reshape(len(block), -1).astype(np.float32)
    return np.stack([flat.sum(axis=1), flat.max(axis=1)], axis=1)


def _items(rng, n):
    return rng.integers(0, 255, (n,) + SHAPE, dtype=np.uint8)


def test_single_request_matches_direct_call():
    rng = np.random.default_rng(0)
    mb = MicroBatcher(_row_fn, 4, SHAPE, max_wait_s=0.0)
    try:
        x = _items(rng, 3)
        got = mb.submit(x)
        block = np.zeros((4,) + SHAPE, np.uint8)
        block[:3] = x
        np.testing.assert_array_equal(got, _row_fn(block)[:3])
    finally:
        mb.close()


def test_concurrent_submits_coalesce_into_one_dispatch():
    rng = np.random.default_rng(1)
    calls = []

    def run(block):
        calls.append(len(block))
        return _row_fn(block)

    n_threads = 8
    mb = MicroBatcher(run, n_threads, SHAPE, max_wait_s=0.5)
    barrier = threading.Barrier(n_threads)
    inputs = [_items(rng, 1) for _ in range(n_threads)]
    results = [None] * n_threads

    def worker(i):
        barrier.wait()
        results[i] = mb.submit(inputs[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    try:
        for i in range(n_threads):
            np.testing.assert_array_equal(results[i], _row_fn(inputs[i]))
        # all 8 rows shared device batches; with the 500 ms window this
        # should be exactly one dispatch, but never one per request
        assert mb.stats["images"] == n_threads
        assert mb.stats["dispatches"] < n_threads
        assert mb.stats["mean_fill"] > 1.0
    finally:
        mb.close()


def test_zero_wait_still_coalesces_already_queued_requests():
    """max_wait_s=0 means "never WAIT", not "never coalesce": requests that
    piled up while a dispatch was in flight must share the next batch
    (regression: the fill window used to honor only the deadline, turning a
    queued burst into one underfull dispatch per request)."""
    rng = np.random.default_rng(7)
    first_in = threading.Event()
    release = threading.Event()
    calls = []

    def run(block):
        calls.append(len(block))
        if len(calls) == 1:
            first_in.set()
            assert release.wait(timeout=30)
        return _row_fn(block)

    mb = MicroBatcher(run, 8, SHAPE, max_wait_s=0.0)
    inputs = [_items(rng, 1) for _ in range(4)]
    results = [None] * 4
    threads = [
        threading.Thread(target=lambda i=i: results.__setitem__(i, mb.submit(inputs[i])))
        for i in range(4)
    ]
    try:
        threads[0].start()
        assert first_in.wait(timeout=30)  # dispatcher is busy with request 0
        for t in threads[1:]:
            t.start()
        deadline = time.monotonic() + 30  # wait until the burst is queued
        while mb._q.qsize() < 3 and time.monotonic() < deadline:
            time.sleep(0.005)
        assert mb._q.qsize() == 3
        release.set()
        for t in threads:
            t.join(timeout=30)
        for i in range(4):
            np.testing.assert_array_equal(results[i], _row_fn(inputs[i]))
        # the queued burst shared ONE dispatch (blocks arrive padded to the
        # full batch size, so count calls, not rows)
        assert len(calls) == 2
        assert mb.stats["dispatches"] == 2 and mb.stats["images"] == 4
    finally:
        mb.close()


def test_request_larger_than_batch_splits_across_dispatches():
    rng = np.random.default_rng(2)
    mb = MicroBatcher(_row_fn, 4, SHAPE, max_wait_s=0.0)
    try:
        x = _items(rng, 10)
        got = mb.submit(x)
        assert got.shape == (10, 2)
        np.testing.assert_array_equal(got, _row_fn(x.astype(np.uint8)))
        assert mb.stats["dispatches"] == 3  # 4 + 4 + 2
    finally:
        mb.close()


def test_packing_never_changes_results():
    """The invariant the serving layer relies on: any interleaving of
    concurrent requests yields each request its own rows, exactly."""
    rng = np.random.default_rng(3)
    mb = MicroBatcher(_row_fn, 3, SHAPE, max_wait_s=0.05)
    sizes = [1, 5, 2, 7, 3, 1, 4]
    inputs = [_items(rng, n) for n in sizes]
    results = [None] * len(sizes)

    def worker(i):
        results[i] = mb.submit(inputs[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(sizes))]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        for x, got in zip(inputs, results):
            np.testing.assert_array_equal(got, _row_fn(x))
    finally:
        mb.close()


def test_device_error_fails_the_request_not_the_loop():
    boom = {"armed": False}

    def run(block):
        if boom["armed"]:
            raise RuntimeError("device fell over")
        return _row_fn(block)

    rng = np.random.default_rng(4)
    mb = MicroBatcher(run, 4, SHAPE, max_wait_s=0.0)
    try:
        mb.submit(_items(rng, 2))  # healthy
        boom["armed"] = True
        with pytest.raises(RuntimeError, match="device fell over"):
            mb.submit(_items(rng, 2))
        boom["armed"] = False
        got = mb.submit(_items(rng, 3))  # loop survived the failure
        assert got.shape == (3, 2)
    finally:
        mb.close()


def test_stats_expose_dispatch_latency_quantiles():
    rng = np.random.default_rng(8)
    mb = MicroBatcher(_row_fn, 4, SHAPE, max_wait_s=0.0)
    try:
        for _ in range(5):
            mb.submit(_items(rng, 4))
        s = mb.stats
        assert s["dispatches"] == 5
        assert 0.0 <= s["dispatch_ms_p50"] <= s["dispatch_ms_p99"] <= s["dispatch_ms_max"]
    finally:
        mb.close()


def test_input_validation():
    mb = MicroBatcher(_row_fn, 4, SHAPE, max_wait_s=0.0, max_pending=16)
    try:
        with pytest.raises(ValueError, match="expected"):
            mb.submit(np.zeros((2, 3, 3, 1), np.uint8))
        with pytest.raises(ValueError, match="empty"):
            mb.submit(np.zeros((0,) + SHAPE, np.uint8))
        with pytest.raises(ValueError, match="queue cap"):
            mb.submit(np.zeros((17,) + SHAPE, np.uint8))
    finally:
        mb.close()


def test_float_input_is_rejected_not_coerced():
    """Regression: submit() used to np.asarray(images, uint8)-coerce, so
    float [0,1] pixels silently truncated to zeros — bypassing the bundle
    wrapper's deliberate reject-don't-coerce rule (io/export.py)."""
    mb = MicroBatcher(_row_fn, 4, SHAPE, max_wait_s=0.0)
    try:
        with pytest.raises(ValueError, match="got float32"):
            mb.submit(np.random.default_rng(9).random((2,) + SHAPE, np.float32))
    finally:
        mb.close()


def test_concurrent_large_submits_do_not_deadlock():
    """Regression: one-token-at-a-time semaphore acquisition let two
    concurrent submits (each under max_pending but summing over it)
    interleave until each held part of the capacity and both blocked on
    the next token forever — wedging every later submit too.  Capacity is
    now acquired atomically per request."""
    rng = np.random.default_rng(10)
    mb = MicroBatcher(_row_fn, 2, SHAPE, max_wait_s=0.0, max_pending=8)
    inputs = [_items(rng, 6) for _ in range(4)]  # any 2 together > cap
    results = [None] * len(inputs)

    def worker(i):
        results[i] = mb.submit(inputs[i])

    threads = [
        threading.Thread(target=worker, args=(i,), daemon=True)
        for i in range(len(inputs))
    ]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
            assert not t.is_alive(), "concurrent large submits deadlocked"
        for x, got in zip(inputs, results):
            np.testing.assert_array_equal(got, _row_fn(x))
    finally:
        mb.close()


def test_failed_dispatch_releases_the_dropped_requests_tokens():
    """Regression: when an over-batch request's dispatch failed, only the
    dispatched rows' capacity tokens were released — the dropped
    remainder's tokens leaked, permanently shrinking the queue cap until
    submit() blocked forever."""
    state = {"fail": True}

    def run(block):
        if state["fail"]:
            raise RuntimeError("transient device error")
        return _row_fn(block)

    rng = np.random.default_rng(11)
    mb = MicroBatcher(run, 4, SHAPE, max_wait_s=0.0, max_pending=8)
    try:
        with pytest.raises(RuntimeError, match="transient"):
            mb.submit(_items(rng, 6))  # dispatch of rows 0-3 fails; 4-5 dropped
        state["fail"] = False
        done = threading.Event()
        out = {}

        def worker():
            out["got"] = mb.submit(_items(rng, 8))  # needs the FULL cap back
            done.set()

        threading.Thread(target=worker, daemon=True).start()
        assert done.wait(timeout=10), "leaked tokens: full-cap submit blocked"
        assert out["got"].shape == (8, 2)
    finally:
        mb.close()


def test_trim_underfull_passes_only_the_filled_rows():
    """trim_underfull hands run_batch block[:fill] so a variable-batch
    callee (a bucketed serving bundle) can dispatch a smaller compiled
    program; full dispatches still get the full block."""
    seen = []

    def run(block):
        seen.append(len(block))
        return _row_fn(block)

    rng = np.random.default_rng(13)
    mb = MicroBatcher(run, 4, SHAPE, max_wait_s=0.0, trim_underfull=True)
    try:
        x = _items(rng, 3)
        np.testing.assert_array_equal(mb.submit(x), _row_fn(x))
        y = _items(rng, 4)
        np.testing.assert_array_equal(mb.submit(y), _row_fn(y))
        assert seen == [3, 4]
    finally:
        mb.close()


def test_large_submit_is_not_starved_by_small_ones():
    """Regression: without FIFO admission, a full-capacity submit waiting
    for max_pending tokens could starve forever behind a stream of small
    submits that keep grabbing freed capacity first."""
    stop = threading.Event()
    rng = np.random.default_rng(14)
    mb = MicroBatcher(_row_fn, 4, SHAPE, max_wait_s=0.0, max_pending=8)
    done = threading.Event()
    out = {}

    def small_stream():
        x = _items(rng, 6)
        while not stop.is_set():
            mb.submit(x)

    def big():
        out["got"] = mb.submit(_items(rng, 8))  # needs ALL capacity at once
        done.set()

    streams = [threading.Thread(target=small_stream, daemon=True) for _ in range(2)]
    try:
        for t in streams:
            t.start()
        time.sleep(0.05)  # saturate before the big request arrives
        threading.Thread(target=big, daemon=True).start()
        assert done.wait(timeout=30), "full-capacity submit starved"
        assert out["got"].shape == (8, 2)
    finally:
        stop.set()
        for t in streams:
            t.join(timeout=10)
        mb.close()


def test_capacity_conserved_under_concurrent_chaos():
    """Invariant: after every request has completed (served or failed),
    ALL capacity tokens are back — any leak would shrink the queue cap a
    little more on each failure until the server wedges.  Hammers the
    batcher with concurrent random-size submits and randomly failing
    dispatches."""
    import random

    rng_fail = random.Random(42)

    def flaky_run(block):
        if rng_fail.random() < 0.3:
            raise RuntimeError("injected failure")
        return _row_fn(block)

    mb = MicroBatcher(flaky_run, 4, SHAPE, max_wait_s=0.001, max_pending=32)
    data_rng = np.random.default_rng(12)
    errors = []

    def worker(i):
        local = np.random.default_rng(100 + i)
        for _ in range(10):
            n = int(local.integers(1, 12))
            try:
                out = mb.submit(_items(data_rng, n))
                assert out.shape == (n, 2)
            except RuntimeError as exc:
                errors.append(exc)

    threads = [
        threading.Thread(target=worker, args=(i,), daemon=True) for i in range(6)
    ]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
            assert not t.is_alive(), "chaos load wedged the batcher"
        # quiesce: a full-capacity submit must not block (all tokens back);
        # its dispatch may still hit an injected failure, which is fine
        try:
            out = mb.submit(_items(data_rng, 32))
            assert out.shape == (32, 2)
        except RuntimeError:
            pass
    finally:
        mb.close()
    with mb._cap:
        assert mb._available == mb.max_pending, (
            f"leaked {mb.max_pending - mb._available} capacity tokens"
        )


def test_close_flushes_inflight_work_then_rejects():
    done = threading.Event()

    def slow_run(block):
        time.sleep(0.05)
        return _row_fn(block)

    mb = MicroBatcher(slow_run, 4, SHAPE, max_wait_s=0.2)
    rng = np.random.default_rng(5)
    x = _items(rng, 2)
    out = {}

    def worker():
        out["got"] = mb.submit(x)
        done.set()

    t = threading.Thread(target=worker)
    t.start()
    time.sleep(0.01)  # let the submit enqueue
    mb.close()  # must flush the queued request, not drop it
    assert done.wait(timeout=10)
    t.join(timeout=10)
    np.testing.assert_array_equal(out["got"], _row_fn(x))
    with pytest.raises(RuntimeError, match="closed"):
        mb.submit(x)
    mb.close()  # idempotent


def test_close_unblocks_all_backpressured_submitters():
    """Submitters blocked on the capacity semaphore when close() runs must
    all terminate — each either served or rejected with the closed error.
    Regression: a closed-out submitter must return its acquired tokens so
    the *other* blocked submitters can drain through too."""
    gate = threading.Event()

    def gated_run(block):
        gate.wait(timeout=30)
        return _row_fn(block)

    # capacity == batch == 4: one in-flight dispatch holds every token
    mb = MicroBatcher(gated_run, 4, SHAPE, max_wait_s=0.0, max_pending=4)
    rng = np.random.default_rng(6)
    outcomes = {}

    def worker(name, n):
        try:
            outcomes[name] = mb.submit(_items(rng, n))
        except RuntimeError as exc:
            outcomes[name] = exc

    t_a = threading.Thread(target=worker, args=("a", 4))
    t_a.start()
    time.sleep(0.1)  # a's rows are in the gated dispatch, capacity at 0
    blocked = [
        threading.Thread(target=worker, args=(f"b{i}", 3)) for i in range(3)
    ]
    for t in blocked:
        t.start()
    time.sleep(0.1)  # b* are blocked on backpressure (3 tokens each, 0 free)
    closer = threading.Thread(target=mb.close)
    closer.start()
    gate.set()  # let a's dispatch finish so close can flush + join
    for t in [t_a, *blocked, closer]:
        t.join(timeout=10)
        assert not t.is_alive(), "a submitter hung across close()"
    assert isinstance(outcomes["a"], np.ndarray)
    for i in range(3):
        out = outcomes[f"b{i}"]
        assert isinstance(out, (np.ndarray, RuntimeError))


def test_health_probe_rate_limit_and_recovery():
    """health_probe: dispatches a tiny probe only during a failure streak,
    rate-limits repeat probes, and a successful probe resets the streak
    (the self-recovery path behind the serve CLI's degraded /healthz)."""
    calls = {"n": 0}
    fail = {"on": True}

    def run(block):
        calls["n"] += 1
        if fail["on"]:
            raise RuntimeError("down")
        return _row_fn(block)

    mb = MicroBatcher(run, 4, SHAPE, max_wait_s=0.0)
    try:
        rng = np.random.default_rng(0)
        with pytest.raises(RuntimeError):
            mb.submit(_items(rng, 2))
        assert mb.stats["consecutive_failures"] == 1
        assert "down" in mb.stats["last_error"]

        # still failing: the probe itself dispatches (and fails)
        assert mb.health_probe(min_interval_s=10.0) is False
        assert mb.stats["failures"] == 2

        # rate-limited: no second dispatch inside the window
        n_before = calls["n"]
        assert mb.health_probe(min_interval_s=10.0) is False
        assert calls["n"] == n_before

        # device recovers: a probe past the window succeeds, streak resets
        fail["on"] = False
        assert mb.health_probe(min_interval_s=0.0) is True
        assert mb.stats["consecutive_failures"] == 0
        assert mb.stats["failures"] == 2  # total is monotonic

        # healthy short-circuit: no dispatch at all
        n_before = calls["n"]
        assert mb.health_probe(min_interval_s=10.0) is True
        assert calls["n"] == n_before
    finally:
        mb.close()
