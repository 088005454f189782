"""Request coalescing (infer/coalescer.py): batching, grouping, fallbacks,
backpressure — against a fake engine, no model or device needed."""

import threading
import time

import numpy as np
import pytest

from vispeech_tpu.infer.coalescer import RequestCoalescer, ServerBusy


class FakeEngine:
    """Records call shapes; returns per-request dicts like TTSEngine."""

    def __init__(self, delay=0.0, fail=False):
        self.batch_calls = []
        self.single_calls = []
        self.delay = delay
        self.fail = fail
        self.lock = threading.Lock()

    def _result(self, phones):
        return {"audio": np.zeros(8, np.float32), "sampling_rate": 8000,
                "phones": list(phones), "duration": np.ones(len(phones)),
                "f0": np.full(len(phones), 200.0),
                "energy": np.full(len(phones), 60.0)}

    def synthesize_batch(self, phones_list, speakers, noise_scale, seed):
        if self.fail:
            raise RuntimeError("device on fire")
        time.sleep(self.delay)
        with self.lock:
            self.batch_calls.append((len(phones_list), tuple(speakers),
                                     noise_scale, seed))
        return [self._result(p) for p in phones_list]

    def synthesize(self, phones, **kwargs):
        if self.fail:
            raise RuntimeError("device on fire")
        time.sleep(self.delay)
        with self.lock:
            self.single_calls.append((tuple(phones), dict(kwargs)))
        return self._result(phones)


def submit_many(c, requests):
    """Submit concurrently; returns (results, errors) in request order."""
    results = [None] * len(requests)
    errors = [None] * len(requests)

    def worker(i, phones, kwargs):
        try:
            results[i] = c.submit(phones, **kwargs)
        except BaseException as e:  # noqa: BLE001
            errors[i] = e

    threads = [threading.Thread(target=worker, args=(i, p, kw))
               for i, (p, kw) in enumerate(requests)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    return results, errors


def test_coarrivals_coalesce_into_one_batch():
    eng = FakeEngine()
    c = RequestCoalescer(eng, window_ms=150, max_batch=8)
    try:
        reqs = [(["n", "i2"], {"speaker": i}) for i in range(4)]
        results, errors = submit_many(c, reqs)
        assert all(e is None for e in errors)
        assert all(r["phones"] == ["n", "i2"] for r in results)
        # all 4 rode one synthesize_batch call, speaker order preserved
        assert eng.batch_calls == [(4, (0, 1, 2, 3), 0.667, 0)]
        assert eng.single_calls == []
    finally:
        c.close()


def test_override_tensors_fall_back_to_single():
    eng = FakeEngine()
    c = RequestCoalescer(eng, window_ms=150, max_batch=8)
    try:
        reqs = [
            (["a"], {}),
            (["b"], {"pitch_control": np.array([220.0])}),  # prosody edit
            (["c"], {}),
        ]
        _, errors = submit_many(c, reqs)
        assert all(e is None for e in errors)
        assert len(eng.batch_calls) == 1 and eng.batch_calls[0][0] == 2
        assert len(eng.single_calls) == 1
        assert eng.single_calls[0][0] == ("b",)
    finally:
        c.close()


def test_distinct_noise_scales_do_not_mix():
    eng = FakeEngine()
    c = RequestCoalescer(eng, window_ms=150, max_batch=8)
    try:
        reqs = [(["a"], {"noise_scale": 0.5}), (["b"], {"noise_scale": 0.5}),
                (["c"], {"noise_scale": 0.9})]
        _, errors = submit_many(c, reqs)
        assert all(e is None for e in errors)
        # 0.5-group batched; the lone 0.9 request served singly
        assert eng.batch_calls == [(2, (0, 0), 0.5, 0)]
        assert len(eng.single_calls) == 1
    finally:
        c.close()


def test_engine_errors_propagate_to_callers():
    eng = FakeEngine(fail=True)
    c = RequestCoalescer(eng, window_ms=50, max_batch=8)
    try:
        reqs = [(["a"], {}), (["b"], {})]
        results, errors = submit_many(c, reqs)
        assert all(r is None for r in results)
        assert all(isinstance(e, RuntimeError) for e in errors)
    finally:
        c.close()


def test_queue_full_raises_server_busy():
    eng = FakeEngine(delay=0.5)
    c = RequestCoalescer(eng, window_ms=1, max_batch=1, max_queue=2)
    try:
        reqs = [(["x"], {}) for _ in range(8)]
        results, errors = submit_many(c, reqs)
        busy = [e for e in errors if isinstance(e, ServerBusy)]
        ok = [r for r in results if r is not None]
        assert busy, "expected at least one 503-style rejection"
        assert ok, "expected at least one success"
        assert len(busy) + len(ok) == 8
    finally:
        c.close()


def test_single_request_uses_single_path():
    """A lone request must not pay synthesize_batch's planner overhead."""
    eng = FakeEngine()
    c = RequestCoalescer(eng, window_ms=10, max_batch=8)
    try:
        res = c.submit(["n", "i2"])
        assert res["phones"] == ["n", "i2"]
        assert eng.batch_calls == []
        assert len(eng.single_calls) == 1
    finally:
        c.close()
