"""Request coalescing for the HTTP server (VERDICT r4 #6).

The reference serves strictly one request at a time behind a non-blocking
mutex — concurrent callers are refused outright (reference
inference_api.py:35-40 "服务器忙").  Round 4 already replaced the refusal
with 503s; this module replaces serialization itself: concurrent requests
are COALESCED into device batches.

Mechanics: handler threads ``submit()`` and block on a per-request event; a
single dispatcher thread drains the queue, waits up to ``window_ms`` for
co-arriving requests (bounded by ``max_batch``), then

* requests with no per-phoneme override tensors and the same
  ``(noise_scale, seed)`` run as ONE ``TTSEngine.synthesize_batch`` call —
  the tiered bucket planner (infer/batching.py) turns them into few padded
  device dispatches;
* requests with override tensors (the prosody-edit loop) or odd parameter
  groups fall back to sequential ``synthesize`` within the same drain.

Backpressure: a bounded queue; when full, ``submit`` raises
:class:`ServerBusy` and the HTTP layer returns 503 — the failure mode is
load-dependent, not concurrency-dependent.

Measured under Poisson load by benchmarks/bench_serving_load.py.
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


class ServerBusy(RuntimeError):
    """Queue full — translate to HTTP 503."""


@dataclass
class _Pending:
    phones: list
    kwargs: Dict[str, Any]
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[dict] = None
    error: Optional[BaseException] = None


def _batchable(kwargs: Dict[str, Any]) -> bool:
    """Batchable = predictor-driven prosody (synthesize_batch contract)."""
    return all(
        kwargs.get(k) is None
        for k in ("duration_control", "pitch_control", "energy_control")
    )


class RequestCoalescer:
    def __init__(
        self,
        engine,
        window_ms: float = 20.0,
        max_batch: int = 16,
        max_queue: int = 256,
    ):
        self.engine = engine
        self.window_s = window_ms / 1e3
        self.max_batch = max_batch
        self.q: "queue.Queue[_Pending]" = queue.Queue(maxsize=max_queue)
        self._stop = False
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    def close(self) -> None:
        self._stop = True

    # ------------------------------------------------------------- client
    def submit(self, phones: list, timeout: float = 300.0, **kwargs) -> dict:
        """Blocking: returns the synthesize() result dict or re-raises the
        engine's exception in the caller's thread."""
        item = _Pending(phones=list(phones), kwargs=kwargs)
        try:
            self.q.put_nowait(item)
        except queue.Full:
            raise ServerBusy(
                f"request queue full ({self.q.maxsize} pending)") from None
        if not item.done.wait(timeout):
            raise TimeoutError("synthesis timed out")
        if item.error is not None:
            raise item.error
        return item.result

    # --------------------------------------------------------- dispatcher
    def _drain_window(self) -> List[_Pending]:
        try:
            first = self.q.get(timeout=0.25)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.monotonic() + self.window_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                batch.append(self.q.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _run(self) -> None:
        while not self._stop:
            batch = self._drain_window()
            if not batch:
                continue
            self._process(batch)

    def _process(self, batch: List[_Pending]) -> None:
        # group batchable requests by the params synthesize_batch shares
        groups: Dict[tuple, List[_Pending]] = {}
        singles: List[_Pending] = []
        for item in batch:
            if _batchable(item.kwargs):
                key = (float(item.kwargs.get("noise_scale", 0.667)),
                       int(item.kwargs.get("seed", 0)))
                groups.setdefault(key, []).append(item)
            else:
                singles.append(item)

        for (noise_scale, seed), items in groups.items():
            if len(items) == 1:
                singles.append(items[0])
                continue
            try:
                results = self.engine.synthesize_batch(
                    phones_list=[it.phones for it in items],
                    speakers=[it.kwargs.get("speaker", 0) for it in items],
                    noise_scale=noise_scale,
                    seed=seed,
                )
                for it, res in zip(items, results):
                    it.result = res
            except BaseException as e:  # noqa: BLE001 - delivered to callers
                for it in items:
                    it.error = e
            finally:
                for it in items:
                    it.done.set()

        for it in singles:
            try:
                it.result = self.engine.synthesize(
                    phones=it.phones, **it.kwargs)
            except BaseException as e:  # noqa: BLE001
                it.error = e
            finally:
                it.done.set()
