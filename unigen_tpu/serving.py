"""Production serving: micro-batching request server for TPU pipelines.

The reference serves with ad-hoc scripts (infer.py loops over a dataset);
a production TPU deployment instead wants a server that (a) keeps ONE
compiled program hot at the throughput-optimal batch size (b=8 on v5e:
0.386 -> 1.308 img/s/chip from b=1 to b=8, bench.py) and (b) never
recompiles — XLA programs are shape-specialized, so variable request rates
must be absorbed by PADDING a fixed batch, not by batching dynamically.

``MicroBatchServer`` implements that: requests enqueue per-sample input
dicts; a worker thread collects up to ``batch_size`` requests (waiting at
most ``max_wait_ms`` once the first request of a batch arrives), pads the
tail by repeating the first request's tensors (pad outputs are discarded),
concatenates along axis 0, runs the supplied ``run_batch`` callable (e.g. a
jitted pipeline program), splits the outputs back per request, and resolves
each request's Future. Total work per wall-clock second is bounded by the
single TPU program; the server adds only host-side concat/split.

Usage:
    pipe = load_flux_pipeline(...)            # quantized serving tree
    def run_batch(inputs):
        return pipe.generate(**inputs, num_inference_steps=4)
    srv = MicroBatchServer(run_batch, batch_size=8)
    fut = srv.submit(prompt_embeds=e, pooled=p, cond_pooled=c,
                     control_pixels=img)      # each leading dim 1
    image = fut.result()[0]
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import numpy as np


@dataclass
class _Request:
    inputs: Dict[str, Any]
    future: Future
    n: int                      # samples in this request (leading-dim size)


@dataclass
class ServerStats:
    batches: int = 0
    requests: int = 0
    samples: int = 0
    padded_samples: int = 0

    @property
    def wasted_pad_fraction(self) -> float:
        """Fraction of program-batch compute spent on discarded pad rows."""
        total = self.samples + self.padded_samples
        return self.padded_samples / total if total else 0.0


class MicroBatchServer:
    """Pads-and-batches requests into a fixed-shape program call.

    run_batch: dict of arrays (leading dim == the dispatched program size)
        -> array or pytree of arrays with the same leading dim.
    batch_size: the LARGEST compiled program batch (v5e sweet spot: 8).
    batch_sizes: optional ascending ladder of program sizes (e.g. (1, 2, 8)).
        Each dispatch pads only up to the SMALLEST size that fits the
        collected requests, so low load runs the b=1/b=2 programs instead of
        paying 8x compute on a padded b=8 batch (the b=1..8 throughput curve
        is nearly flat on v5e — 1.185/1.371/1.309 img/s — so small programs
        cost ~nothing in throughput and save the pad waste entirely). XLA
        compiles one program per size on first use; pipelines cache per-shape
        programs already, so the ladder warms up in the first few calls.
    max_wait_ms: max time the worker holds an incomplete batch after its
        first request arrived. 0 flushes immediately (latency-optimal).
    """

    def __init__(self, run_batch: Callable[[Dict[str, Any]], Any],
                 batch_size: int = 8, max_wait_ms: float = 50.0,
                 batch_sizes: Optional[List[int]] = None):
        assert batch_size >= 1
        self._run = run_batch
        if batch_sizes is not None:
            assert batch_sizes, "batch_sizes must be non-empty"
            self.batch_sizes = tuple(sorted(set(int(b) for b in batch_sizes)))
            batch_size = self.batch_sizes[-1]
        else:
            self.batch_sizes = (batch_size,)
        self.batch_size = batch_size
        self.max_wait = max_wait_ms / 1000.0
        self.stats = ServerStats()
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._closed = False
        self._close_lock = threading.Lock()   # orders submit() vs close()
        self._carry: Optional[_Request] = None   # didn't fit the last batch
        self._shutdown = False
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------ client

    def submit(self, **inputs) -> Future:
        """Enqueue one request. Every array must share the same leading dim
        (usually 1); returns a Future resolving to the request's slice of
        the program output (leading dim preserved)."""
        sizes = {k: np.shape(v)[0] for k, v in inputs.items()
                 if hasattr(v, "shape") and np.ndim(v) > 0}
        n = next(iter(sizes.values()), 1)
        assert all(s == n for s in sizes.values()), \
            f"inconsistent leading dims: {sizes}"
        assert n <= self.batch_size, \
            f"request of {n} samples exceeds batch_size={self.batch_size}"
        fut: Future = Future()
        # the closed-check and the enqueue are one atomic section vs close():
        # without the lock a submit racing close() could pass the check and
        # land BEHIND the shutdown sentinel, leaving its future unresolved
        with self._close_lock:
            if self._closed:
                raise RuntimeError("server is closed")
            self._q.put(_Request(inputs, fut, n))
        return fut

    def close(self, *, drain: bool = True):
        """Stop the worker. With drain=True pending requests complete first;
        otherwise queued-but-undispatched requests are cancelled (their
        futures report .cancelled())."""
        with self._close_lock:
            self._closed = True
        if not drain:
            # pull everything still queued and cancel it; in-flight batches
            # (already collected by the worker) still complete
            while True:
                try:
                    r = self._q.get_nowait()
                except queue.Empty:
                    break
                if r is not None:
                    r.future.cancel()
        self._q.put(None)
        self._worker.join()

    # ------------------------------------------------------------ worker

    def _collect(self) -> Optional[List[_Request]]:
        """Block for the first request, then fill up to batch_size for at
        most max_wait. None = shutdown. A request that does not fit the
        current batch is held in ``self._carry`` (never re-queued — that
        would break FIFO and could land behind the shutdown sentinel,
        silently dropping it)."""
        if self._carry is not None:
            first, self._carry = self._carry, None
        else:
            first = self._q.get()
            if first is None:
                return None
        batch, filled = [first], first.n
        import time
        t_end = time.monotonic() + self.max_wait
        while filled < self.batch_size:
            timeout = t_end - time.monotonic()
            if timeout <= 0:
                break
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                self._shutdown = True   # dispatch this batch, then exit
                break
            if filled + nxt.n > self.batch_size:
                self._carry = nxt       # heads the NEXT batch (FIFO kept)
                break
            batch.append(nxt)
            filled += nxt.n
        return batch

    def _loop(self):
        while True:
            batch = self._collect()
            if batch is None:
                return
            try:
                self._dispatch(batch)
            except Exception as e:  # resolve futures with the error
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)
            if self._shutdown and self._carry is None:
                return

    def _dispatch(self, batch: List[_Request]):
        filled = sum(r.n for r in batch)
        # smallest compiled program that fits the collected requests
        target = next(b for b in self.batch_sizes if b >= filled)
        pad = target - filled
        keys = batch[0].inputs.keys()
        assert all(r.inputs.keys() == keys for r in batch), \
            "all requests must carry the same input names"

        def cat(k):
            parts = [np.asarray(r.inputs[k]) for r in batch]
            if pad:
                first = parts[0][:1]
                parts.append(np.repeat(first, pad, axis=0))
            return np.concatenate(parts, axis=0)

        out = self._run({k: cat(k) for k in keys})
        self.stats.batches += 1
        self.stats.requests += len(batch)
        self.stats.samples += filled
        self.stats.padded_samples += pad

        import jax
        # ONE device->host materialisation per leaf, then host-side slicing
        # (per-request np.asarray would pull the full batch output once per
        # request through the fragile tunnel d2h path)
        out = jax.tree.map(np.asarray, out)
        leaves = jax.tree.leaves(out)
        assert leaves and all(np.shape(l)[0] == target for l in leaves), \
            "run_batch must preserve the leading batch dim"
        off = 0
        for r in batch:
            sl = slice(off, off + r.n)
            if not r.future.done():
                r.future.set_result(jax.tree.map(lambda l: l[sl], out))
            off += r.n
