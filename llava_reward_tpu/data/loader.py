"""Prefetching data loader: thread-pool image preprocessing overlapped with
device compute, double-buffered host->HBM transfer.

Replaces the torch DataLoader worker setup (deepspeed.py:137-180) — the
CPU preprocessing bottleneck called out in SURVEY.md §3.4. Workers run the
PIL decode + HD geometry; the main thread collates into pinned numpy
buffers and enqueues ``jax.device_put`` so step N+1's batch is already on
the device while step N computes.
"""

from __future__ import annotations

import queue
import sys
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterable, Iterator, Optional

class PrefetchLoader:
    def __init__(
        self,
        dataset,
        sampler: Iterable[int],
        batch_size: int,
        collate_fn: Callable,  # (items) -> host batch pytree
        num_workers: int = 8,
        prefetch_batches: int = 2,
        device_put: Optional[Callable] = None,  # host batch -> device batch
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.num_workers = num_workers
        self.prefetch_batches = prefetch_batches
        self.device_put = device_put
        self.drop_last = drop_last

    def __len__(self):
        n = len(self.sampler)  # type: ignore[arg-type]
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Any]:
        indices = list(self.sampler)
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def put_or_stop(msg) -> bool:
            """Timed put re-checking stop so an abandoned iterator can't
            leave the producer blocked forever on the bounded queue
            (ADVICE r1: thread + ThreadPoolExecutor leak per epoch)."""
            while not stop.is_set():
                try:
                    out_q.put(msg, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        import os
        import time as _time

        trace = os.environ.get("LRT_LOADER_TRACE") == "1"

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    # pipeline: submit item futures a batch ahead
                    futures = [
                        [pool.submit(self.dataset.__getitem__, i) for i in b]
                        for b in batches[: self.prefetch_batches + 1]
                    ]
                    next_batch = self.prefetch_batches + 1
                    for bi in range(len(batches)):
                        if stop.is_set():
                            return
                        t0 = _time.perf_counter()
                        items = [f.result() for f in futures[bi]]
                        t1 = _time.perf_counter()
                        if next_batch < len(batches):
                            futures.append(
                                [
                                    pool.submit(self.dataset.__getitem__, i)
                                    for i in batches[next_batch]
                                ]
                            )
                            next_batch += 1
                        host = self.collate_fn(items)
                        t2 = _time.perf_counter()
                        dev = self.device_put(host) if self.device_put else host
                        t3 = _time.perf_counter()
                        if trace:
                            print(
                                f"[loader] batch {bi}: decode-wait "
                                f"{t1 - t0:.3f}s collate {t2 - t1:.3f}s "
                                f"device_put {t3 - t2:.3f}s",
                                file=sys.stderr, flush=True,
                            )
                        if not put_or_stop(("item", dev)):
                            return
                put_or_stop(("done", None))
            except BaseException as e:  # propagate worker errors
                put_or_stop(("error", e))

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                kind, val = out_q.get()
                if kind == "done":
                    return
                if kind == "error":
                    raise val
                yield val
        finally:
            stop.set()
