"""Host-side pipelining helpers for the streaming drivers.

Two tiny primitives shared by engine/streaming.py and models/eq.py:

- Prefetcher: runs a generator on a daemon thread with a bounded buffer
  (input staging: file read + C++ wire encode overlap the link).
- OrderedWorker: a single background worker executing submitted jobs
  strictly in order (output side: wire decode + drain + file write
  overlap the next chunk's transfers).

Both preserve exception semantics: an error on the helper thread is
re-raised on the caller's thread, at its position in the stream
(Prefetcher.get) or at the next check/join (OrderedWorker). Shutdown is
prompt even when the hand-off queue is full.
"""
from __future__ import annotations

import queue
import threading


class Prefetcher:
    """Iterate `gen` on a daemon thread, buffering up to `depth` items."""

    _DONE = object()

    def __init__(self, gen, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, args=(gen,),
                                        daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        # bounded put: a full queue with a caller that already errored
        # out must not hang this thread
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _run(self, gen):
        try:
            for item in gen:
                if not self._put(item):
                    return
        except BaseException as e:
            self._put(e)
            return
        self._put(self._DONE)

    def get(self):
        """Next item, in order. Re-raises the generator's exception at
        its stream position; raises StopIteration past the end. Both
        terminal states are sticky — a later get() raises again instead
        of blocking on the dead producer."""
        item = self._q.get()
        if item is self._DONE:
            self._q.put(self._DONE)
            raise StopIteration
        if isinstance(item, BaseException):
            self._q.put(item)
            raise item
        return item

    def close(self):
        """Stop the thread promptly (queue may still hold items)."""
        self._stop.set()
        self._thread.join(timeout=5.0)


class OrderedWorker:
    """Run submitted zero-arg callables on one thread, strictly in order.

    After a job raises, later jobs are skipped and the exception is
    re-raised on the caller's thread by check()/join().
    """

    def __init__(self, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._errs: list = []
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            job = self._q.get()
            try:
                if job is None:
                    return
                if not self._errs:
                    job()
            except BaseException as e:
                self._errs.append(e)
            finally:
                self._q.task_done()

    def submit(self, job) -> None:
        """Enqueue a callable (blocks while `depth` jobs are pending),
        then surface any earlier job's exception."""
        self._q.put(job)
        self.check()

    def check(self, join: bool = False) -> None:
        """Re-raise the first failed job's exception, if any; with
        join=True, first wait for all submitted jobs to finish."""
        if join:
            self._q.join()
        if self._errs:
            raise self._errs[0]

    def close(self):
        """Finish remaining jobs and stop the thread."""
        self._q.put(None)
        self._thread.join(timeout=5.0)
