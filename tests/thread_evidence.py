"""Crash-proof evidence capture for the REAL-thread concurrency tests.

VERDICT r19 #1: `test_threaded_ingest_optimize_retention_triad` flaked
once in three full-suite runs and the traceback was lost to an output
pipe — a recurrence taught nothing. Every racing test now records its
OP SCHEDULE (thread, op, committed version, monotonic timestamp) as it
runs, and any failure — a thread body raising, or a main-thread
invariant check failing — dumps the full schedule plus traceback to a
JSON artifact under ``.fixtures/thread_evidence/`` before re-raising.
A future flake leaves a replayable interleaving on disk no matter what
happens to the test runner's pipes.

Usage::

    ev = Evidence("triad")
    def ingest():
        ...
        v = w.append(...)
        ev.op("ingest", "append", version=v, batch=b)
    futs = [ex.submit(ev.wrap("ingest", ingest)), ...]
    ...
    ev.check(got == expected, "final state mismatch",
             got=got, expected=expected)

The helper never swallows an exception — it writes the artifact and
re-raises, so pytest semantics are unchanged when the pipe survives.
"""

from __future__ import annotations

import json
import os
import threading
import time
import traceback


class Evidence:
    def __init__(self, test_name: str, seed=None):
        self.test_name = test_name
        self.seed = seed
        self._lock = threading.Lock()
        self._t0 = time.monotonic()
        self.events: list[dict] = []
        self.dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "..", ".fixtures", "thread_evidence",
        )

    def op(self, thread: str, op: str, **detail) -> None:
        """Record one schedule event (thread-safe, monotonic-ordered).
        Call AFTER a commit attempt resolves, with its outcome — the
        committed version (the log's own serialization order), a loud
        loss, or a no-op — so a dump reconstructs the interleaving."""
        evt = {
            "t_ms": round((time.monotonic() - self._t0) * 1000, 3),
            "thread": thread,
            "op": op,
            **detail,
        }
        with self._lock:
            self.events.append(evt)

    def wrap(self, name: str, fn):
        """``fn`` with crash-proof capture: an exception in the thread
        body dumps the schedule + full traceback to the artifact file
        BEFORE re-raising (the future's .result() still re-raises it,
        so pytest behavior is unchanged — the artifact just survives a
        lost pipe)."""

        def inner(*a, **k):
            try:
                return fn(*a, **k)
            except BaseException as e:  # noqa: BLE001 - capture then re-raise
                self.dump(failed_thread=name,
                          error=repr(e),
                          traceback=traceback.format_exc())
                raise

        return inner

    def dump(self, **extra) -> str:
        """Write the artifact (schedule + context) and return its path.
        Append-safe under concurrent failing threads: each dump gets its
        own file keyed by pid + monotonic ns."""
        os.makedirs(self.dir, exist_ok=True)
        path = os.path.join(
            self.dir,
            f"{self.test_name}-{os.getpid()}-{time.monotonic_ns()}.json",
        )
        with self._lock:
            payload = {
                "test": self.test_name,
                "seed": self.seed,
                "wall_time": time.strftime("%Y-%m-%dT%H:%M:%S"),
                "n_events": len(self.events),
                "events": list(self.events),
                **extra,
            }
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=1, default=str)
        os.replace(tmp, path)
        # also to stderr — belt and braces; the FILE is the real record
        print(f"[thread_evidence] {path}", flush=True)
        return path

    def check(self, cond: bool, msg: str, **context) -> None:
        """Main-thread invariant assert that dumps the schedule on
        failure — the fold-oracle mismatches are exactly the failures
        whose diagnosis needs the interleaving."""
        if cond:
            return
        path = self.dump(assertion=msg, **context)
        raise AssertionError(f"{msg} (evidence: {path})")
