"""Lightweight event timing registry.

TPU-native stand-in for PETSc's event logging
(/root/reference/alfi/driver.py:77-92,
/root/reference/alfi/transfer.py:186-192 @timed_function): named
wall-clock accumulators around device computations (timers call
``block_until_ready`` on outputs so XLA async dispatch doesn't hide the
cost).  Event names mirror the reference's so reports stay comparable
(SNESSolve, KSPSolve, PCApply, PCPATCHSolve, SchoeberlProlong, ...).
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

import jax

EVENTS: dict = defaultdict(lambda: {"time": 0.0, "count": 0})


def reset():
    EVENTS.clear()


@contextmanager
def timed_region(name):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        ev = EVENTS[name]
        ev["time"] += dt
        ev["count"] += 1


def timed_function(name):
    def deco(fn):
        def wrapped(*args, **kwargs):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            out = jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            ev = EVENTS[name]
            ev["time"] += dt
            ev["count"] += 1
            return out

        wrapped.__name__ = getattr(fn, "__name__", name)
        return wrapped

    return deco
