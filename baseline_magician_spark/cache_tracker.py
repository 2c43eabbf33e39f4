"""Tracked ``persist()`` sites and their release hook.

Operators that cache an intermediate frame consumed by two branches of
the SAME returned plan (the CDC chunk relation, the compositions'
cleaned-survivor corpus) cannot unpersist inside the builder — the
caller has not materialized the plan yet. Left alone, those caches
accumulate across a long-lived session (the 233-query driver sweep)
until the ContextCleaner gets around to them, pressuring executor
storage memory (ADVICE r10).

Fix: builders route ``df.persist()`` through :func:`track`, and the
query registry releases ALL tracked caches right before building the
NEXT query (by then the previous query's plan has been materialized
by the driver/bench loop). ``release_all`` is also safe to call from
test teardown or any harness checkpoint — unpersisting an
already-unpersisted frame is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Record a persisted frame for deferred release; returns it."""
    _TRACKED.append(df)
    return df


def release_all() -> None:
    """Unpersist every tracked frame (non-blocking), newest first."""
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=False)
        except Exception:
            pass
