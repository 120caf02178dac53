"""Wall-clock accounting for session-scoped shared artifacts.

The engine builds a number of session-scoped, in-memory artifacts on
first use (token-hash / token-string / bigram / shingle / inverted-index
views, the CDC ``__rid`` relation, graph edge/degree/adjacency
relations, PQ codebooks, ...). They are built ONCE per (session,
corpus) and every later consumer reuses them — the "persist the index"
pattern a production pipeline runs as a separate materialization job.

Under a min-of-N bench protocol the one-time build cost lands only in
the first run of whichever query triggers it, so ``min`` discards it
and the build would appear in *no* recorded number. Every build site
attributes its wall time here, and ``bench.py`` reports the sum as
``artifact_build_seconds`` next to the query totals so the Spark-vs-
oracle ratio can be read honestly (the DuckDB oracle re-derives these
relations per query).

Not attributed (documented, not hidden): the lazily-populated pinned
small-table cache (``__spark_entry__._t``) — population happens inside
the first consumer's timed run like any Spark cache, and forcing it
eagerly just to time it would change when work executes.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from threading import Lock

SECONDS: dict[str, float] = {}
_LOCK = Lock()


@contextmanager
def building(name: str):
    """Attribute the wall time of an artifact build to ``name``."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _LOCK:
            SECONDS[name] = SECONDS.get(name, 0.0) + dt


def total() -> float:
    with _LOCK:
        return sum(SECONDS.values())


def snapshot() -> dict[str, float]:
    with _LOCK:
        return {k: round(v, 3) for k, v in sorted(SECONDS.items())}
