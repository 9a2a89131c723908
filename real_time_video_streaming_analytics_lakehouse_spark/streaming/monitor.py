"""Streaming-query health monitoring (SURVEY §2.8 T8).

Re-expresses the reference's monitor loop
(``spark-jobs/real_time_streaming.py:463-533``): poll ``isActive`` /
``lastProgress`` / ``exception()`` across registered queries, prune the
failed ones, and report a status snapshot. Beyond the reference, a
query can register a *restart factory* so transient failures are
restarted (bounded by ``max_restarts``) instead of just dropped —
the operational gap the reference leaves open.

All state is driver-side bookkeeping over ``StreamingQuery`` handles;
nothing here touches executor data paths.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql.streaming import StreamingQuery

logger = logging.getLogger(__name__)


@dataclass
class _Tracked:
    query: StreamingQuery
    restart: Callable[[], StreamingQuery] | None = None
    restarts_used: int = 0
    last_error: str | None = None
    state: str = "active"  # active | finished | failed | restarted
    history: list[str] = field(default_factory=list)


class StreamMonitor:
    """Track named streaming queries; poll health, prune, restart.

    >>> mon = StreamMonitor(max_restarts=1)
    >>> mon.register("activity", query, restart=lambda: start_again())
    >>> mon.poll_once()      # one health sweep (the testable unit)
    >>> mon.run(interval_sec=30)   # reference-style loop
    """

    def __init__(self, max_restarts: int = 0) -> None:
        self.max_restarts = max_restarts
        self._tracked: dict[str, _Tracked] = {}

    def register(
        self,
        name: str,
        query: StreamingQuery,
        restart: Callable[[], StreamingQuery] | None = None,
    ) -> None:
        self._tracked[name] = _Tracked(query=query, restart=restart)

    @property
    def active_names(self) -> list[str]:
        return [n for n, t in self._tracked.items() if t.state == "active"]

    @property
    def failed_names(self) -> list[str]:
        return [n for n, t in self._tracked.items() if t.state == "failed"]

    def poll_once(self) -> dict[str, Any]:
        """One health sweep. Failed queries (inactive with an exception)
        are restarted if a factory + budget exist, else marked failed
        and excluded from future sweeps. Inactive queries without an
        exception (e.g. a drained ``availableNow`` run) are 'finished'.
        Returns a reference-shaped status snapshot."""
        snapshot: dict[str, Any] = {"queries": {}, "active": 0}
        for name, t in self._tracked.items():
            if t.state in ("failed", "finished"):
                snapshot["queries"][name] = {"state": t.state,
                                             "exception": t.last_error}
                continue
            q = t.query
            if q.isActive:
                t.state = "active"
                snapshot["active"] += 1
                progress = q.lastProgress or {}
                snapshot["queries"][name] = {
                    "state": "active",
                    "input_rows_per_sec": progress.get("inputRowsPerSecond"),
                    "num_input_rows": progress.get("numInputRows"),
                    "batch_id": progress.get("batchId"),
                    "exception": None,
                }
                continue
            exc = q.exception()
            if exc is None:
                t.state = "finished"
                snapshot["queries"][name] = {"state": "finished",
                                             "exception": None}
                continue
            t.last_error = str(exc)
            t.history.append(t.last_error)
            if t.restart is not None and t.restarts_used < self.max_restarts:
                t.restarts_used += 1
                logger.warning(
                    "stream %s failed (%s); restart %d/%d",
                    name, t.last_error, t.restarts_used, self.max_restarts,
                )
                try:
                    t.query = t.restart()
                except Exception as e:
                    # A failing restart factory must not abort the sweep
                    # — the monitor exists to survive query failures.
                    t.last_error = f"restart failed: {e}"
                    t.history.append(t.last_error)
                    logger.error("stream %s %s; pruned", name, t.last_error)
                    t.state = "failed"
                    snapshot["queries"][name] = {
                        "state": "failed",
                        "exception": t.last_error,
                    }
                    continue
                t.state = "active"
                snapshot["active"] += 1
                snapshot["queries"][name] = {
                    "state": "restarted",
                    "restarts_used": t.restarts_used,
                    "exception": t.last_error,
                }
            else:
                logger.error("stream %s failed, pruned: %s", name,
                             t.last_error)
                t.state = "failed"
                snapshot["queries"][name] = {"state": "failed",
                                             "exception": t.last_error}
        return snapshot

    def run(
        self,
        interval_sec: float = 30.0,
        max_cycles: int | None = None,
    ) -> dict[str, Any]:
        """Reference-style monitor loop: sweep every ``interval_sec``
        until no query is active (or ``max_cycles`` sweeps). Returns the
        final snapshot."""
        cycles = 0
        snapshot = self.poll_once()
        while snapshot["active"] > 0:
            cycles += 1
            if max_cycles is not None and cycles >= max_cycles:
                break
            time.sleep(interval_sec)
            snapshot = self.poll_once()
        return snapshot

    def status(self) -> dict[str, Any]:
        """Point-in-time status without pruning or restarting (the
        reference's ``get_stream_status``)."""
        out: dict[str, Any] = {"total": len(self._tracked), "queries": {}}
        for name, t in self._tracked.items():
            q = t.query
            out["queries"][name] = {
                "is_active": q.isActive,
                "state": t.state,
                "last_progress": q.lastProgress,
                "exception": t.last_error,
                "restarts_used": t.restarts_used,
            }
        return out

    def stop_all(self) -> None:
        """Stop every still-active query (reference ``stop_all_streams``)."""
        for name, t in self._tracked.items():
            try:
                if t.query.isActive:
                    t.query.stop()
            except Exception as e:  # pragma: no cover - defensive
                logger.error("error stopping %s: %s", name, e)
