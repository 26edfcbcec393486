"""Structured Streaming operators (validation, dedup, stateful verdicts)."""

from __future__ import annotations


def drain(query, timeout_sec: int) -> None:
    """``awaitTermination`` with the timeout treated as an ERROR.

    ``awaitTermination(t)`` returns False on timeout; ignoring that reads a
    half-written sink as the final answer and leaks the still-running query
    (plus its tmp dirs) into the shared session. ``stop()`` runs in a
    ``finally`` so even a hung query is torn down; stopping an
    already-terminated query is a no-op.
    """
    try:
        finished = query.awaitTermination(timeout_sec)
        if not finished:
            raise TimeoutError(
                f"streaming query {query.name or query.id} did not drain "
                f"within {timeout_sec}s"
            )
    finally:
        query.stop()
