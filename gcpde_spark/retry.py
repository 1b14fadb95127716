"""Retry with exponential backoff — the reference's published budgets.

The reference wraps its storage/table RPCs in fixed retry envelopes
(recorded verbatim in BASELINE.md):

- GCS download: 7 attempts, exponential backoff capped at 5 s
  (gcpde/gcs.py:221-235)
- chunked insert: 10 attempts, backoff floor 1 s (gcpde/bq.py:367-375)
- DDL create: 3 attempts on Conflict (gcpde/bq.py:321-329)

Here only the IDEMPOTENT file operations retry (read, whole-file
overwrite, copy): re-running them after a transient failure converges to
the same state. The reference's per-chunk insert retry has no wrapper on
this engine's insert path on purpose — an insert is a distributed Spark
append whose re-run would DUPLICATE rows; Spark's own task-level retry
(``spark.task.maxFailures``) already re-executes failed write tasks with
attempt-scoped output files, which is the correct (exactly-once) analog.
"""

from __future__ import annotations

import time
from typing import Any, Callable

#: reference budgets (attempts, backoff floor s, backoff cap s)
DOWNLOAD_BUDGET = (7, 1.0, 5.0)
UPLOAD_BUDGET = (10, 1.0, None)
CREATE_BUDGET = (3, 1.0, None)


def with_retries(
    fn: Callable[[], Any],
    attempts: int,
    min_sleep_s: float = 1.0,
    max_sleep_s: float | None = None,
    retry_on: tuple[type[BaseException], ...] = (IOError, OSError),
    sleep: Callable[[float], None] = time.sleep,
) -> Any:
    """Run ``fn`` with up to ``attempts`` tries; backoff doubles from
    ``min_sleep_s``, capped at ``max_sleep_s``. Only exceptions in
    ``retry_on`` are retried — anything else propagates immediately
    (parity with the reference retrying specific RPC errors, not all)."""
    delay = min_sleep_s
    for attempt in range(attempts):
        try:
            return fn()
        except retry_on:
            if attempt == attempts - 1:
                raise
            sleep(delay if max_sleep_s is None else min(delay, max_sleep_s))
            delay *= 2
