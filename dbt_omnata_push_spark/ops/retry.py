"""Retry with exponential backoff for executor-side connector calls.

Remote push calls fail transiently (rate limits, timeouts). The policy
lives HERE, not in connectors, so every connector gets uniform behavior,
and the push pipelines stay idempotent under retry because log-entry ids
are deterministic (SURVEY.md §7 hard-part 1): a Spark task retry that
re-pushes a batch upserts the same log rows rather than duplicating.

Per-RECORD failures (the API answering success=false) are NOT retried —
they are results, captured into the log table exactly as the reference
records them (RESULT:"success"=false, accounts_load.sql:27 filters on
it next run, naturally re-pushing failed records).
"""

from __future__ import annotations

import time


class RetryPolicy:
    def __init__(
        self,
        max_attempts: int = 3,
        base_delay_s: float = 0.5,
        backoff: float = 2.0,
        retryable: tuple[type[Exception], ...] = (ConnectionError, TimeoutError),
    ):
        self.max_attempts = max_attempts
        self.base_delay_s = base_delay_s
        self.backoff = backoff
        self.retryable = retryable

    def call(self, fn, *args, **kwargs):
        delay = self.base_delay_s
        for attempt in range(1, self.max_attempts + 1):
            try:
                return fn(*args, **kwargs)
            except self.retryable:
                if attempt == self.max_attempts:
                    raise
                time.sleep(delay)
                delay *= self.backoff
