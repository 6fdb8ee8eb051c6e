"""Retry ladder with exponential backoff and error permanence.

Mirrors the reference's ``runFunctionWithRetry`` + ``errWithPermanence``
(/root/reference/download/common.go:134-160) behaviorally:

- run the function; success returns immediately;
- a PERMANENT failure returns the error without retrying;
- a recoverable failure sleeps ``retry_time`` then doubles it;
- once ``retry_time`` exceeds ``retry_max`` the next failure is final.

And the randomized cycle trigger ``GenUniformSleepTime``
(common.go:47-49): uniform in [interval - deviation/2,
interval + deviation/2] — an anti-thundering-herd jitter.

On a cluster this driver-side ladder only guards driver-side fetches;
executor-side task failures are covered by ``spark.task.maxFailures``.
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")


class PermanentError(Exception):
    """An error that retrying cannot fix (reference: errWithPermanence
    with permanent=True, e.g. copy-to-current failure at
    common.go:115-121)."""


def run_with_retry(
    fn: Callable[[], T],
    retry_min_s: float = 60.0,
    retry_max_s: float = 480.0,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Run ``fn`` under the reference's retry ladder (defaults: 1 min
    first wait, give up past 8 min — common.go:21-22).

    ``sleep`` is injectable so tests run instantly while asserting the
    exact ladder (the reference golden-tests all four retry paths at
    download/common_test.go:211-256; tests/test_ingest.py mirrors
    them).
    """
    retry_time = retry_min_s
    while True:
        try:
            return fn()
        except PermanentError:
            raise
        except Exception:
            if retry_time > retry_max_s:
                raise
            sleep(retry_time)
            retry_time *= 2


def gen_uniform_sleep_time(
    interval_s: float, deviation_s: float, rng: random.Random | None = None
) -> float:
    """Uniform jittered cycle sleep centered on ``interval_s``
    (reference defaults: 24 h ± 2 h, downloader.go:22,26)."""
    r = rng or random
    return (r.random() - 0.5) * deviation_s + interval_s
