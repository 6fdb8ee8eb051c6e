"""Thread-pooled sweep runner for the whole-registry parametrized tests.

The suite's full-registry sweeps (degenerate-corpus x3, oracle parity,
schema contract) are Spark *driver-latency* bound: each key resolves to
a handful of tiny jobs whose wall time is scheduler round-trips, not
compute (round-17 entry: suite wall 27m54s vs 8m28s user+sys).  Spark's
scheduler runs concurrent actions from driver threads happily
(optimization guide §2.6 — actions are only sequential because the
driver calls them sequentially), so each sweep chunk runs its keys from
a small driver thread pool, preserving one assertion per key and a
per-key failure report while overlapping the latency.

Chunking keeps pytest progress output (and ``-x`` abort) at ~32-key
resolution instead of one opaque mega-test.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from concurrent.futures import ThreadPoolExecutor

WORKERS = 12
CHUNK = 32


def chunks(keys: Iterable[str]) -> list[list[str]]:
    ks = sorted(keys)
    return [ks[i : i + CHUNK] for i in range(0, len(ks), CHUNK)]


def chunk_ids(keys: Iterable[str]) -> list[str]:
    return [f"{c[0]}..{c[-1]}" for c in chunks(keys)]


def run_chunk(
    keys: list[str], check: Callable[[str], None], workers: int = WORKERS
) -> None:
    """Run ``check(key)`` for every key on a driver thread pool; fail
    with a per-key report listing EVERY failing key in the chunk (a
    sequential parametrized run would stop at the first)."""

    def one(k: str) -> str | None:
        try:
            check(k)
        except Exception as e:  # noqa: BLE001 — reported per key below
            return f"{k}: {type(e).__name__}: {e}"
        return None

    with ThreadPoolExecutor(max_workers=workers) as pool:
        errs = [m for m in pool.map(one, keys) if m]
    assert not errs, "per-key failures:\n" + "\n".join(errs)
