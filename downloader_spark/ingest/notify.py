"""A16 — new-file event notification (the declared-but-dormant hook).

The reference REQUIRES a pub/sub topic named "downloader-new-files"
at startup (/root/reference/README.md:71-74) yet contains zero
publishing code — the capability was declared and never wired.  This
module supplies the wiring the reference promised: a post-commit hook
that fires exactly once per newly *published* object (never for
duplicates, never for failed fetches), carrying the same identity the
inventory records: (name, md5, dataset, size).

Transport is pluggable behind the ``Notifier`` protocol because the
real backend (a cloud pub/sub client) is environment-specific; the
in-repo implementations are the test collector and a stdout/log
emitter.  Hook placement: AFTER the inventory append (the commit
point — subscribers may immediately read the object and find its
catalog row) and independent of the current-pointer copy (whose
failure is a permanence error but does not unpublish the object).

Delivery is at-least-once, exactly like the ingest itself: a crash
between commit and notify re-fetches the item on the next cycle,
dedup absorbs it, and no second notification fires — subscribers see
at-most-once per content, at-least-once per published object.
"""

from __future__ import annotations

from typing import NamedTuple, Protocol

TOPIC = "downloader-new-files"


class NewFileEvent(NamedTuple):
    """One published object, as subscribers should learn of it."""

    name: str
    md5: str
    dataset: str  # the SourceSpec name, e.g. "maxmind-geolite2-city"
    size: int


class Notifier(Protocol):
    def publish(self, event: NewFileEvent) -> None: ...


class CollectingNotifier:
    """Test double: records every event in order."""

    def __init__(self) -> None:
        self.events: list[NewFileEvent] = []

    def publish(self, event: NewFileEvent) -> None:
        self.events.append(event)


class PrintingNotifier:
    """Minimal local transport: one line per event on the given stream
    (the shape a pub/sub client's publish call would serialize)."""

    def __init__(self, write=None) -> None:
        import sys

        self._write = write or sys.stdout.write

    def publish(self, event: NewFileEvent) -> None:
        self._write(
            f"{TOPIC}\t{event.name}\t{event.md5}\t{event.dataset}\t{event.size}\n"
        )
