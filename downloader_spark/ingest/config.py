"""Source specifications: the config table driving the ingest loop.

Mirrors the reference's per-download parameter bundle ``config``
(/root/reference/download/common.go:28-41) and its two source
families: the fixed-URL snapshot (maxmind.go:15-25,32-54) and the
log-driven incremental (routeviews.go:39-66).

Naming parity (common.go:95-101): with a fixed filename the object
name is ``path_prefix + file_prefix + fixed_filename``; otherwise
``path_prefix + m[1] + file_prefix + m[2]`` where m groups come from
``url_regexp`` applied to the URL.  The dedup scope is capture group 1
of ``dedup_regexp`` over the object name — the DOCUMENTED semantics
(the reference's production store ignores the scope, file/api.go:53;
its unit tests assert the scoped form, which we implement — SURVEY
§4.3.2).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class SourceSpec:
    name: str  # metric/watermark label
    kind: str  # "snapshot" | "incremental"
    url: str = ""  # snapshot: the file URL; incremental: the log URL
    path_prefix: str = ""
    current_name: str = ""
    file_prefix: str = ""
    url_regexp: str = ""
    dedup_regexp: str = "(.*)"
    fixed_filename: str = ""
    basic_auth: tuple[str, str] | None = None
    max_duration_s: float = 1800.0  # 30-min cap, common.go:23

    def object_name(self, url: str) -> str:
        if self.fixed_filename:
            return self.path_prefix + self.file_prefix + self.fixed_filename
        m = re.match(self.url_regexp, url)
        if not m:
            raise ValueError(f"{self.name}: URL {url!r} !~ {self.url_regexp!r}")
        return self.path_prefix + m.group(1) + self.file_prefix + m.group(2)

    def dedup_scope(self, object_name: str) -> str:
        m = re.match(self.dedup_regexp, object_name)
        if not m:
            raise ValueError(
                f"{self.name}: name {object_name!r} !~ {self.dedup_regexp!r}"
            )
        return m.group(1)


def maxmind_sources(
    timestamp: str, file_prefix: str, account_id: str = "", license_key: str = ""
) -> list[SourceSpec]:
    """The Maxmind config table (maxmind.go:15-25): one snapshot row.
    ``timestamp`` is the cycle's YYYY/MM/DD/ prefix (downloader.go:64);
    ``file_prefix`` the per-file UTC stamp (maxmind.go:40)."""
    return [
        SourceSpec(
            name="maxmind-geolite2-city",
            kind="snapshot",
            url="https://example.invalid/geolite2-city.tar.gz",  # injected in tests
            path_prefix="Maxmind/" + timestamp,
            current_name="Maxmind/current/GeoLite2-City.tar.gz",
            file_prefix=file_prefix,
            fixed_filename="GeoLite2-City.tar.gz",
            dedup_regexp=r"(.*/).*/.*",  # month-directory scope, maxmind.go:13
            basic_auth=(account_id, license_key) if account_id else None,
        )
    ]


def routeviews_source(name: str, log_url: str, directory: str, current: str) -> SourceSpec:
    """A RouteViews incremental source (routeviews.go:17-19,46-55):
    URL regex lifts the YYYY/MM/ partition out of the source URL."""
    return SourceSpec(
        name=name,
        kind="incremental",
        url=log_url,
        path_prefix=directory,
        current_name=current,
        url_regexp=r".*?(\d{4}/\d{2}/)(.*)",
        dedup_regexp=r"(.*)",  # whole-name scope, routeviews.go:19
    )


# The creation-log row shape (routeviews.go:25-31, regex at :77):
# seqnum (<=6 digits), unix timestamp (10 digits), path.
CREATION_LOG_REGEX = r"(\d{1,6})\s*(\d{10})\s*(.*)"
