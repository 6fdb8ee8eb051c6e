"""Streaming metrics: the listener layer of A15
(/root/reference/metrics/metrics.go:13-53 exposes Prometheus
counters; downloader.go:98-100 advances a last-success gauge).

``ProgressCapture`` is a ``StreamingQueryListener`` that folds every
micro-batch's progress into labeled counters (rows in, batches,
per-query totals) and tracks the last successful batch timestamp —
the same series the reference exports, fed by the engine's own
progress events instead of hand-placed increments.  ``metrics_df``
renders them as the analytic DataFrame form (matching
``Downloader.metrics_df`` and the ``metrics_rollup`` key).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressCapture(StreamingQueryListener):
    def __init__(self) -> None:
        self.rows_in: Counter[str] = Counter()
        self.batches: Counter[str] = Counter()
        self.last_progress_ts: str | None = None
        self.terminated_with_error: list[str] = []

    # -- listener callbacks -------------------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        name = p.name or p.id
        self.rows_in[str(name)] += int(p.numInputRows)
        self.batches[str(name)] += 1
        self.last_progress_ts = p.timestamp

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        if event.exception is not None:
            self.terminated_with_error.append(str(event.exception))

    # -- analytic surface ---------------------------------------------
    def metrics_df(self, spark: SparkSession) -> DataFrame:
        rows = [
            ("streaming_rows_in_total", q, float(v))
            for q, v in sorted(self.rows_in.items())
        ] + [
            ("streaming_batches_total", q, float(v))
            for q, v in sorted(self.batches.items())
        ]
        return spark.createDataFrame(
            rows, "metric string, label string, value double"
        )
