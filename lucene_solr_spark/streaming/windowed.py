"""Streaming analytics operators: watermarked windows + custom state.

Beyond NRT index ingestion (nrt.py), a web-scale text pipeline needs
stream-side analytics over its event firehose: windowed rollups that
tolerate late data, and custom per-key state that survives across
micro-batches. Both are expressed Spark-first:

- :func:`windowed_event_counts` — event-time tumbling/sliding window
  aggregation with a watermark (`withWatermark` + `window()`): late rows
  within the watermark still land in their window; rows later than the
  watermark are dropped, bounding state. Identical code path works on a
  batch DataFrame (window() is the same expression), which is how the
  tests pin stream ≡ batch.
- :func:`running_user_totals` — `applyInPandasWithState` custom stateful
  operator: per-key running aggregates carried in GroupState across
  micro-batches (the arbitrary-stateful-processing surface for operators
  the built-ins can't express).

No analog exists in the reference (Lucene has no streaming); this is the
training-pipeline extension, kept small and fully tested.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, DoubleType, StringType, StructField,
                               StructType)


def windowed_event_counts(events: DataFrame, window: str = "10 minutes",
                          slide: str | None = None,
                          watermark: str = "30 minutes",
                          ts_col: str = "ts",
                          key_col: str = "event_type") -> DataFrame:
    """Per-(window, key) event counts + value sums with late-data bound.

    Works identically on a streaming DataFrame (watermarked, append-mode
    emitting finalized windows) and a batch DataFrame (full history) —
    the window() expression is shared, so batch output is the streaming
    oracle."""
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    win = (F.window(F.col(ts_col), window, slide) if slide
           else F.window(F.col(ts_col), window))
    return (src.groupBy(win.alias("w"), F.col(key_col))
            .agg(F.count("*").alias("n"),
                 F.sum("value").alias("value_sum"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    key_col, "n", "value_sum"))


_TOTALS_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("value_sum", DoubleType()),
    StructField("last_event_type", StringType()),
])
_TOTALS_STATE = StructType([
    StructField("n_events", LongType()),
    StructField("value_sum", DoubleType()),
    StructField("last_event_type", StringType()),
])


def _totals_fn(key, pdfs, state: GroupState):
    n, s, last = (state.get if state.exists else (0, 0.0, None))
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        n += len(pdf)
        s += float(pdf["value"].sum())
        last = str(pdf["event_type"].iloc[-1])
    state.update((n, s, last))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "value_sum": [s], "last_event_type": [last]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running (count, value sum, last
    event type), state carried across micro-batches via
    applyInPandasWithState. Emits the updated running totals of every
    user seen in the batch (update semantics)."""
    return (events.groupBy("user_id").applyInPandasWithState(
        _totals_fn, _TOTALS_OUT, _TOTALS_STATE, "update",
        GroupStateTimeout.NoTimeout))
