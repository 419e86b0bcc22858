"""Streaming windowed aggregation (watermark) ≡ batch, and
applyInPandasWithState running totals across micro-batches."""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.streaming.windowed import (running_user_totals,
                                                  windowed_event_counts)
from tests.conftest import SF_DIR

SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string, "
          "value double, props string")


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def _stream_source(spark, tmp, n_files=3):
    """Split the events table into n files so availableNow replays them
    as separate micro-batches."""
    ev = _events(spark).withColumn(
        "part", F.col("event_id") % n_files)
    src = f"{tmp}/src"
    for i in range(n_files):
        (ev.filter(F.col("part") == i).drop("part")
         .coalesce(1).write.mode("overwrite").parquet(f"{src}/f{i}"))
    # flatten: file source wants one dir of files
    flat = f"{tmp}/flat"
    os.makedirs(flat, exist_ok=True)
    k = 0
    for i in range(n_files):
        for f in os.listdir(f"{src}/f{i}"):
            if f.endswith(".parquet"):
                shutil.copy(f"{src}/f{i}/{f}", f"{flat}/part-{k}.parquet")
                k += 1
    return flat


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    flat = _stream_source(spark, str(tmp_path))
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(flat))
    out = windowed_event_counts(stream, window="30 minutes",
                                watermark="2 hours")
    q = (out.writeStream.format("memory").queryName("win_counts")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = (spark.sql("select * from win_counts")
           .orderBy("window_start", "event_type").collect())
    exp = (windowed_event_counts(_events(spark), window="30 minutes")
           .orderBy("window_start", "event_type").collect())
    # float sums accumulate in micro-batch order on the stream side and
    # partition order on the batch side — compare value_sum with an ulp
    # tolerance, everything else exactly
    assert len(got) == len(exp) and len(got) > 0
    for g, e in zip(got, exp):
        tg, te = tuple(g), tuple(e)
        assert tg[:-1] == te[:-1], (tg, te)
        assert abs(tg[-1] - te[-1]) <= 1e-9 * max(1.0, abs(te[-1])), (tg, te)


def test_running_user_totals_state_across_batches(spark, tmp_path):
    flat = _stream_source(spark, str(tmp_path))
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(flat))
    out = running_user_totals(stream)
    q = (out.writeStream.format("memory").queryName("user_totals")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    # LAST emitted row per user = final running totals == batch aggregate
    upd = spark.sql("select * from user_totals").toPandas()
    assert len(upd) > 0
    # n_events is monotone across batches → the max-count row per user is
    # its final running total (robust to sink row ordering)
    final = (upd.sort_values("n_events").groupby("user_id").tail(1)
             .set_index("user_id"))
    exp = (_events(spark).groupBy("user_id")
           .agg(F.count("*").alias("n_events"),
                F.sum("value").alias("value_sum"))
           .toPandas().set_index("user_id"))
    for uid, row in exp.iterrows():
        assert int(final.loc[uid, "n_events"]) == int(row["n_events"]), uid
        assert abs(float(final.loc[uid, "value_sum"])
                   - float(row["value_sum"])) < 1e-6, uid
