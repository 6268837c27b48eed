"""Streaming operators: watermarked window aggregation + custom stateful
dedup.

The reference is batch-only (SURVEY.md §2: no streaming operators exist),
so these are the engine's forward-looking additions for a production
ingest path: late-data-tolerant rollups over an event stream, and an
exactly-once seen-key dedup that holds its state ACROSS micro-batches via
applyInPandasWithState — the op a continuous training-data pipeline needs
so a document re-delivered hours later is still dropped.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window rollup over a (streaming) event frame:
    (window_start, window_end, <key>, n, sum_value). Rows later than
    `watermark` past the max seen ts are dropped and their windows finalize
    — bounded state, the Structured-Streaming late-data contract."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
            "sum_value",
        )
    )


_DEDUP_STATE = StructType([StructField("seen", LongType())])


def stateful_stream_dedup(
    stream: DataFrame,
    key_col: str = "content_sha",
) -> DataFrame:
    """Exactly-once streaming dedup: the FIRST row per key passes, every
    later arrival — same micro-batch or any later one — is dropped. State
    (one long per key) lives in the state store, so restarts resume the
    seen-set from the checkpoint. applyInPandasWithState = the custom
    stateful operator path (batch analog: exact_dedup)."""
    out_schema = stream.schema

    def dedup_fn(
        key, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        first = None
        for pdf in batches:
            if len(pdf):
                first = pdf.iloc[[0]]
                break
        if first is None:
            return
        state.update((1,))
        yield first

    return stream.groupBy(key_col).applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_parquet(
    df: DataFrame,
    dest_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """Drive a streaming frame to parquet with availableNow (process the
    backlog exactly-once, then stop)."""
    q = (
        df.writeStream.format("parquet")
        .option("path", dest_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
