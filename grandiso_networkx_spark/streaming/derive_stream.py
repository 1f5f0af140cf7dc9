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


def stream_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessionization ``(user_id, session_start, session_end,
    n_events)`` via the built-in ``session_window`` (gap-merged event
    windows, closed once the watermark passes) — the streaming twin of
    the batch lag-over-window sessionizer (``q_event_sessions``): both
    cut a new session after ``gap`` of inactivity, so completed
    sessions agree.

    State is managed by Spark's session-window store (merge-on-arrival,
    eviction at watermark), no custom stateful code; the aggregation is
    a plain count, map-side combined inside the micro-batch."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(key_col), F.session_window(F.col(ts_col), gap).alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup_docs(
    docs: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact dedup: first-seen wins per whitespace-normalized
    content fingerprint (the batch ``fingerprint`` semantics), with
    state bounded by the watermark via
    ``dropDuplicatesWithinWatermark`` — two documents with the same
    content inside the watermark horizon emit once; the fingerprint
    store is evicted as event time advances, so state never grows with
    the corpus (the property that makes streaming dedup viable at all
    at ingest scale)."""
    fp = F.md5(
        F.regexp_replace(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))),
                         r"\s+", " ")
    )
    return (
        docs.withColumn("fingerprint", fp)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


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


def stream_distinct_convs(
    transcripts: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    rsd: float = 0.05,
) -> DataFrame:
    """Windowed approximate distinct conversations per role
    ``(window_start, role, n_convs)`` — the streaming cardinality
    monitor (how many conversations touched each role per window).

    Uses the built-in HyperLogLog++ (``approx_count_distinct``) so the
    per-window state is a constant-size sketch, never a distinct-set:
    the same watermark discipline as the other windowed aggregates,
    O(1) memory per (window, role) regardless of conversation count —
    the only formulation that survives 10^9 conversations/window.
    HLL++ is deterministic for a given input set (hash-based, merge
    commutative), so streaming output equals the batch aggregate over
    the same files (pinned in tests/test_streaming.py)."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("role"))
        .agg(F.approx_count_distinct("conv_id", rsd).alias("n_convs"))
        .select(F.col("win.start").alias("window_start"), "role", "n_convs")
    )


def stream_enrich_turns(
    transcripts: DataFrame, conv_dim: DataFrame
) -> DataFrame:
    """Stream-static join: each streaming turn enriched with its
    conversation's static dimension row (tenant/experiment metadata —
    whatever the batch side carries alongside ``conv_id``).

    The static side is planned per micro-batch (re-read each trigger,
    so slowly-changing dims stay fresh) and broadcast when small —
    the standard enrichment shape; no watermark needed because a
    stream-static INNER join is stateless.  Rows whose ``conv_id`` is
    missing from the dimension are dropped (inner semantics; use a
    left join on the caller side for keep-unmatched)."""
    dim = conv_dim.withColumnRenamed("conv_id", "__dim_conv")
    return transcripts.join(
        dim, transcripts["conv_id"] == dim["__dim_conv"], "inner"
    ).drop("__dim_conv")


def stream_cms_cells(
    transcripts: DataFrame,
    key_expr: str = "concat('tool:', tool)",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    depth: int = 4,
    width: int = 256,
    seed: int = 42,
) -> DataFrame:
    """Streaming count–min sketch increments ``(window_start, r, c,
    n)`` — the incremental twin of ``operators/cms.cms_build`` over a
    key stream derived from the transcript stream (default: tool
    invocations, the hot-key monitor).

    Per micro-batch each key lands in its d portable-hash cells (the
    IDENTICAL ``md5(key|r|seed) % w`` arithmetic as the batch build),
    then a watermarked windowed count reduces to ≤ d·w rows per
    window — constant state per window regardless of key cardinality,
    the same reason the batch build survives 10¹¹ distinct keys.
    Cell-wise summing the emitted increments over all windows yields
    BIT-FOR-BIT the batch ``cms_build`` grid over the same files
    (sketch merge = addition; pinned in tests/test_streaming.py), so a
    compaction job can maintain the running sketch with one tiny
    ``groupBy(r, c)`` per compaction.
    """
    from ..operators.cms import _cell

    keyed = transcripts.where(F.col("tool").isNotNull()).select(
        "ts", F.expr(key_expr).cast("string").alias("key")
    )
    copies = None
    for r in range(depth):
        part = keyed.select(
            "ts",
            F.lit(r).alias("r"),
            _cell(F.col("key"), r, seed, width).alias("c"),
        )
        copies = part if copies is None else copies.unionAll(part)
    return (
        copies.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "r", "c")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("window_start"), "r", "c", "n")
    )


_PACK_STATE_SCHEMA = "cum long"
_PACK_OUT_SCHEMA = (
    "shard long, seq long, doc_id long, piece_start long, piece_len long"
)


def _pack_fn(key, pdf_iter, state: GroupState):
    """Per-shard packing state = the shard's running token total; each
    micro-batch extends the concat stream in deterministic (doc_id)
    order within the batch.  All arithmetic is vectorized numpy — the
    only Python loop is over pandas batches."""
    import numpy as np

    (shard,) = key
    cum0 = state.get[0] if state.exists else 0
    outs = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values("doc_id")
        n = pdf["n"].to_numpy(dtype="int64")
        if len(n) == 0:
            continue
        budget = int(pdf["budget"].iloc[0])
        ends = cum0 + np.cumsum(n)
        starts = ends - n
        first = starts // budget
        last = (ends - 1) // budget
        reps = (last - first + 1).astype("int64")
        doc_idx = np.repeat(np.arange(len(n)), reps)
        # window index within each doc's span: global position minus
        # the span's first position, offset by the span's first window
        pos = np.arange(reps.sum()) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps
        )
        seq = first[doc_idx] + pos
        lo = seq * budget
        hi = lo + budget
        piece_start = np.maximum(lo - starts[doc_idx], 0)
        piece_len = np.minimum(ends[doc_idx], hi) - np.maximum(
            starts[doc_idx], lo
        )
        outs.append(
            pd.DataFrame(
                {
                    "shard": shard,
                    "seq": seq,
                    "doc_id": pdf["doc_id"].to_numpy()[doc_idx],
                    "piece_start": piece_start,
                    "piece_len": piece_len,
                }
            )
        )
        cum0 = int(ends[-1])
    state.update((cum0,))
    yield from outs or [
        pd.DataFrame(
            columns=["shard", "seq", "doc_id", "piece_start", "piece_len"]
        )
    ]


def stream_pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """Streaming twin of ``operators/packing.pack_sequences``: as
    document files land, each hash shard's token stream keeps growing
    and new exactly-``budget`` training windows are emitted
    incrementally — per-shard state is ONE long (the running token
    total), constant regardless of corpus size.

    Token counting and shard assignment stay JVM-side expressions
    (identical to the batch op); the stateful kernel sees only
    ``(shard, doc_id, n)`` and does vectorized numpy window
    arithmetic.  Equivalence: a single-batch stream over files sorted
    by ``doc_id`` emits byte-identical rows to the batch op (pinned in
    tests/test_streaming.py); across multiple micro-batches the concat
    order is arrival-then-doc_id — the streaming definition of the
    layout, with windows never rewritten once emitted (append-only
    sink).
    """
    from ..functions.hashing import hash60
    from ..operators.textstats import token_count

    if budget <= 0:
        raise ValueError("budget must be positive")
    d = (
        docs.select(
            F.col("doc_id"),
            token_count(F.col(text_col)).alias("n"),
            F.lit(budget).cast("long").alias("budget"),
        )
        .where(F.col("n") > 0)
        .withColumn(
            "shard",
            F.pmod(hash60(F.col("doc_id").cast("string")), F.lit(n_shards)),
        )
    )
    return d.groupBy("shard").applyInPandasWithState(
        _pack_fn,
        _PACK_OUT_SCHEMA,
        _PACK_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
