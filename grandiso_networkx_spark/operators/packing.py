"""Training-batch assembly — sequence packing, sliding-window
chunking, and deterministic corpus mixing (§2.7 pipeline class).

These are the three passes that turn a curated document corpus into
model-ready token streams:

- ``pack_sequences`` — GPT-style concat-and-split packing: documents
  are concatenated in a stable order and the token stream is cut into
  fixed-``budget`` windows, so every window is exactly full and a
  document that straddles a boundary is split (the standard
  pretraining layout, per e.g. the GPT-3 / PaLM data sections).
- ``chunk_documents`` — sliding-window chunking with overlap
  (RAG/eval-style): each document independently yields windows of
  ``chunk`` tokens advancing by ``stride``.
- ``mixture_weights`` / ``mixture_sample`` — domain-mixing: compute
  per-source sampling weights against a target token-share mix, then
  realize the mix as a deterministic hash-thresholded up/down-sample
  (epoch replication for weights > 1).

Scale shape (the 100 TB contract):

- ``pack_sequences`` shards the corpus by a portable hash of the doc
  id FIRST, then packs each shard independently with one
  ``Window.partitionBy(shard)`` running sum — a single hash-partition
  exchange followed by per-partition sorts; no global sort, no driver
  state.  Sequence ids are ``(shard, seq)`` pairs so they are globally
  unique without coordination.  Shard count is the parallelism knob:
  at 10^12 turns you raise ``n_shards`` to thousands and every shard
  is an independent ~equal slice (hash-balanced over doc ids).
- ``chunk_documents`` and ``mixture_sample`` are row-local
  projections — zero shuffles, predicates and projection push into
  the scan, and the per-row work is all JVM (``sequence`` + ``explode``
  + ``slice``; no Python).
- ``mixture_weights`` is one tiny per-source aggregate.

Determinism: shard assignment and sampling draws use the portable
60-bit md5 hash (``functions/hashing.py``), and the fractional part of
each mixing weight is pre-quantized IN PYTHON to an integer threshold
out of ``mod`` so both Spark and any SQL replay compare longs — no
float comparisons cross the engine boundary.  Every operator here is
value-checkable bit-for-bit against DuckDB (see ``__spark_entry__``).

Reference scope note: the reference engine (grandiso-networkx) has no
data-pipeline surface; these operators are the task-mandated
training-data extensions (SURVEY.md §2.7) and follow the published
shapes above rather than any reference code.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.hashing import hash60, hash60_keyed
from .textstats import token_count


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-and-split packing plan: one row per (document × training
    window it lands in).

    Documents are ordered by ``id_col`` within ``n_shards`` hash
    shards; each shard's whitespace-token stream is cut into windows
    of exactly ``budget`` tokens (the last window of a shard may be
    partial).  Output columns:

    - ``shard``       — hash shard (0..n_shards-1)
    - ``seq``         — window index within the shard
    - ``doc_id``      — the contributing document
    - ``piece_start`` — 0-based token offset WITHIN the document where
      this window's piece begins
    - ``piece_len``   — number of tokens the document contributes to
      this window (≥1)

    Zero-token documents are dropped (they contribute nothing to any
    window).  A document longer than ``budget`` spans multiple
    consecutive windows — the explode enumerates every window it
    touches.  The piece arithmetic is pure JVM column math; the only
    exchange in the plan is the hash partition by ``shard``.

    PRECONDITION: ``id_col`` values are unique (the documents table's
    key).  Duplicate ids would make the within-shard order — and
    therefore the window layout — ambiguous between runs; dedup first
    (``exact_dedup``/``near_dedup_keep``) as any real pipeline does.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count(F.col(text_col)).alias("__n"),
    ).where(F.col("__n") > 0)
    d = d.withColumn(
        "shard", F.pmod(hash60(F.col("doc_id").cast("string")), F.lit(n_shards))
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    d = d.withColumn("__cum", F.sum("__n").over(w)).withColumn(
        "__start", F.col("__cum") - F.col("__n")
    )
    b = F.lit(budget).cast("long")
    d = d.select(
        "shard",
        "doc_id",
        "__n",
        "__start",
        "__cum",
        F.explode(
            F.sequence(
                F.floor(F.col("__start") / b),
                F.floor((F.col("__cum") - 1) / b),
            )
        ).alias("seq"),
    )
    win_lo = F.col("seq") * b
    win_hi = (F.col("seq") + 1) * b
    return d.select(
        "shard",
        F.col("seq").cast("long").alias("seq"),
        "doc_id",
        F.greatest(win_lo - F.col("__start"), F.lit(0).cast("long"))
        .cast("long")
        .alias("piece_start"),
        (
            F.least(F.col("__cum"), win_hi)
            - F.greatest(F.col("__start"), win_lo)
        )
        .cast("long")
        .alias("piece_len"),
    )


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-window fill accounting over a ``pack_sequences`` result:
    ``(shard, seq, n_pieces, fill, fill_ratio)``.  With concat-and-
    split packing every window except possibly the last one per shard
    has ``fill == budget`` — this aggregate is the assertion of that
    invariant (and the waste report for the shard tails)."""
    return (
        packed.groupBy("shard", "seq")
        .agg(
            F.count(F.lit(1)).alias("n_pieces"),
            F.sum("piece_len").alias("fill"),
        )
        .select(
            "shard",
            "seq",
            "n_pieces",
            "fill",
            F.round(F.col("fill") / F.lit(float(budget)), 6).alias("fill_ratio"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_text: bool = True,
) -> DataFrame:
    """Sliding-window chunking with overlap: each document yields
    windows of up to ``chunk`` whitespace tokens whose starts advance
    by ``stride`` (``stride <= chunk`` ⇒ ``chunk - stride`` tokens of
    overlap).  Output: ``(doc_id, chunk_idx, start, chunk_len[,
    chunk_text])``.

    A trailing window that would be fully contained in its predecessor
    (every token already covered) is suppressed, so each emitted chunk
    contributes at least one new token.  Zero-token documents yield no
    chunks.  Row-local: no shuffle, all-JVM ``sequence``/``slice``.
    """
    if chunk <= 0 or stride <= 0:
        raise ValueError("chunk and stride must be positive")
    t = F.trim(F.col(text_col))
    toks = F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )
    d = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("__toks")
    ).withColumn("__n", F.size("__toks").cast("long"))
    d = d.where(F.col("__n") > 0).select(
        "doc_id",
        "__toks",
        "__n",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"), F.col("__n") - 1, F.lit(stride).cast("long")
            )
        ).alias("start"),
    )
    # keep the window iff it starts at 0 or extends past the previous
    # window's end (start - stride + chunk): n - start + stride > chunk
    d = d.where(
        (F.col("start") == 0)
        | (F.col("__n") - F.col("start") + F.lit(stride) > F.lit(chunk))
    )
    clen = F.least(F.lit(chunk).cast("long"), F.col("__n") - F.col("start"))
    out = [
        "doc_id",
        (F.col("start") / F.lit(stride)).cast("long").alias("chunk_idx"),
        F.col("start").cast("long").alias("start"),
        clen.alias("chunk_len"),
    ]
    if with_text:
        out.append(
            F.array_join(
                F.slice(F.col("__toks"), (F.col("start") + 1).cast("int"), clen.cast("int")),
                " ",
            ).alias("chunk_text")
        )
    return d.select(*out)


def mixture_weights(
    docs: DataFrame,
    targets: dict[str, float],
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source mixing weights against a target token-share mix:
    ``(source, n_docs, n_tokens, token_share, target_share, weight)``
    where ``weight = target_share / token_share`` — the relative
    sampling rate that reshapes the corpus's natural token
    distribution into ``targets`` (>1 ⇒ upsample / repeat epochs,
    <1 ⇒ downsample).  Sources absent from ``targets`` get target 0.
    One small aggregate; the total-token scalar is attached with a
    broadcast cross join (no second shuffle)."""
    per = (
        docs.select(
            F.col(source_col).alias("source"),
            token_count(F.col(text_col)).alias("__n"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__n").alias("n_tokens"),
        )
    )
    total = per.agg(F.sum("n_tokens").alias("__total"))
    tgt = F.coalesce(
        *(
            [
                F.create_map(
                    *[F.lit(x) for kv in targets.items() for x in kv]
                )[F.col("source")]
            ]
            if targets
            else []
        ),
        F.lit(0.0),
    )
    share = F.col("n_tokens") / F.col("__total")
    return per.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("token_share"),
        F.round(tgt, 6).alias("target_share"),
        F.round(tgt / share, 6).alias("weight"),
    )


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    seed: int = 42,
    mod: int = 1_000_000,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Realize a mixing plan as a deterministic up/down-sample:
    ``(doc_id, source, epoch)`` with ``epoch ∈ 1..n_copies`` where
    ``n_copies = floor(w) + [hash_draw < frac(w)]`` for the doc's
    source weight ``w`` — e.g. ``w = 2.25`` keeps every doc twice and
    a deterministic quarter of docs a third time; ``w = 0.5`` keeps a
    deterministic half once.  Sources absent from ``weights`` are
    dropped (weight 0).

    The fractional part is quantized IN PYTHON to an integer threshold
    out of ``mod``, so the per-row decision is a long-vs-long compare
    on the portable md5 hash of ``doc_id|seed`` — bit-identical in any
    SQL replay, stable under partitioning and retries.  Zero shuffles:
    the whole plan is scan → project/filter → explode.
    """
    if mod <= 0:
        raise ValueError("mod must be positive")
    full: F.Column | None = None
    thresh: F.Column | None = None
    n_full_lit = F.lit(0).cast("long")
    thresh_lit = F.lit(0).cast("long")
    for src, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {src!r}")
        nf = int(math.floor(w))
        th = int(math.floor((w - nf) * mod))
        cond = F.col(source_col) == src
        full = F.when(cond, F.lit(nf)) if full is None else full.when(cond, F.lit(nf))
        thresh = (
            F.when(cond, F.lit(th)) if thresh is None else thresh.when(cond, F.lit(th))
        )
    if full is not None:
        n_full_lit = full.otherwise(F.lit(0)).cast("long")
        thresh_lit = thresh.otherwise(F.lit(0)).cast("long")
    draw = F.pmod(
        hash60_keyed(F.col(id_col).cast("string"), F.lit(str(seed))), F.lit(mod)
    )
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        (n_full_lit + F.when(draw < thresh_lit, F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("__copies"),
    ).where(F.col("__copies") > 0)
    return d.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(1).cast("long"), F.col("__copies"))).alias(
            "epoch"
        ),
    )
