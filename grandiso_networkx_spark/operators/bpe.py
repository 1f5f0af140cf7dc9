"""Byte-pair-encoding merge induction + encoding — the subword
tokenizer trainer of a training-data pipeline (SURVEY.md §2.7 class;
no reference analogue — the reference is a motif matcher.  Algorithm:
Sennrich et al. 2016, word-level BPE).

``bpe_merges`` learns the merge table: train on the corpus's word
frequency table (the vocabulary with counts — Heaps-law small, NOT
the token stream), words split to characters, then ``n_merges``
rounds of (count all adjacent symbol pairs weighted by word
frequency) → (pick the most frequent pair, ties by pair
lexicographic) → (merge its occurrences greedily left-to-right in
every word).  ``bpe_encode`` replays a learned merge table over the
corpus token stream and emits word pieces.

Determinism & oracles: every step is engine-portable — the argmax
tie-break is total, and the ONE sequential-looking step (greedy
left-to-right merging, where "aaa" under merge (a,a) yields
["aa","a"]) is expressed as windows: inside each maximal run of
consecutive matching positions, exactly the even-indexed ones merge
(run-parity = gaps-and-islands grouping + row_number %% 2), which is
precisely the greedy rule.  The whole trainer therefore unrolls to a
DuckDB CTE chain and is value-checked by the driver.

Scale shape (the 100 TB path):
- training operates on the WORD VOCAB (|V| ≪ corpus by Heaps' law):
  one tokenize pass + one word groupBy, then all per-round work is
  windows partitioned by word id (parallel, bounded by the longest
  word) + one map-side-combined pair groupBy.
- the chosen pair is ONE driver scalar per round, folded into the
  next round's plan as literals (the PageRank carried-literal
  pattern); no other driver round-trip exists in the loop.
- ``bpe_encode`` is the same window machinery over ``(doc_id, word
  slot)`` rows — per-document parallel, no global order anywhere —
  with the (tiny) merge table applied as a driver-side literal list
  in merge order, exactly how a tokenizer ships its merges file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """``(word, n)`` — lower-cased whitespace word frequencies."""
    t = F.trim(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    return (
        docs.select(F.explode(F.split(t, r"\s+")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _char_symbols(words: DataFrame, key_cols: list[str]) -> DataFrame:
    """Explode each word into ``(key..., pos, sym)`` character rows."""
    return words.select(
        *key_cols,
        F.posexplode(
            F.filter(F.split(F.col("word"), ""), lambda s: s != F.lit(""))
        ).alias("pos", "sym"),
    )


def _merge_round(sym: DataFrame, key: list[str], left: str, right: str) -> DataFrame:
    """One greedy merge pass of pair ``(left, right)`` over a symbol
    frame ``(key..., pos, sym)``; returns the re-indexed frame.

    Greedy left-to-right = run-parity selection: inside each maximal
    run of consecutive positions where ``(sym, next) == (left,
    right)``, the 1st, 3rd, ... matches merge (a match immediately
    after a consumed match cannot fire).  Windows are partitioned by
    the word key — parallel across words, never global.
    """
    w = Window.partitionBy(*key).orderBy("pos")
    s = sym.withColumn("__nxt", F.lead("sym").over(w)).withColumn(
        "__m",
        (F.col("sym") == F.lit(left)) & (F.col("__nxt") == F.lit(right)),
    )
    # gaps-and-islands: consecutive matched positions share one run id
    wm = Window.partitionBy(*key, "__m").orderBy("pos")
    s = s.withColumn(
        "__run", F.when(F.col("__m"), F.col("pos") - F.row_number().over(wm))
    )
    wr = Window.partitionBy(*key, "__run").orderBy("pos")
    s = s.withColumn(
        "__sel",
        F.col("__m") & (F.row_number().over(wr) % 2 == 1),
    )
    s = s.withColumn("__drop", F.coalesce(F.lag("__sel").over(w), F.lit(False)))
    out = (
        s.where(~F.col("__drop"))
        .select(
            *key,
            "pos",
            F.when(F.col("__sel"), F.concat("sym", "__nxt"))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
    )
    w2 = Window.partitionBy(*key).orderBy("pos")
    return out.select(
        *key, (F.row_number().over(w2) - 1).alias("pos"), "sym"
    )


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    min_frequency: int = 1,
) -> DataFrame:
    """Learn the BPE merge table: ``(merge_idx int, left, right,
    pair_count long)`` — merge_idx 0 is the first (most frequent)
    merge; ``pair_count`` is the frequency that won the round
    (weighted by word count).  Stops early (fewer rows) when no pair
    occurs anywhere, or — Sennrich's ``--min-frequency`` rule — when
    the best pair's count falls below ``min_frequency`` (merges below
    it would overfit singleton junk).

    Scale contract: this is the fully-distributed, SQL-replayable
    trainer — per round it runs one window + one map-side-combined
    pair groupBy over the (Heaps-small) vocab symbol frame, so the
    per-merge cost is O(vocab chars), NOT O(corpus).  That is fine
    for oracle-sized merge budgets but a production budget (30k-50k
    merges) would still mean 30k shuffled vocab passes; use
    :func:`bpe_merges_fast` for production training — it produces the
    IDENTICAL merge table (pinned by ``tests/test_bpe.py``) from ONE
    distributed corpus pass plus an incremental-delta driver loop
    over the collected word-frequency table."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if min_frequency < 1:
        raise ValueError("min_frequency must be >= 1")
    spark = docs.sparkSession
    words = _word_counts(docs, text_col).withColumn(
        "wid", F.monotonically_increasing_id()
    ).persist()
    sym = _char_symbols(
        words.select("wid", "word"), ["wid"]
    ).join(words.select("wid", "n"), "wid").localCheckpoint()
    words.unpersist()

    merges: list[tuple[int, str, str, int]] = []
    for i in range(n_merges):
        w = Window.partitionBy("wid").orderBy("pos")
        pairs = (
            sym.withColumn("__nxt", F.lead("sym").over(w))
            .where(F.col("__nxt").isNotNull())
            .groupBy("sym", "__nxt")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), F.asc("sym"), F.asc("__nxt"))
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["c"] < min_frequency:
            break
        left, right, cnt = pairs[0]["sym"], pairs[0]["__nxt"], pairs[0]["c"]
        merges.append((i, left, right, int(cnt)))
        sym = _merge_round(
            sym.select("wid", "n", "pos", "sym"), ["wid", "n"], left, right
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "merge_idx int, left string, right string, pair_count long"
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]] | DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge list to the corpus: ``(doc_id, widx,
    pos, piece)`` — word ``widx`` (0-based whitespace slot) of each
    document split into its BPE pieces in order.

    ``merges`` may be the :func:`bpe_merges` output frame (tiny —
    collected to an ordered literal list, exactly a tokenizer's
    merges file) or a pre-collected ``[(left, right), ...]``.
    """
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("merge_idx").collect()
        mlist = [(r["left"], r["right"]) for r in rows]
    else:
        mlist = list(merges)
    t = F.trim(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    words = (
        docs.select("doc_id", F.posexplode(F.split(t, r"\s+")).alias("widx", "word"))
        .where(F.length("word") > 0)
    )
    sym = _char_symbols(words, ["doc_id", "widx"])
    # All merge passes chain in ONE plan: every window is partitioned
    # by (doc_id, widx) or a superset of it, and a ClusteredDistribution
    # on a superset is satisfied by the existing hash partitioning on
    # the subset — so the whole chain runs with a SINGLE exchange plus
    # per-window local sorts (pinned by the plan gate).  No per-merge
    # checkpoint: unlike bpe_merges' training loop there is no driver
    # scalar between rounds, so nothing forces materialization.
    for left, right in mlist:
        sym = _merge_round(sym, ["doc_id", "widx"], left, right)
    return sym.select(
        "doc_id",
        F.col("widx").cast("int").alias("widx"),
        F.col("pos").cast("int").alias("pos"),
        F.col("sym").alias("piece"),
    )


def bpe_vocab(
    docs: DataFrame,
    merges: list[tuple[str, str]] | DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """The trained tokenizer's piece vocabulary over the corpus:
    ``(piece, n long)`` — every subword the merge list produces, with
    its corpus occurrence count (the vocab file next to the merges
    file).  One groupBy over :func:`bpe_encode`'s piece stream."""
    return (
        bpe_encode(docs, merges, text_col)
        .groupBy("piece")
        .agg(F.count(F.lit(1)).alias("n"))
    )
