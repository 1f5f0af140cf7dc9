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


def _greedy_merge_seq(seq: list[str], left: str, right: str) -> list[str]:
    """One greedy left-to-right merge pass over a symbol list — the
    driver-side mirror of :func:`_merge_round`'s run-parity rule."""
    out: list[str] = []
    i, n = 0, len(seq)
    while i < n:
        if i + 1 < n and seq[i] == left and seq[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def bpe_merges_fast(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    min_frequency: int = 1,
    min_word_count: int = 1,
    max_train_words: int = 10_000_000,
) -> DataFrame:
    """Production BPE trainer — the IDENTICAL merge table to
    :func:`bpe_merges` (pinned by ``tests/test_bpe.py``) from ONE
    distributed pass over the corpus.

    Scale shape (the 100 TB path): the only corpus-scale work is the
    tokenize + word groupBy (map-side combined).  Training then runs
    on the collected ``(word, n)`` vocabulary — Heaps-law small — with
    the classic incremental-delta algorithm: a pair→count table plus a
    pair→words index, and per merge only the words CONTAINING the
    winning pair are rewritten and re-counted.  Per-merge cost is
    O(affected words × word length), not O(vocab) and certainly not
    O(corpus) — a 50k-merge budget is seconds of driver time, vs 50k
    shuffled vocab passes for the unrolled trainer.

    Guard rails for genuinely huge vocabularies: ``min_word_count``
    drops words rarer than the threshold from TRAINING (Sennrich's
    standard vocab pruning — an explicit contract, counts for
    surviving words are unchanged), and ``max_train_words`` raises if
    the surviving vocab would not fit driver memory; pre-aggregate or
    sample (``curation.stratified_sample``) in that case.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if min_frequency < 1:
        raise ValueError("min_frequency must be >= 1")
    spark = docs.sparkSession
    wc = _word_counts(docs, text_col)
    if min_word_count > 1:
        wc = wc.where(F.col("n") >= min_word_count)
    rows = wc.collect()
    if len(rows) > max_train_words:
        raise ValueError(
            f"vocab {len(rows)} exceeds max_train_words={max_train_words}; "
            "raise min_word_count, sample the corpus, or raise the cap"
        )
    words: list[tuple[list[str], int]] = [(list(r["word"]), int(r["n"])) for r in rows]

    import heapq

    # pair -> weighted count; pair -> word ids that contain it; plus a
    # lazy-invalidation max-heap so the per-merge argmax is O(log P)
    # amortized instead of a linear scan of the whole pair table
    # (stale heap entries are skipped when their count disagrees).
    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for wid, (seq, n) in enumerate(words):
        for a, b in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + n
            where.setdefault((a, b), set()).add(wid)
    heap = [(-c, p) for p, c in counts.items()]
    heapq.heapify(heap)

    def bump(pair: tuple[str, str], newcount: int) -> None:
        counts[pair] = newcount
        heapq.heappush(heap, (-newcount, pair))

    merges: list[tuple[int, str, str, int]] = []
    for i in range(n_merges):
        # engine tie-break: count desc, then (left, right) lexicographic
        # asc — exactly the heap order of (-count, pair)
        while heap and counts.get(heap[0][1]) != -heap[0][0]:
            heapq.heappop(heap)
        if not heap:
            break
        cnt, (left, right) = -heap[0][0], heap[0][1]
        if cnt < min_frequency:
            break
        merges.append((i, left, right, cnt))
        for wid in sorted(where.get((left, right), ())):
            seq, n = words[wid]
            for a, b in zip(seq, seq[1:]):
                c = counts[(a, b)] - n
                if c > 0:
                    bump((a, b), c)
                else:
                    del counts[(a, b)]
                s = where.get((a, b))
                if s is not None:
                    s.discard(wid)
                    if not s:
                        del where[(a, b)]
            seq = _greedy_merge_seq(seq, left, right)
            words[wid] = (seq, n)
            for a, b in zip(seq, seq[1:]):
                bump((a, b), counts.get((a, b), 0) + n)
                where.setdefault((a, b), set()).add(wid)
    return spark.createDataFrame(
        merges, "merge_idx int, left string, right string, pair_count long"
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]] | DataFrame,
    text_col: str = "text",
    checkpoint_every: int | None = 16,
) -> DataFrame:
    """Apply a learned merge list to the corpus: ``(doc_id, widx,
    pos, piece)`` — word ``widx`` (0-based whitespace slot) of each
    document split into its BPE pieces in order.

    **Not fully lazy at default settings**: with more than
    ``checkpoint_every`` (default 16) merges, calling this builder
    launches eager Spark jobs at call time — each segment boundary is
    a ``localCheckpoint`` that materializes the intermediate state as
    executor-local blocks.  This is deliberate: an unsegmented chain
    is O(n_merges) plan depth (~6 window ops per merge) and
    Catalyst's recursive TreeNode analysis overflows the JVM thread
    stack at ~64 merges at default ``-Xss`` — a silent JVM crash,
    strictly worse than eager jobs.  Pass ``checkpoint_every=None``
    to get a fully lazy single plan (safe only for tiny merge lists:
    oracle replay, tests); production merge budgets (30k+) should use
    :func:`bpe_encode_fast`, which is lazy and constant plan size.

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
    # Merge passes chain into one plan per SEGMENT: every window is
    # partitioned by (doc_id, widx) or a superset of it, and a
    # ClusteredDistribution on a superset is satisfied by the existing
    # hash partitioning on the subset — so each segment runs with a
    # SINGLE exchange plus per-window local sorts (pinned by the plan
    # gates).  There is no driver scalar between rounds, so data-wise
    # nothing forces materialization — but plan DEPTH is O(n_merges)
    # (~6 window ops per merge) and Catalyst analysis/codegen on an
    # unbounded chain blows up long before data size does.  Every
    # ``checkpoint_every`` merges the segment is cut with an eager
    # ``localCheckpoint``; the checkpointed LogicalRDD preserves the
    # (doc_id, widx) outputPartitioning, so the NEXT segment starts
    # without a fresh shuffle (also plan-gated).  Production merge
    # budgets (30k+) should prefer :func:`bpe_encode_fast`.  The
    # default segment of 16 merges (~80 nested window ops) stays well
    # inside the JVM thread stack that Catalyst's recursive TreeNode
    # traversals need — 64-merge segments overflow it at default -Xss.
    for j, (left, right) in enumerate(mlist, 1):
        sym = _merge_round(sym, ["doc_id", "widx"], left, right)
        if checkpoint_every and j % checkpoint_every == 0 and j < len(mlist):
            sym = sym.localCheckpoint()
    return sym.select(
        "doc_id",
        F.col("widx").cast("int").alias("widx"),
        F.col("pos").cast("int").alias("pos"),
        F.col("sym").alias("piece"),
    )


def bpe_encode_fast(
    docs: DataFrame,
    merges: list[tuple[str, str]] | DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Vectorized twin of :func:`bpe_encode` for production merge
    budgets: same output frame ``(doc_id, widx, pos, piece)``,
    BIT-IDENTICAL semantics (each merge applied once, in merge-table
    order, greedy left-to-right — pinned against the SQL-replayable
    chain by ``tests/test_bpe.py``), but the merge passes run inside
    an Arrow-batched ``mapInPandas`` kernel instead of O(n_merges)
    window operators, so plan size is CONSTANT in the merge count.

    Kernel shape (the 100 TB path): per batch, unique words are
    memoized (Zipf: a few thousand distinct words cover a batch), and
    for each new word only the merges whose concatenation is a
    substring of the word are applied — found by probing the word's
    O(len²) substrings against a prebuilt concat→merge-indexes dict,
    so a 50k-entry merge table costs a ~10-char word ~55 dict probes,
    not 50k passes.  Python-side tokenization mirrors the JVM exactly
    for ASCII text (Java ``\\s``/``trim``/``lower``); the engine's
    corpus contract is lower-ASCII whitespace-delimited text.
    No shuffle at all: the kernel is map-only over the documents scan.
    """
    import re as _re

    if isinstance(merges, DataFrame):
        rows = merges.orderBy("merge_idx").collect()
        mlist = [(r["left"], r["right"]) for r in rows]
    else:
        mlist = list(merges)
    # concat string -> ordered merge indexes that produce it (distinct
    # merges can share a concat; all must be probed, in rank order)
    by_concat: dict[str, list[int]] = {}
    for idx, (lft, rgt) in enumerate(mlist):
        by_concat.setdefault(lft + rgt, []).append(idx)

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("doc_id", docs.schema["doc_id"].dataType),
            T.StructField("widx", T.IntegerType()),
            T.StructField("pos", T.IntegerType()),
            T.StructField("piece", T.StringType()),
        ]
    )
    # Java \s is ASCII-only; Spark trim() strips 0x20 only
    ws = _re.compile(r"[ \t\n\x0b\f\r]+")

    def _pieces(word: str) -> tuple[str, ...]:
        hits: set[int] = set()
        L = len(word)
        for a in range(L):
            for b in range(a + 2, L + 1):
                ids = by_concat.get(word[a:b])
                if ids:
                    hits.update(ids)
        seq = list(word)
        for mi in sorted(hits):
            if len(seq) < 2:
                break
            seq = _greedy_merge_seq(seq, *mlist[mi])
        return tuple(seq)

    def kernel(batches):
        import pandas as pd

        memo: dict[str, tuple[str, ...]] = {}
        for pdf in batches:
            doc_ids, widxs, poss, pieces = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                t = ("" if text is None else str(text)).lower().strip(" ")
                # widx = index in the split ARRAY (posexplode parity:
                # empty entries from non-space leading/trailing
                # whitespace are filtered but still occupy a slot)
                for widx, word in enumerate(ws.split(t)):
                    if not word:
                        continue
                    ps = memo.get(word)
                    if ps is None:
                        ps = memo[word] = _pieces(word)
                    for pos, piece in enumerate(ps):
                        doc_ids.append(doc_id)
                        widxs.append(widx)
                        poss.append(pos)
                        pieces.append(piece)
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "widx": pd.Series(widxs, dtype="int32"),
                    "pos": pd.Series(poss, dtype="int32"),
                    "piece": pieces,
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(kernel, out_schema)


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
