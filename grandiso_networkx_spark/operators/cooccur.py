"""Skip-gram co-occurrence counts and PMI term association — the pair
table a word2vec/GloVe-style embedding trainer consumes, and the
classic collocation detector for corpus analysis.

Definitions (pinned, mirrored by the python test oracle and the DuckDB
driver oracle ``pmi_pairs``):

- tokens: whitespace split of trimmed text, position 1-based;
- pair ``(left_tok, right_tok)``: positions ``(i, j)`` in the same
  document with ``1 <= j - i <= window`` (ordered by position, NOT
  canonicalized — directional counts matter to embedding trainers);
- ``pmi(a,b) = ln( (c(a,b)/N) / ((c(a)/T) · (c(b)/T)) )`` with
  ``N`` = total pairs, ``c(t)``/``T`` = corpus token counts.

Scale shape: pair generation is **explode-shift-join**, never a per-doc
self-join — each token row emits ``window`` (doc_id, pos+k) probes that
equi-join back to the position table, so work is exactly ``T·window``
rows regardless of document length (a 10⁹-token shard costs
``w·10⁹`` join rows, not Σ len² ). Counts reduce by ``groupBy`` with
map-side combine; PMI attaches two broadcast-size marginal frames when
the vocabulary is small and falls back to shuffled equi joins when not
(left to the planner/AQE — both sides are keyed aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# single tokenizer definition point — the SQL oracles mirror THIS
from .textstats import _word_positions as _positions


def skipgram_pairs(
    docs: DataFrame, window: int = 2, text_col: str = "text"
) -> DataFrame:
    """``(left_tok, right_tok, n_pairs)`` — position-ordered
    within-``window`` co-occurrence counts over the corpus."""
    pos = _positions(docs, text_col)
    probes = pos.select(
        "doc_id",
        F.col("tok").alias("left_tok"),
        F.explode(
            F.sequence(F.col("p") + 1, F.col("p") + window)
        ).alias("p"),
    )
    return (
        probes.join(pos, ["doc_id", "p"])
        .groupBy("left_tok", F.col("tok").alias("right_tok"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def pmi_pairs(
    docs: DataFrame,
    window: int = 2,
    min_pair_count: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """``(left_tok, right_tok, n_pairs, pmi)`` — skip-gram pairs with
    pointwise mutual information, filtered to
    ``n_pairs >= min_pair_count`` (rare-pair PMI is noise)."""
    pos = _positions(docs, text_col)
    tok_counts = pos.groupBy(F.col("tok")).agg(
        F.count(F.lit(1)).alias("c_tok")
    )
    # T from the (vocabulary-sized) count frame, not another corpus scan
    totals = tok_counts.agg(F.sum("c_tok").alias("t_tokens"))
    # N counts ALL pairs — the min_pair_count filter trims output rows,
    # not the probability denominator.  Closed form per doc (never
    # re-running the heavy pair-generation subtree just to count it):
    # total pairs = Σ_i min(w, nw-i) = m·nw − m(m+1)/2, m = min(w, nw−1)
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    nw = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")
    m = F.least(F.lit(window), nw - 1)
    per_doc = F.when(nw >= 2, m * nw - (m * (m + 1) / 2).cast("long")).otherwise(0)
    n_total = docs.select(per_doc.alias("__p")).agg(
        F.sum("__p").alias("n_all")
    )
    pairs = skipgram_pairs(docs, window, text_col).where(
        F.col("n_pairs") >= min_pair_count
    )
    return (
        pairs.join(
            tok_counts.select(
                F.col("tok").alias("left_tok"), F.col("c_tok").alias("c_l")
            ),
            "left_tok",
        )
        .join(
            tok_counts.select(
                F.col("tok").alias("right_tok"), F.col("c_tok").alias("c_r")
            ),
            "right_tok",
        )
        .crossJoin(F.broadcast(n_total))
        .crossJoin(F.broadcast(totals))
        .select(
            "left_tok",
            "right_tok",
            "n_pairs",
            F.log(
                (F.col("n_pairs").cast("double") / F.col("n_all"))
                / (
                    (F.col("c_l").cast("double") / F.col("t_tokens"))
                    * (F.col("c_r").cast("double") / F.col("t_tokens"))
                )
            ).alias("pmi"),
        )
    )
