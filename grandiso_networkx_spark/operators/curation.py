"""End-to-end corpus curation — the composed pretraining-data pass a
100 TB pipeline actually runs (task-mandated §2.7 class; composes the
engine's own text ops rather than inventing new semantics):

    language filter → quality gate → exact-dedup representative →
    deterministic hash sample

Scale shape: everything row-local (language ID, quality signals, the
filters) is a single projection over ONE scan of the documents table —
the predicates push into the Parquet/Iceberg source and stay inside
whole-stage codegen.  The only shuffle in the whole pass is the
exact-dedup window (hash-partition by ``md5(text)``), and it runs
AFTER the row-local filters have discarded rejects, so the exchange
carries only surviving rows.  The final sample is a hash predicate on
``doc_id`` — deterministic under any partitioning/retry, no RNG state,
no ``sample()`` nondeterminism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.hashing import hash60_keyed
from .textstats import language_guess_col, quality_columns


def curate_corpus(
    docs: DataFrame,
    lang: str = "en",
    min_tokens: int = 3,
    max_tokens: int = 1_000_000,
    max_punct_ratio: float = 0.5,
    max_digit_ratio: float = 0.5,
    sample_mod: int | None = None,
    sample_keep: int | None = None,
    seed: int = 42,
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, lang_guess, n_tokens, punct_ratio, digit_ratio)`` for
    every document that survives all four stages.

    - keeps documents whose ``language_guess`` equals ``lang``;
    - keeps ``min_tokens <= n_tokens <= max_tokens`` with punctuation
      and digit ratios at or under the caps (ratios are the 6-decimal
      rounded values of ``quality_features`` — SQL-parity exact);
    - among byte-identical texts, keeps the minimum ``doc_id``
      (computed AMONG survivors, so a rejected doc never shadows a
      kept one);
    - when ``sample_mod``/``sample_keep`` are set, keeps a
      deterministic ``sample_keep/sample_mod`` fraction by portable
      md5 hash of ``doc_id|seed``.
    """
    if (sample_mod is None) != (sample_keep is None):
        raise ValueError("sample_mod and sample_keep must be set together")
    t = F.col(text_col)
    q = quality_columns(t)
    filtered = docs.select(
        "doc_id",
        t.alias("__text"),
        language_guess_col(t).alias("lang_guess"),
        q["n_tokens"].alias("n_tokens"),
        q["punct_ratio"].alias("punct_ratio"),
        q["digit_ratio"].alias("digit_ratio"),
    ).where(
        (F.col("lang_guess") == lang)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("punct_ratio") <= max_punct_ratio)
        & (F.col("digit_ratio") <= max_digit_ratio)
    )
    kept = (
        filtered.withColumn(
            "__keep_id",
            F.min("doc_id").over(Window.partitionBy(F.md5("__text"))),
        )
        .where(F.col("doc_id") == F.col("__keep_id"))
        .drop("__text", "__keep_id")
    )
    if sample_mod is not None:
        draw = hash60_keyed(F.col("doc_id"), F.lit(seed))
        kept = kept.where(F.pmod(draw, F.lit(sample_mod)) < sample_keep)
    return kept


def dataset_split(
    df: DataFrame,
    weights: dict[str, int] | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Adds a ``split`` column assigning every row to exactly one named
    partition (default ``train``/``val``/``test`` at 8/1/1) — the
    deterministic train/eval carve-out a training pipeline runs before
    anything touches the eval set.

    The assignment is a pure function of ``(id, seed)`` — portable md5
    bucket ``hash(id|seed) % Σweights`` cut at the cumulative weight
    boundaries in ``weights`` insertion order — so it is identical
    under any partitioning, retry, cluster size, or engine (the SQL
    oracle reproduces it bit-for-bit), and a document can never
    migrate between train and test when the corpus around it changes.
    Pure column expression: no shuffle, no RNG state, survives
    predicate pushdown (filtering one split prunes at the scan).
    """
    if weights is None:
        weights = {"train": 8, "val": 1, "test": 1}
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive integers")
    mod = sum(weights.values())
    bucket = F.pmod(
        hash60_keyed(F.col(id_col), F.lit(seed)), F.lit(mod)
    )
    expr = None
    cum = 0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        expr = (
            F.when(bucket < cum, F.lit(name))
            if expr is None
            else expr.when(bucket < cum, F.lit(name))
        )
    label = (
        expr.otherwise(F.lit(names[-1])) if expr is not None
        else F.lit(names[-1])
    )
    return df.withColumn("split", label)


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-group sample: up to ``n_per_group`` rows per
    ``group_col`` value, chosen by portable md5 order of ``(id, seed)``
    with the id as tie-break — the balanced-sampling op a pipeline uses
    to cap over-represented languages/sources/domains.

    Unlike ``DataFrame.sample``/``sampleBy`` (partitioning- and
    retry-sensitive), the selection is a pure function of (ids, seed):
    any engine, partitioning, or re-run picks the identical rows, so
    the driver value-checks it (``stratified_sample``).  Scale shape:
    one window rank per group (single shuffle keyed by the group;
    skewed groups are bounded by the rank cutoff's early filter under
    WholeStageCodegen, and a two-phase top-n rewrite applies when a
    single group outgrows a partition).
    """
    if n_per_group < 1:
        raise ValueError("n_per_group must be >= 1")
    h = hash60_keyed(F.col(id_col), F.lit(seed))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )
