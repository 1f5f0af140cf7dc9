"""Deterministic synthetic transcript tables (FIXTURES.md §1).

Input shape per BASELINE.json ``input_hint``:

    (conv_id string, turn_idx int32, role string, text string,
     tool string nullable, ts timestamp)

Generation is **pure Spark** — ``spark.range`` → sequence/explode →
hash-derived pseudo-randomness via ``xxhash64`` — so the same recipe
that makes a 100-row unit fixture makes a 10^8-turn bench table without
ever touching the driver, and the result is bit-identical regardless of
partitioning (no RNG state, no wall clock: every field is a pure
function of ``(conv_id, turn_idx, seed)``).

The tool vocabulary is Zipf-skewed on purpose: hub tool-vertices are
what exercise the salting/skew handling the north rule mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TOOL_VOCAB = [
    "bash", "search", "read", "edit", "browser", "python", "sql",
    "calculator", "fetch", "plot", "translate", "email", "calendar",
    "compile", "deploy",
]

ROLES = ["user", "assistant"]
EXTRA_ROLES = ["system", "agent:planner", "agent:critic", "agent:researcher"]


def _u01(*cols) -> F.Column:
    """Deterministic uniform [0,1) from hashed columns."""
    h = F.xxhash64(*cols)
    return (F.pmod(h, F.lit(1_000_000_007)).cast("double")) / 1_000_000_007.0


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 100,
    seed: int = 42,
    max_turns: int = 64,
    zipf_s: float = 1.2,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic transcript table with ``n_convs`` conversations.

    Turns per conversation follow a bounded geometric-ish law in
    [2, max_turns]; roles alternate user/assistant with occasional
    ``agent:*`` / ``system`` rows; ~20% of assistant turns invoke a
    tool drawn from a Zipf distribution over :data:`TOOL_VOCAB`.
    """
    base = spark.range(n_convs)
    if partitions:
        base = base.repartition(partitions)
    conv = base.select(
        F.concat(F.lit("conv-"), F.col("id")).alias("conv_id"),
        F.col("id").alias("_cid"),
    )
    # Bounded-geometric turn count: 2 + floor(max * u^3) biases short.
    n_turns = (
        F.lit(2)
        + F.floor(
            F.pow(_u01(F.col("_cid"), F.lit(seed), F.lit("nturns")), 3.0)
            * (max_turns - 2)
        )
    ).cast("int")
    turns = conv.select(
        "conv_id",
        "_cid",
        F.explode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx"),
    ).withColumn("turn_idx", F.col("turn_idx").cast("int"))

    u_role = _u01("_cid", "turn_idx", F.lit(seed), F.lit("role"))
    role = (
        F.when(
            u_role < 0.08,
            F.element_at(
                F.array(*[F.lit(r) for r in EXTRA_ROLES]),
                (F.pmod(F.xxhash64("_cid", "turn_idx", F.lit(seed + 1)), F.lit(len(EXTRA_ROLES)))).cast("int") + 1,
            ),
        )
        .when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )

    # Zipf over the tool vocabulary via inverse-CDF on a literal array
    # of cumulative weights (tiny, computed driver-side, folded by
    # Catalyst into the plan — no join, no UDF).
    weights = [1.0 / (k + 1) ** zipf_s for k in range(len(TOOL_VOCAB))]
    total = sum(weights)
    cum, acc = [], 0.0
    for w in weights:
        acc += w
        cum.append(acc / total)
    u_tool = _u01("_cid", "turn_idx", F.lit(seed), F.lit("tool"))
    tool_idx = F.lit(len(TOOL_VOCAB) - 1)
    for k in range(len(TOOL_VOCAB) - 2, -1, -1):
        tool_idx = F.when(u_tool < cum[k], F.lit(k)).otherwise(tool_idx)
    tool_name = F.element_at(
        F.array(*[F.lit(t) for t in TOOL_VOCAB]), tool_idx.cast("int") + 1
    )
    u_invoke = _u01("_cid", "turn_idx", F.lit(seed), F.lit("invoke"))
    tool = F.when(
        (role == "assistant") & (u_invoke < 0.20), tool_name
    ).otherwise(F.lit(None).cast("string"))

    out = turns.select(
        "conv_id",
        "turn_idx",
        role.alias("role"),
        F.concat(
            F.lit("text of "), F.col("conv_id"), F.lit(" turn "), F.col("turn_idx")
        ).alias("text"),
        tool.alias("tool"),
        F.to_timestamp(
            F.lit("2026-01-01 00:00:00")
        ).cast("timestamp").alias("_t0"),
        (F.col("_cid") * 100000 + F.col("turn_idx") * 7).alias("_offset_s"),
    ).select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        (F.col("_t0") + F.make_interval(secs=F.col("_offset_s"))).alias("ts"),
    )
    return out
