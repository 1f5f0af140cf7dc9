"""HyperBall-style neighborhood function via Flajolet–Martin bit
sketches (Boldi/Rosa/Vigna, "HyperANF: approximating the neighbourhood
function of very large graphs on a budget", WWW'11 — FM registers
instead of HyperLogLog so every operation is a portable 64-bit OR).

Not in the reference (grandiso has no vertex analytics); this is the
classic web-scale estimator for ball sizes / effective diameter —
exact per-vertex BFS is Θ(V·E), the sketch pass is O(rounds · E) with
O(V · R) state.

Semantics
---------
Register ``r`` of vertex ``v`` after ``t`` rounds is EXACTLY

    s_r(v, t) = OR_{u in Ball_out(v, t)}  lowbit(h(u, r))

where ``Ball_out(v, t)`` is the set of vertices reachable from ``v``
in ≤ t hops, ``h`` is the portable 60-bit md5 hash used across this
engine (``conv(substr(md5(id|r|seed),1,15),16,10)``) and ``lowbit(x)
= x & -x`` (the FM "rho" bit).  The sketches are therefore a pure
deterministic function of (edge set, seed) — value-checkable
bit-for-bit against an independent SQL replay — while the *estimates*
derived from them are approximate:

    est(v, t) = 2^(mean_r lowest_zero_bitpos(s_r)) / 0.77351

(Flajolet–Martin 1985 with the standard phi correction).  The
neighborhood function N(t) = Σ_v est(v, t) and the effective diameter
(smallest t with N(t) ≥ q·N(∞)) follow driver-side from per-round
aggregates.

Scale design
------------
- **State is R longs per vertex** (R·8 bytes — 64 B/vertex at R=8),
  vs the Θ(ball size) frontier sets an exact computation carries.
- **One shuffle per round**: state ⋈ edges (on ``dst`` — pulling
  successors' balls) then ``groupBy(src)`` with the built-in
  ``bit_or`` aggregate.  ``bit_or`` combines map-side, so a hub that
  reaches a million vertices still ships R longs per partition — the
  same property that makes HyperANF run on billion-edge graphs.
- **Monotone convergence**: registers only gain bits, so the loop
  stops when the global register sum (exact, DECIMAL) stops moving —
  one tiny aggregate per round, no change-join.
- **Flat lineage**: per-round ``localCheckpoint`` (iterative plans
  otherwise grow exponentially).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint

_PHI = 0.77351


def _h(col: F.Column, r: int, seed: int) -> F.Column:
    """Portable 60-bit md5 hash, identical in DuckDB as
    CAST('0x' || substring(md5(id || '|r|seed'), 1, 15) AS BIGINT)."""
    from ..functions.hashing import hash60_keyed

    return hash60_keyed(col.cast("string"), F.lit(r), F.lit(seed))


def _lowbit(h: F.Column) -> F.Column:
    return F.when(h == 0, F.lit(1)).otherwise(h.bitwiseAND(-h))


def _est_col(regs: list[str]) -> F.Column:
    """FM estimate from the registers: lowest-zero-bit position via
    ~s & (s+1) (a power of two, exact in double), averaged, 2^mean/phi.

    The phi correction is asymptotic: tiny sets are overestimated
    (a singleton reads ~1.8, the classic PCSA small-range bias that
    decays as true cardinality grows past ~10·R... callers comparing
    small balls should compare sketches, not estimates)."""
    bitpos = [
        F.log2(
            (F.bitwise_not(F.col(c)).bitwiseAND(F.col(c) + 1)).cast("double")
        )
        for c in regs
    ]
    mean_b = sum(bitpos) / len(regs)
    return F.round(F.pow(F.lit(2.0), mean_b) / F.lit(_PHI), 6)


def hyperball(
    edges: DataFrame,
    rounds: int | None = None,
    num_registers: int = 8,
    seed: int = 42,
    max_rounds: int = 64,
    with_estimate: bool = True,
) -> DataFrame:
    """Per-vertex out-ball FM sketches over ``edges (src, dst)``.

    With ``rounds`` fixed, runs exactly that many OR-propagation
    rounds (deterministic, SQL-replayable); with ``rounds=None``
    iterates to the fixed point (sketches of the full reachable set —
    register sums are monotone, stop when unchanged).  Returns
    ``(id, s0..s{R-1} [, est_reach])``; ``est_reach`` estimates
    ``|Ball_out(id, rounds)|`` including ``id`` itself.
    """
    regs = [f"s{r}" for r in range(num_registers)]
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    verts = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    state = verts.select(
        "id",
        *[
            _lowbit(_h(F.col("id"), r, seed)).alias(c)
            for r, c in enumerate(regs)
        ],
    ).localCheckpoint()

    n_rounds = rounds if rounds is not None else max_rounds
    prev_sum = None
    converged = rounds is not None
    for _ in range(n_rounds):
        gathered = (
            e.join(state.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(*[F.bit_or(c).alias(c) for c in regs])
        )
        state = (
            state.unionByName(gathered)
            .groupBy("id")
            .agg(*[F.bit_or(c).alias(c) for c in regs])
            .transform(flat_checkpoint)
        )
        if rounds is None:
            cur = state.agg(
                sum(
                    F.sum(F.col(c).cast("decimal(38,0)")) for c in regs
                ).alias("s")
            ).collect()[0][0]
            if cur == prev_sum:
                converged = True
                break
            prev_sum = cur
    if not converged:
        # Same contract as temporal.earliest_arrival: a fixed-point
        # promise that cannot be kept must be loud, not silently
        # truncated (sketches would understate the reachable set on
        # graphs with directed diameter > max_rounds).
        raise RuntimeError(
            f"hyperball(rounds=None) did not reach the register fixed "
            f"point within max_rounds={max_rounds}; raise max_rounds "
            f"or pass an explicit rounds= for a bounded-radius ball."
        )

    if with_estimate:
        return state.select("id", *regs, _est_col(regs).alias("est_reach"))
    return state.select("id", *regs)


def neighborhood_function(
    edges: DataFrame,
    max_rounds: int = 32,
    num_registers: int = 16,
    seed: int = 42,
) -> list[tuple[int, float]]:
    """``[(t, N(t))]`` — estimated number of reachable pairs within
    ≤ t hops (including the 0-hop self pairs), one entry per round up
    to the fixed point or ``max_rounds``.  Driver-side list: each
    round contributes ONE scalar aggregate over the sketch frame."""
    regs = [f"s{r}" for r in range(num_registers)]
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    verts = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    state = verts.select(
        "id",
        *[
            _lowbit(_h(F.col("id"), r, seed)).alias(c)
            for r, c in enumerate(regs)
        ],
    ).localCheckpoint()
    est = F.sum(_est_col(regs)).alias("n")

    out: list[tuple[int, float]] = []
    out.append((0, float(state.agg(est).collect()[0][0])))
    prev_sum = None
    for t in range(1, max_rounds + 1):
        gathered = (
            e.join(state.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(*[F.bit_or(c).alias(c) for c in regs])
        )
        state = (
            state.unionByName(gathered)
            .groupBy("id")
            .agg(*[F.bit_or(c).alias(c) for c in regs])
            .transform(flat_checkpoint)
        )
        row = state.agg(
            est,
            sum(F.sum(F.col(c).cast("decimal(38,0)")) for c in regs).alias(
                "sm"
            ),
        ).collect()[0]
        out.append((t, float(row[0])))
        if row[1] == prev_sum:
            out.pop()  # unchanged round adds no information
            break
        prev_sum = row[1]
    return out


def effective_diameter(
    edges: DataFrame,
    q: float = 0.9,
    max_rounds: int = 32,
    num_registers: int = 16,
    seed: int = 42,
) -> tuple[float, list[tuple[int, float]]]:
    """Effective diameter at quantile ``q``: the (interpolated)
    smallest t with N(t) ≥ q · N(final), plus the neighborhood
    function it was read from (Boldi et al.'s standard definition).

    Truncation caveat: :func:`neighborhood_function` stops at
    ``max_rounds`` even if the register sums are still growing, so on
    a graph whose directed diameter exceeds ``max_rounds`` the
    returned value is a LOWER BOUND read off a truncated curve —
    raise ``max_rounds`` until the final entries plateau (the sibling
    :func:`hyperball` with ``rounds=None`` raises in the analogous
    case because its contract is the exact fixed point; here the
    curve itself is the deliverable, so truncation is documented
    rather than fatal)."""
    nf = neighborhood_function(edges, max_rounds, num_registers, seed)
    target = q * nf[-1][1]
    if nf[0][1] >= target:
        return 0.0, nf
    for (t0, n0), (t1, n1) in zip(nf, nf[1:]):
        if n1 >= target:
            if n1 == n0:
                return float(t1), nf
            return t0 + (target - n0) / (n1 - n0), nf
    return float(nf[-1][0]), nf


def _portable_est(kcol: F.Column, num_registers: int) -> F.Column:
    """FM estimate as a BIT-PORTABLE function of the integer register
    bit-position sum ``K = Σ_r trailing_ones(s_r)``:

        est = C[K mod R] * 2^(K div R),   C[j] = 2^(j/R) / φ

    ``2^(K div R)`` is computed as ``CAST(1::BIGINT << (K div R) AS
    DOUBLE)`` — an exact integer shift then an exact power-of-two
    conversion — and the R constants ``C[j]`` are Python doubles
    embedded as literals, so the estimate is the SAME double in any
    IEEE engine (Spark and DuckDB produce bit-identical values; no
    pow/log2 libm calls whose last ulp could differ).  Equals
    ``2^(K/R)/φ`` exactly in value."""
    consts = [2.0 ** (j / num_registers) / _PHI for j in range(num_registers)]
    c = F.lit(consts[0])
    for j in range(1, num_registers):
        c = F.when(kcol % num_registers == j, F.lit(consts[j])).otherwise(c)
    # F.shiftleft's python wrapper only takes a literal int shift —
    # call the SQL function directly for a column-valued shift.
    return c * F.call_function(
        "shiftleft", F.lit(1).cast("long"), (kcol / num_registers).cast("int")
    ).cast("double")


def _trailing_ones_sum(regs: list[str]) -> F.Column:
    """Σ_r trailing-ones(s_r) — ``bit_count(((~s) & (s+1)) - 1)``:
    ``(~s)&(s+1)`` is ``2^k`` for ``k`` trailing ones, so subtracting
    one yields a ``k``-bit mask.  Pure 64-bit integer ops, identical
    in DuckDB."""
    return sum(
        F.bit_count(
            (F.bitwise_not(F.col(c)).bitwiseAND(F.col(c) + 1)) - 1
        )
        for c in regs
    ).cast("int")


def hyperball_centralities(
    edges: DataFrame,
    rounds: int | None = None,
    num_registers: int = 8,
    seed: int = 42,
    max_rounds: int = 64,
    incoming: bool = True,
    wf_improved: bool = True,
) -> DataFrame:
    """Geometric centralities from one HyperBall pass (Boldi & Vigna,
    "In-core computation of geometric centralities with HyperBall",
    2013 — the classic application of the ball sketches): per vertex

        reach_est     ≈ |Ball(v, T)|                (self included)
        sum_dist_est  ≈ Σ_u d(u→v)   = Σ_t t·(est_t − est_{t−1})
        harmonic_est  ≈ Σ_u 1/d(u→v) = Σ_t (est_t − est_{t−1})/t
        closeness_est = (r−1)/sum_dist · (r−1)/(n−1)   [wf_improved]

    accumulated DURING the OR-propagation — total cost O(rounds·E)
    with O(V·(R+3)) state, vs the Θ(V·E) all-source BFS of the exact
    :func:`..closeness.closeness_centrality` /
    :func:`..closeness.harmonic_centrality`.  This is the 100-TB scale
    path; the exact operators are the small-graph baseline (same
    relationship as minhash_lsh_pairs ↔ ngram_jaccard_pairs).

    ``incoming=True`` (default) runs the propagation over REVERSED
    edges so the ball of ``v`` is the set of vertices that REACH
    ``v`` — matching the networkx convention the exact closeness /
    harmonic operators use on digraphs.  The estimates inherit FM
    error (σ ≈ 0.78/√R relative, plus the small-range bias documented
    on :func:`_est_col`), but the OUTPUT is a pure deterministic
    function of (edge set, seed): every arithmetic step is either
    64-bit integer or an exact IEEE double op (see
    :func:`_portable_est`), so results are value-checkable bit-for-bit
    against a DuckDB replay of the unrolled rounds.

    With ``rounds=None`` iterates to the register fixed point and
    raises like :func:`hyperball` if ``max_rounds`` is hit."""
    regs = [f"s{r}" for r in range(num_registers)]
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    if incoming:
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    verts = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    n = verts.count()
    state = verts.select(
        "id",
        *[
            _lowbit(_h(F.col("id"), r, seed)).alias(c)
            for r, c in enumerate(regs)
        ],
    )
    state = state.select(
        "id",
        *regs,
        _portable_est(_trailing_ones_sum(regs), num_registers).alias(
            "__est"
        ),
        F.lit(0.0).alias("__sumdist"),
        F.lit(0.0).alias("__harm"),
    ).localCheckpoint()

    n_rounds = rounds if rounds is not None else max_rounds
    prev_sum = None
    converged = rounds is not None
    nulld = F.lit(None).cast("double")
    for t in range(1, n_rounds + 1):
        # ONE groupBy shuffle per round: raw neighbor contributions
        # (null accumulators) union the carried state row (exactly one
        # per id, so max() recovers the accumulators); bit_or combines
        # map-side, so hubs still ship R longs per partition.
        contrib = e.join(
            state.select(F.col("id").alias("dst"), *regs), "dst"
        ).select(
            F.col("src").alias("id"),
            *regs,
            nulld.alias("__est"),
            nulld.alias("__sumdist"),
            nulld.alias("__harm"),
        )
        agged = (
            state.unionByName(contrib)
            .groupBy("id")
            .agg(
                *[F.bit_or(c).alias(c) for c in regs],
                F.max("__est").alias("__est"),
                F.max("__sumdist").alias("__sumdist"),
                F.max("__harm").alias("__harm"),
            )
        )
        # registers only gain bits → __new_est ≥ __est (monotone);
        # delta accumulation order (prev + t·delta) is mirrored
        # EXACTLY by the unrolled SQL oracle's left-assoc sum.
        state = (
            agged.select(
                "id",
                *regs,
                "__est",
                "__sumdist",
                "__harm",
                _portable_est(
                    _trailing_ones_sum(regs), num_registers
                ).alias("__new_est"),
            )
            .select(
                "id",
                *regs,
                F.col("__new_est").alias("__est"),
                (
                    F.col("__sumdist")
                    + F.lit(float(t)) * (F.col("__new_est") - F.col("__est"))
                ).alias("__sumdist"),
                (
                    F.col("__harm")
                    + (F.col("__new_est") - F.col("__est")) / F.lit(float(t))
                ).alias("__harm"),
            )
            .transform(flat_checkpoint)
        )
        if rounds is None:
            cur = state.agg(
                sum(
                    F.sum(F.col(c).cast("decimal(38,0)")) for c in regs
                ).alias("s")
            ).collect()[0][0]
            if cur == prev_sum:
                converged = True
                break
            prev_sum = cur
    if not converged:
        raise RuntimeError(
            f"hyperball_centralities(rounds=None) did not reach the "
            f"register fixed point within max_rounds={max_rounds}; "
            f"raise max_rounds or pass an explicit rounds=."
        )

    close = (F.col("__est") - 1.0) / F.col("__sumdist")
    if wf_improved and n > 1:
        close = close * ((F.col("__est") - 1.0) / F.lit(float(n - 1)))
    return state.select(
        "id",
        F.col("__est").alias("reach_est"),
        F.col("__sumdist").alias("sum_dist_est"),
        F.col("__harm").alias("harmonic_est"),
        F.when(F.col("__sumdist") > 0.0, close)
        .otherwise(F.lit(0.0))
        .alias("closeness_est"),
    )


def two_hop_counts(edges: DataFrame, max_degree: int | None = None) -> DataFrame:
    """EXACT ≤2-hop out-reach counts ``(id, n_reach)`` (self excluded)
    — the exact small-radius companion to the FM sketches above: use
    this when k is small and degrees are bounded, the sketches when
    either explodes.

    One edges⋈edges wedge join + union + distinct per vertex — work is
    Σ deg² (the quantity :func:`hyperball` exists to avoid), so
    ``max_degree`` optionally drops mid-vertices above the cap before
    the wedge join (the usual hub guard; counts then lower-bound the
    truth on guarded graphs)."""
    e = edges.select("src", "dst").where(
        F.col("src") != F.col("dst")
    ).distinct()
    mid = e
    if max_degree is not None:
        keep = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") <= max_degree)
            .select("src")
        )
        mid = e.join(keep, "src", "left_semi")
    two = (
        e.select(F.col("src").alias("a"), F.col("dst").alias("m"))
        .join(
            mid.select(F.col("src").alias("m"), F.col("dst").alias("b")),
            "m",
        )
        .select("a", "b")
    )
    reach = (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionAll(two)
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    return reach.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).alias("n_reach")
    )
