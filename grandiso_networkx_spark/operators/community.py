"""Partition quality metrics: modularity and per-community
conductance/volume/cut — the evaluation half of community detection
(the reference has no analytics at all; these score the output of
label_propagation / connected_components, matching
``networkx.algorithms.community.modularity`` semantics).

Input: ``edges (src, dst[, weight])`` where each row is ONE undirected
edge (stored orientation irrelevant); self-loops are dropped;
``labels (id, label)`` assigns every endpoint a community.

Scale shape: two equi joins attach the endpoint labels (shuffle keyed
by vertex id — labels is |V|-sized, never broadcast), then everything
reduces to ``groupBy(label)`` sums with map-side combine plus one
1-row global frame.  No UDFs, no collect beyond the optional scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import flat_checkpoint

_AQE_KEY = "spark.sql.adaptive.enabled"


def _labeled_edges(
    edges: DataFrame, labels: DataFrame, weight_col: str | None
) -> DataFrame:
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    e = edges.where(F.col("src") != F.col("dst")).select(
        "src", "dst", w.alias("w")
    )
    la = labels.select(
        F.col("id").alias("src"), F.col("label").alias("l_src")
    )
    lb = labels.select(
        F.col("id").alias("dst"), F.col("label").alias("l_dst")
    )
    return e.join(la, "src").join(lb, "dst")


def partition_quality(
    edges: DataFrame,
    labels: DataFrame,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-community ``(label, n_vertices, internal_w, cut_w, volume,
    conductance)`` over the undirected graph.

    - ``internal_w``: total weight of edges with both endpoints in the
      community;
    - ``cut_w``: total weight of edges with exactly one endpoint in it;
    - ``volume``: Σ weighted degree of members (= 2·internal + cut);
    - ``conductance``: ``cut / min(volume, total_volume - volume)``,
      null for the degenerate cases (empty or whole-graph community)
      where the denominator is 0.
    """
    le = _labeled_edges(edges, labels, weight_col)
    internal = (
        le.where(F.col("l_src") == F.col("l_dst"))
        .groupBy(F.col("l_src").alias("label"))
        .agg(F.sum("w").alias("internal_w"))
    )
    # each cut edge contributes to BOTH sides' cut
    cut = (
        le.where(F.col("l_src") != F.col("l_dst"))
        .select(F.col("l_src").alias("label"), "w")
        .unionAll(
            le.where(F.col("l_src") != F.col("l_dst")).select(
                F.col("l_dst").alias("label"), "w"
            )
        )
        .groupBy("label")
        .agg(F.sum("w").alias("cut_w"))
    )
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vertices")
    )
    per = (
        sizes.join(internal, "label", "left")
        .join(cut, "label", "left")
        .select(
            "label",
            "n_vertices",
            F.coalesce("internal_w", F.lit(0.0)).alias("internal_w"),
            F.coalesce("cut_w", F.lit(0.0)).alias("cut_w"),
        )
        .withColumn(
            "volume", 2 * F.col("internal_w") + F.col("cut_w")
        )
    )
    total = per.agg(F.sum("volume").alias("tv"))
    denom = F.least(F.col("volume"), F.col("tv") - F.col("volume"))
    return per.crossJoin(F.broadcast(total)).select(
        "label",
        "n_vertices",
        F.round("internal_w", 6).alias("internal_w"),
        F.round("cut_w", 6).alias("cut_w"),
        F.round("volume", 6).alias("volume"),
        F.round(
            F.when(denom > 0, F.col("cut_w") / denom), 6
        ).alias("conductance"),
    )


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    weight_col: str | None = None,
    resolution: float = 1.0,
) -> DataFrame:
    """Newman modularity of the partition as a 1-row DataFrame
    ``(modularity double)`` — exactly
    ``nx.algorithms.community.modularity``:

        Q = Σ_c [ internal_c / m  −  γ · (volume_c / 2m)² ]

    with ``m`` the total undirected edge weight.  Unrounded
    aggregates end-to-end (unlike :func:`partition_quality`'s
    display-rounded frame); one final round(6)."""
    le = _labeled_edges(edges, labels, weight_col)
    m = le.agg(F.sum("w")).collect()[0][0] or 0.0
    if m == 0:
        raise ValueError("modularity undefined for an empty edge set")
    internal = (
        le.where(F.col("l_src") == F.col("l_dst"))
        .groupBy(F.col("l_src").alias("label"))
        .agg(F.sum("w").alias("iw"))
    )
    volume = (
        le.select(F.col("l_src").alias("label"), "w")
        .unionAll(le.select(F.col("l_dst").alias("label"), "w"))
        .groupBy("label")
        .agg(F.sum("w").alias("vol"))
    )
    return (
        volume.join(internal, "label", "left")
        .select(
            (
                F.coalesce("iw", F.lit(0.0)) / F.lit(m)
                - F.lit(resolution)
                * F.pow(F.col("vol") / F.lit(2 * m), 2)
            ).alias("q")
        )
        .agg(F.round(F.sum("q"), 6).alias("modularity"))
    )


# -- Louvain (deterministic synchronous multilevel) ---------------------------
#
# Classic Louvain (Blondel et al. 2008) is sequential: vertices move one
# at a time in a scan order, which has no faithful distributed analogue.
# Distributed implementations (Grappolo / Vite, Halappanavar et al.) run
# SYNCHRONOUS local-move rounds instead: every vertex evaluates its best
# community against the PREVIOUS round's assignment and all moves apply
# at once.  "Exact at convergence" is only well-defined under a pinned
# rule, so — like this engine's LPA — the rule is fixed:
#
# - gain of moving i from community a to neighbor community b, against
#   the previous round's state:
#       ΔQ = (k_in(b) − k_in(a)) / m
#            − γ·k_i·(Σtot(b) − (Σtot(a) − k_i)) / (2m²)
#   where k_in(c) sums i's edge weights into c (self-loops excluded —
#   they move with i and cancel), Σtot(c) sums member degrees (degrees
#   include 2× self-loop weight), m is total undirected weight;
# - i moves to the best strictly-positive-gain community, ties broken
#   by the smallest community label;
# - the symmetric-swap degeneracy of synchronous moves (a→b and b→a in
#   the same round, oscillating forever) is broken with the standard
#   distributed-Louvain guard: when moves exist in BOTH directions
#   between a community pair in the same round, only the moves into the
#   smaller label execute;
# - a level's move phase stops when a round moves nothing (or at
#   max_rounds); the graph then contracts (coarsen_graph, self-loops
#   kept) and the next level runs on the quotient graph; the algorithm
#   stops when a level's move phase makes no move at all.
#
# The single-node oracle `louvain_oracle` replicates this rule exactly
# (same IEEE arithmetic — exact for integer weights), so the pytest
# differential is bit-for-bit; `louvain_move_rounds`' fixed-round level-1
# phase additionally replays in pure SQL for the driver value check.


def _louvain_graph(
    edges: DataFrame, weight_col: str | None
) -> tuple[DataFrame, DataFrame, float]:
    """``(sym, deg, m)``: both-orientation weighted adjacency (parallel
    edges aggregated; self-loops one row each), per-vertex weighted
    degree (2× self-loops), and the total undirected weight."""
    w = (
        F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    ).alias("w")
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"), w)
    offd = e.where(F.col("u") != F.col("v"))
    sym = (
        offd.unionAll(
            offd.select(
                F.col("v").alias("u"), F.col("u").alias("v"), F.col("w")
            )
        )
        .unionAll(e.where(F.col("u") == F.col("v")))
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
        .persist()
    )
    deg = (
        sym.groupBy(F.col("u").alias("id"))
        .agg(
            F.sum(
                F.when(F.col("u") == F.col("v"), 2 * F.col("w")).otherwise(
                    F.col("w")
                )
            ).alias("k")
        )
        .persist()
    )
    row = sym.agg(
        F.sum(F.when(F.col("u") != F.col("v"), F.col("w")).otherwise(0.0)),
        F.sum(F.when(F.col("u") == F.col("v"), F.col("w")).otherwise(0.0)),
    ).collect()[0]
    m = (row[0] or 0.0) / 2.0 + (row[1] or 0.0)
    return sym, deg, m


def _louvain_round(
    sym: DataFrame,
    deg: DataFrame,
    m: float,
    labels: DataFrame,
    resolution: float,
    tol: float,
    hint_small: bool = False,
    flag: str = "__changed",
) -> DataFrame:
    """One synchronous move round: ``(id, label, <carried...>, flag)``.

    Extra columns on ``labels`` (e.g. a previous chained round's change
    flag) pass through untouched, and the round's own boolean change
    flag is emitted under ``flag`` — so two rounds can chain lazily in
    ONE plan with both flags observable at the single materialization
    barrier (see the callers' rounds-per-barrier loops).

    ``hint_small`` broadcast-hints every |V|-bounded frame (labels,
    deg, Σtot, the move set) at its join site — the callers set it
    from the already-known symmetrized edge count, so small and
    quotient graphs run broadcast joins with no runtime size probing,
    while huge graphs keep the shuffle plan.  Values are identical
    either way (join strategy only)."""
    from pyspark.sql import Window

    B = F.broadcast if hint_small else (lambda df: df)

    # Both endpoint labels ride the adjacency into ONE aggregate —
    # (id, la, lv, kin) with la = own label (functionally dependent on
    # id, so the extra group key changes nothing) — and the own-
    # community weight kin_a falls out of a window over the SAME
    # id-clustering instead of the former labels re-join + left-join
    # subtree.  Values are identical (same addend multisets; the
    # engine's exactness contract is integer-valued weights, where sum
    # order is immaterial); the round plan drops from ~8 shuffles to 4
    # (kin groupBy, Σtot groupBy, the id window, the swap-guard
    # distinct).
    lab_u = labels.select(F.col("id").alias("u"), F.col("label").alias("la"))
    lab_v = labels.select(F.col("id").alias("v"), F.col("label").alias("lv"))
    kin = (
        sym.where(F.col("u") != F.col("v"))
        .join(B(lab_u), "u")
        .join(B(lab_v), "v")
        .groupBy(F.col("u").alias("id"), "la", "lv")
        .agg(F.sum("w").alias("kin"))
    )
    stot = (
        labels.join(B(deg), "id")
        .groupBy("label")
        .agg(F.sum("k").alias("stot"))
    )
    w_id = Window.partitionBy("id")
    gain = (F.col("kin") - F.col("kin_a")) / F.lit(m) - F.lit(
        resolution
    ) * F.col("k") * (
        F.col("stot_b") - (F.col("stot_a") - F.col("k"))
    ) / F.lit(2.0 * m * m)
    cand = (
        kin.withColumn(
            "kin_a",
            F.coalesce(
                F.max(
                    F.when(F.col("lv") == F.col("la"), F.col("kin"))
                ).over(w_id),
                F.lit(0.0),
            ),
        )
        .where(F.col("lv") != F.col("la"))
        .join(B(deg), "id")
        .join(
            B(stot.select(
                F.col("label").alias("la"), F.col("stot").alias("stot_a")
            )),
            "la",
        )
        .join(
            B(stot.select(
                F.col("label").alias("lv"), F.col("stot").alias("stot_b")
            )),
            "lv",
        )
        .select("id", "la", F.col("lv").alias("lb"), gain.alias("gain"))
    )
    w_pick = Window.partitionBy("id").orderBy(F.desc("gain"), F.asc("lb"))
    mv0 = (
        cand.withColumn("__rn", F.row_number().over(w_pick))
        .where((F.col("__rn") == 1) & (F.col("gain") > tol))
        .select("id", "la", "lb")
    )
    pairs = mv0.select("la", "lb").distinct()
    bad = (
        pairs.join(
            pairs.select(
                F.col("lb").alias("la"), F.col("la").alias("lb")
            ),
            ["la", "lb"],
        )
        .where(F.col("lb") > F.col("la"))
    )
    moves = mv0.join(B(bad), ["la", "lb"], "left_anti").select(
        "id", F.col("lb").alias("__nl")
    )
    carried = [c for c in labels.columns if c not in ("id", "label")]
    return labels.join(B(moves), "id", "left").select(
        "id",
        F.coalesce("__nl", "label").alias("label"),
        *carried,
        F.col("__nl").isNotNull().alias(flag),
    )


def louvain_move_rounds(
    edges: DataFrame,
    rounds: int = 3,
    weight_col: str | None = None,
    resolution: float = 1.0,
    tol: float = 1e-12,
) -> DataFrame:
    """The level-1 local-move phase alone, run for exactly ``rounds``
    synchronous rounds (early-stopping when a round moves nothing):
    ``(id, label)`` with labels drawn from vertex ids (singleton init).
    Fixed rounds keep the phase SQL-replayable — the driver value check
    unrolls the identical dataflow one CTE block per round."""
    sym, deg, m = _louvain_graph(edges, weight_col)
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .transform(flat_checkpoint)
    )
    from ..functions.width import narrowed_shuffle

    ckpt = labels  # checkpointed frame backing the current labels
    spark = edges.sparkSession
    n_sym = sym.count()
    # broadcast-hint the |V|-bounded frames on small graphs, and turn
    # AQE off for the loop: the round plan is fixed-shape over known
    # state, so runtime replanning only adds a per-stage driver
    # barrier (same rationale + set/restore discipline as PageRank's
    # in-loop toggle, operators/pagerank.py)
    hint_small = n_sym <= 2_000_000
    old_aqe = spark.conf.get(_AQE_KEY, "true")
    spark.conf.set(_AQE_KEY, "false")
    try:
        with narrowed_shuffle(spark, n_sym):
            for _ in range(rounds):
                new = _louvain_round(
                    sym, deg, m, labels, resolution, tol, hint_small
                ).transform(flat_checkpoint)
                changed = new.where("__changed").count()
                # the superseded round's checkpoint blocks are dead
                # weight — release them eagerly or 10 rounds of them
                # thrash the heap
                ckpt.unpersist()
                ckpt = new
                labels = new.drop("__changed")
                if changed == 0:
                    break
    finally:
        spark.conf.set(_AQE_KEY, old_aqe)
    sym.unpersist()
    deg.unpersist()
    return labels


def louvain_communities(
    edges: DataFrame,
    weight_col: str | None = None,
    resolution: float = 1.0,
    max_levels: int = 5,
    max_rounds: int = 10,
    tol: float = 1e-12,
) -> DataFrame:
    """Deterministic synchronous multilevel Louvain: ``(id, community)``
    for every vertex of ``edges``, community id = the smallest original
    member vertex id.

    Scale shape per round: one label-attach equi join onto the
    symmetrized adjacency + two map-side-combined aggregates (k_in,
    Σtot) + one per-vertex window top-1 — the LPA shuffle pattern with
    a degree table riding along.  Each level contracts the graph by the
    found partition (coarsen_graph, one groupBy), so later levels run
    on quotient graphs orders of magnitude smaller; self-loops carry
    the absorbed intra-community weight.  No driver-side loops over
    vertices; the only collect is the per-level scalar ``m``.
    """
    from .dag import coarsen_graph

    cur = edges.select(
        "src",
        "dst",
        (
            F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
        ).alias("weight"),
    )
    mapping = None
    from ..functions.width import narrowed_shuffle

    def _free(df) -> None:
        try:
            df.unpersist()
        except Exception:
            pass

    prev_cur = None  # the previous level's checkpointed quotient graph
    spark = edges.sparkSession
    # AQE off across the level loop — fixed-shape rounds over known
    # state (see louvain_move_rounds); restored on exit.
    old_aqe = spark.conf.get(_AQE_KEY, "true")
    spark.conf.set(_AQE_KEY, "false")
    try:
        for _level in range(max_levels):
            sym, deg, m = _louvain_graph(cur, "weight")
            if m == 0:
                sym.unpersist()
                deg.unpersist()
                break
            labels = (
                sym.select(F.col("u").alias("id"))
                .distinct()
                .select("id", F.col("id").alias("label"))
                .transform(flat_checkpoint)
            )
            ckpt = labels
            any_move = False
            n_sym = sym.count()
            hint_small = n_sym <= 2_000_000
            with narrowed_shuffle(edges.sparkSession, n_sym):
                for _ in range(max_rounds):
                    new = _louvain_round(
                        sym, deg, m, labels, resolution, tol, hint_small
                    ).transform(flat_checkpoint)
                    changed = new.where("__changed").count()
                    _free(ckpt)
                    ckpt = new
                    labels = new.drop("__changed")
                    if changed == 0:
                        break
                    any_move = True
            sym.unpersist()
            deg.unpersist()
            if not any_move:
                _free(ckpt)
                break
            canon = (
                labels.join(
                    labels.groupBy("label").agg(F.min("id").alias("community")),
                    "label",
                )
                .select("id", "community")
                .transform(flat_checkpoint)
            )
            _free(ckpt)
            if mapping is None:
                mapping = canon
            else:
                prev_mapping = mapping
                mapping = (
                    mapping.select(
                        "id", F.col("community").alias("__prev")
                    )
                    .join(
                        canon.select(
                            F.col("id").alias("__prev"),
                            F.col("community"),
                        ),
                        "__prev",
                    )
                    .select("id", "community")
                    .transform(flat_checkpoint)
                )
                _free(prev_mapping)
            # checkpoint the quotient graph eagerly: it is tiny (one row per
            # inter-community pair), it flattens the level lineage, and it
            # lets every frame the lazy coarsen referenced be freed now
            cur = (
                coarsen_graph(
                    cur,
                    canon.select("id", F.col("community").alias("label")),
                    weight_col="weight",
                )
                .select(
                    F.col("src_label").alias("src"),
                    F.col("dst_label").alias("dst"),
                    F.col("weight"),
                )
                .transform(flat_checkpoint)
            )
            if prev_cur is not None:
                _free(prev_cur)
            prev_cur = cur
            if canon is not mapping:
                _free(canon)
    finally:
        spark.conf.set(_AQE_KEY, old_aqe)
    if prev_cur is not None:
        _free(prev_cur)
    if mapping is None:
        verts = (
            edges.select(F.col("src").alias("id"))
            .unionAll(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        return verts.select("id", F.col("id").alias("community"))
    return mapping


def louvain_oracle(
    edge_list: list[tuple],
    weighted: bool = False,
    resolution: float = 1.0,
    max_levels: int = 5,
    max_rounds: int = 10,
    tol: float = 1e-12,
) -> dict:
    """Single-node replica of the pinned deterministic synchronous
    multilevel Louvain rule — the pytest exactness oracle (same IEEE
    arithmetic; bit-for-bit for integer weights)."""
    from collections import defaultdict

    def one_level(adj, deg, m, max_rounds):
        lab = {u: u for u in deg}
        moved_any = False
        for _ in range(max_rounds):
            stot = defaultdict(float)
            for u, k in deg.items():
                stot[lab[u]] += k
            mv0 = {}
            for u in deg:
                kin = defaultdict(float)
                for v, w in adj[u].items():
                    if v != u:
                        kin[lab[v]] += w
                la = lab[u]
                kin_a = kin.get(la, 0.0)
                best = None
                for lb in kin:
                    if lb == la:
                        continue
                    gain = (kin[lb] - kin_a) / m - resolution * deg[u] * (
                        stot[lb] - (stot[la] - deg[u])
                    ) / (2.0 * m * m)
                    if gain > tol and (
                        best is None
                        or gain > best[0]
                        or (gain == best[0] and lb < best[1])
                    ):
                        best = (gain, lb)
                if best is not None:
                    mv0[u] = (la, best[1])
            pairs = {(a, b) for a, b in mv0.values()}
            changed = False
            for u, (a, b) in mv0.items():
                if (b, a) in pairs and b > a:
                    continue  # swap guard: into-smaller direction only
                lab[u] = b
                changed = True
                moved_any = True
            if not changed:
                break
        return lab, moved_any

    if weighted:
        edges = [(u, v, float(w)) for u, v, w in edge_list]
    else:
        edges = [(u, v, 1.0) for u, v in edge_list]
    mapping = None
    for _level in range(max_levels):
        adj: dict = defaultdict(lambda: defaultdict(float))
        selfw: dict = defaultdict(float)
        for u, v, w in edges:
            if u == v:
                selfw[u] += w
                adj[u]  # touch so isolated-with-loop vertices exist
            else:
                adj[u][v] += w
                adj[v][u] += w
        deg = {
            u: sum(w for v, w in adj[u].items() if v != u)
            + 2.0 * selfw.get(u, 0.0)
            for u in adj
        }
        m = sum(sum(w for v, w in adj[u].items() if v != u) for u in adj) / 2.0
        m += sum(selfw.values())
        if m == 0:
            break
        for u in adj:
            if selfw.get(u):
                adj[u][u] = selfw[u]
        lab, moved = one_level(adj, deg, m, max_rounds)
        if not moved:
            break
        members = defaultdict(list)
        for u, c in lab.items():
            members[c].append(u)
        canon = {}
        for c, mem in members.items():
            rep = min(mem)
            for u in mem:
                canon[u] = rep
        if mapping is None:
            mapping = dict(canon)
        else:
            mapping = {u: canon[c] for u, c in mapping.items()}
        agg: dict = defaultdict(float)
        for u, v, w in edges:
            agg[(canon[u], canon[v])] += w
        edges = [(a, b, w) for (a, b), w in agg.items()]
    if mapping is None:
        verts = set()
        for t in edge_list:
            verts.add(t[0])
            verts.add(t[1])
        return {u: u for u in verts}
    return mapping


def partition_agreement(p1: DataFrame, p2: DataFrame) -> DataFrame:
    """Adjusted Rand index + normalized mutual information between two
    partitions of the same vertex set — the standard agreement scores
    for comparing community detections (Hubert–Arabie ARI; NMI with
    sklearn's arithmetic-mean normalization).  One row: ``(n, ari,
    nmi)``.

    Inputs are ``(id, label)`` frames; vertices must appear in both
    (inner join — a vertex missing from either side is excluded, like
    comparing on the common support).  Degenerate cases pinned: two
    single-cluster partitions → ARI 1, NMI 1 (sklearn convention);
    all-singletons vs all-singletons likewise.

    Scale shape: one equi join on id + one ``groupBy(l1, l2)``
    contingency count (map-side combined, rows = distinct label pairs
    ≪ vertices), marginals derive from the contingency table itself,
    and the scores are two tiny aggregates — everything past the join
    is broadcast-sized.  All combinatorics stay on longs until the
    final divisions, so any SQL replay is bit-identical.
    """
    j = p1.select(F.col("id"), F.col("label").alias("l1")).join(
        p2.select(F.col("id"), F.col("label").alias("l2")), "id"
    )
    cont = j.groupBy("l1", "l2").agg(F.count(F.lit(1)).alias("nij")).persist()
    a = cont.groupBy("l1").agg(F.sum("nij").alias("ai"))
    b = cont.groupBy("l2").agg(F.sum("nij").alias("bj"))

    def comb2(c):
        return (c * (c - F.lit(1))) / F.lit(2.0)

    n_total = cont.agg(F.sum("nij").alias("n"))
    sums = (
        cont.agg(F.sum(comb2(F.col("nij"))).alias("sum_comb"))
        .crossJoin(a.agg(F.sum(comb2(F.col("ai"))).alias("sum_a")))
        .crossJoin(b.agg(F.sum(comb2(F.col("bj"))).alias("sum_b")))
        .crossJoin(n_total)
    )
    # MI / entropies: contingency joined back to its own marginals
    mi_frame = (
        cont.join(a, "l1")
        .join(b, "l2")
        .crossJoin(F.broadcast(n_total))
        .agg(
            F.sum(
                (F.col("nij") / F.col("n"))
                * F.log(
                    (F.col("n") * F.col("nij"))
                    / (F.col("ai") * F.col("bj"))
                )
            ).alias("mi")
        )
    )
    h1 = (
        a.crossJoin(F.broadcast(n_total))
        .agg(
            F.sum(-(F.col("ai") / F.col("n")) * F.log(F.col("ai") / F.col("n"))).alias("h1")
        )
    )
    h2 = (
        b.crossJoin(F.broadcast(n_total))
        .agg(
            F.sum(-(F.col("bj") / F.col("n")) * F.log(F.col("bj") / F.col("n"))).alias("h2")
        )
    )
    exp = (F.col("sum_a") * F.col("sum_b")) / comb2(F.col("n"))
    maxi = (F.col("sum_a") + F.col("sum_b")) / F.lit(2.0)
    ari = F.when(
        maxi == exp, F.lit(1.0)  # both partitions degenerate: perfect
    ).otherwise((F.col("sum_comb") - exp) / (maxi - exp))
    denom = (F.col("h1") + F.col("h2")) / F.lit(2.0)
    nmi = F.when(denom == 0, F.lit(1.0)).otherwise(F.col("mi") / denom)
    out = (
        sums.crossJoin(mi_frame)
        .crossJoin(h1)
        .crossJoin(h2)
        .select(
            F.col("n").cast("long").alias("n"),
            F.round(ari, 6).alias("ari"),
            F.round(nmi, 6).alias("nmi"),
        )
    )
    cont.unpersist()
    return out


def local_community(
    edges: DataFrame,
    seeds: DataFrame,
    fixed_iterations: int = 6,
    weight_col: str | None = None,
) -> DataFrame:
    """Seed-local community by PPR sweep cut (Andersen–Chung–Lang
    2006): ``(id, pos, conductance)`` — the best-conductance prefix of
    the reached vertices ordered by ``rank/degree``.

    Pinned rule: scores are the engine's fixed-round personalized
    PageRank from the (single) seed; the sweep orders reached
    vertices by ``rank/deg`` (ties → smallest id) over the
    SYMMETRIZED UNWEIGHTED simple graph and returns the prefix
    minimizing ``cut(S)/min(vol(S), vol(V∖S))`` (ties → smallest
    prefix; prefixes with a zero denominator are skipped).
    ``conductance`` repeats the winning value on every row.

    Scale shape: the expensive part is the PPR loop (shared machinery,
    O(rounds·E)); the sweep itself runs over the REACHED set only —
    locality is the point — so its ordering window and the two
    cumulative sums are small-frame operations, with the per-edge
    ``max(pos)`` attach as the only join against the edge set.
    """
    from .ppr import personalized_pagerank

    sym = (
        edges.select("src", "dst")
        .unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    if weight_col is not None:
        und_w = edges.where(F.col("src") != F.col("dst")).select(
            "src", "dst", F.col(weight_col).cast("double").alias("__w")
        )
        walk_edges = (
            und_w.unionAll(
                und_w.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst"), "__w"
                )
            )
            .groupBy("src", "dst")
            .agg(F.sum("__w").alias("__w"))
        )
        p = personalized_pagerank(
            walk_edges, seeds, weight_col="__w",
            fixed_iterations=fixed_iterations,
        ).select("id", "rank")
    else:
        # the PPR walk runs on the SYMMETRIZED graph — community
        # membership must not depend on stored edge orientation
        p = personalized_pagerank(
            sym, seeds, fixed_iterations=fixed_iterations
        ).select("id", "rank")
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    total_vol = sym.count()  # = 2m
    from pyspark.sql import Window

    ranked = (
        p.join(deg, "id")
        .withColumn("__s", F.col("rank") / F.col("deg"))
        .withColumn(
            "pos",
            F.row_number().over(
                Window.orderBy(F.desc("__s"), F.asc("id"))
            ),
        )
        .persist()
    )
    wk = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    vol = ranked.select("pos", F.sum("deg").over(wk).alias("vol"))
    can = sym.where(F.col("src") < F.col("dst"))
    internal = (
        can.join(
            ranked.select(F.col("id").alias("src"), F.col("pos").alias("pu")),
            "src",
        )
        .join(
            ranked.select(F.col("id").alias("dst"), F.col("pos").alias("pv")),
            "dst",
        )
        .select(F.greatest("pu", "pv").alias("mp"))
        .groupBy("mp")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wi = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    sweep = (
        vol.join(internal.withColumnRenamed("mp", "pos"), "pos", "left")
        .select(
            "pos",
            "vol",
            F.sum(F.coalesce("n", F.lit(0))).over(wi).alias("internal"),
        )
        .select(
            "pos",
            (F.col("vol") - 2 * F.col("internal")).alias("cut"),
            F.least(F.col("vol"), F.lit(total_vol) - F.col("vol")).alias(
                "denom"
            ),
        )
        .where(F.col("denom") > 0)
        .select(
            "pos", (F.col("cut") / F.col("denom")).alias("phi")
        )
    )
    best = sweep.agg(
        F.min(F.struct("phi", "pos")).alias("b")
    ).select(
        F.col("b.pos").alias("__k"), F.col("b.phi").alias("__phi")
    )
    out = (
        ranked.crossJoin(F.broadcast(best))
        .where(F.col("pos") <= F.col("__k"))
        .select("id", "pos", F.round(F.col("__phi"), 6).alias("conductance"))
    )
    # Materialize DISTRIBUTED via localCheckpoint (severs the lineage
    # into sym/ranked so both can be unpersisted safely) — never a
    # driver collect: a well-connected seed can reach O(V) vertices in
    # 6 PPR rounds, and callers should get a lazily composable frame.
    result = out.localCheckpoint(eager=True)
    sym.unpersist()
    ranked.unpersist()
    return result
