"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — brute-force exact top-k, pure column
  expressions (``zip_with`` dot product inside whole-stage codegen).
  The correctness baseline and fine for |queries| × |corpus| that fits
  a broadcast.
- :func:`lsh_bucketed_topk` — a scale path: random-hyperplane LSH
  buckets both sides, candidates only meet in-bucket, then exact
  cosine re-rank in-bucket.  Recall < 1 by construction; bits/tables
  trade recall for candidate count.
- :func:`ivf_topk` — the other scale path: IVF (inverted-file)
  k-means partitioning; queries probe their ``nprobe`` nearest lists
  and rerank exactly inside them.  ``nprobe == n_centroids``
  degenerates to the exact brute force (pinned by tests).
- :func:`cosine_pairs_exact` / :func:`embedding_near_pairs` —
  embedding-cosine near-duplicate pairs (exact baseline / sign-LSH
  blocked).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F

from ..checkpoint import flat_checkpoint


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    ac = F.transform(F.col(a), lambda x: x.cast("double"))
    bc = F.transform(F.col(b), lambda x: x.cast("double"))
    return df.withColumn(
        out,
        _dot(ac, bc) / (F.greatest(_norm(ac) * _norm(bc), F.lit(1e-30))),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: ``(query_id, vec_id, cosine)``.

    Cross join with the (small) query side broadcast; ranks via a
    per-query window.  Deterministic tie-break: cosine desc, vec_id asc.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cv"))
    scored = with_cosine(
        c.crossJoin(F.broadcast(q)), "__qv", "__cv"
    ).where(F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"))
    )


def cosine_pairs_exact(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs ``(a, b, cosine >= τ)``.

    Exact O(n²) self-join — the verification baseline the LSH path
    (:func:`embedding_near_pairs`) is measured against, and the
    in-bucket verifier it delegates to.  Fine up to ~10⁵ rows; beyond
    that use the bucketed variant.
    """
    left = emb.select(F.col(id_col).alias("a"), F.col(vec_col).alias("__va"))
    right = emb.select(F.col(id_col).alias("b"), F.col(vec_col).alias("__vb"))
    pairs = left.join(right, F.col("a") < F.col("b"))
    return (
        with_cosine(pairs, "__va", "__vb")
        .where(F.col("cosine") >= threshold)
        .select("a", "b", F.round("cosine", 6).alias("cosine"))
    )


def embedding_near_pairs(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.9,
    bits: int = 12,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs at scale: sign-LSH blocking.

    Each of ``tables`` independent ``bits``-bit hyperplane codes
    buckets the corpus; candidate pairs only ever meet inside a
    bucket (|bucket|²-local work instead of n²), then the exact
    cosine filter keeps true near-dups.  Recall < 1 by construction —
    a pair is missed iff it collides in no table; more tables / fewer
    bits raise recall at higher candidate cost.

    ``max_bucket_size`` (r5): hot-bucket guard — sign-code buckets
    larger than the cap are dropped from that table before the
    Σ|bucket|² self-join (the vector keeps its other ``tables-1``
    codes).  A mass of near-identical embeddings (e.g. a re-encoded
    boilerplate cluster) otherwise lands in ONE bucket per table and
    costs |cluster|² in every table.  Recall contract: a pair is
    missed iff every table's shared bucket is degenerate.  Default
    ``None`` is exhaustive (the value-checked configuration).
    """
    # Bucket self-joins carry IDS ONLY; vectors re-attach per deduped
    # candidate pair via hinted sort-merge joins.  Dragging the dim-
    # float arrays through tables× bucket replicas multiplies shuffle
    # bytes by the vector width, and Catalyst's array-blind size
    # estimate invites a broadcast build of the vector side (the
    # maxResultSize / broadcast-timeout failure mode measured on the
    # MinHash twin — see dedup.minhash_lsh_pairs).
    parts = []
    base = emb.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    for t in range(tables):
        b = hyperplane_signs(base, "__v", dim, bits, seed + 131 * t).select(
            "bucket", "__id"
        )
        if max_bucket_size is not None:
            from pyspark.sql import Window

            w = Window.partitionBy("bucket")
            b = (
                b.withColumn("__bsz", F.count("*").over(w))
                .where(F.col("__bsz") <= max_bucket_size)
                .drop("__bsz")
            )
        left = b.select("bucket", F.col("__id").alias("a"))
        right = b.select("bucket", F.col("__id").alias("b"))
        # hinted SMJ like the MinHash band join: both sides are |corpus|
        # rows behind an estimator-blind projection — a broadcast build
        # here computes the whole sign pass inside the broadcast thread
        parts.append(
            left.join(right.hint("merge"), "bucket")
            .where(F.col("a") < F.col("b"))
            .drop("bucket")
        )
    cands = parts[0]
    for p in parts[1:]:
        cands = cands.unionByName(p)
    cands = (
        cands.dropDuplicates(["a", "b"])
        .join(
            base.select(
                F.col("__id").alias("a"), F.col("__v").alias("__va")
            ).hint("merge"),
            "a",
        )
        .join(
            base.select(
                F.col("__id").alias("b"), F.col("__v").alias("__vb")
            ).hint("merge"),
            "b",
        )
    )
    return (
        with_cosine(cands, "__va", "__vb")
        .where(F.col("cosine") >= threshold)
        .select("a", "b", F.round("cosine", 6).alias("cosine"))
    )


def _ivf_assign(base: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the (tiny) centroid table
    against the corpus, keep the best ``cid`` per vector.  Work is
    |corpus| × n_centroids — linear in the corpus, never corpus²."""
    scored = with_cosine(base.crossJoin(F.broadcast(cents)), "__v", "__cv", "__sim")
    w = Window.partitionBy("__id").orderBy(F.desc("__sim"), F.asc("cid"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("__id", "__v", "cid")
    )


def ivf_centroids(
    base: DataFrame, n_centroids: int, lloyd_iters: int, seed: int
) -> DataFrame:
    """Deterministic IVF codebook ``(cid, __cv array<double>)``.

    Seeds = the ``n_centroids`` corpus vectors with the smallest
    portable ``hash60(id|seed)`` (the md5-affine convention every
    deterministic op uses — a deterministic sample, no RNG state, and
    replayable in ANSI SQL so the codebook itself is oracle-checkable),
    refined by ``lloyd_iters`` synchronous k-means steps — assignment
    is a broadcast scoring pass, the new centroid is the element-wise
    mean via ``posexplode``/``groupBy(cid, pos)`` (map-side partial
    agg; JVM-side throughout).  Empty clusters drop out.
    """
    from ..functions.hashing import hash60_keyed

    seeds = (
        base.select("__id", "__v", hash60_keyed("__id", F.lit(seed)).alias("__h"))
        .orderBy("__h")
        .limit(n_centroids)
    )
    cents = seeds.select(
        F.row_number().over(Window.orderBy("__h")).alias("cid"),
        F.transform("__v", lambda x: x.cast("double")).alias("__cv"),
    ).localCheckpoint()
    for _ in range(lloyd_iters):
        assigned = _ivf_assign(base, cents)
        cents = (
            assigned.select("cid", F.posexplode("__v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("__s"))
            .select("cid", F.transform("__s", lambda t: t["m"]).alias("__cv"))
            .transform(flat_checkpoint)  # tiny; reused by assignment AND routing (broadcast is hinted, not stats-derived)
        )
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    lloyd_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) partitioning.

    The corpus is clustered into ``n_centroids`` inverted lists; each
    query probes its ``nprobe`` nearest lists and reranks exactly
    inside them (candidates meet through the ``cid`` equi-join only).
    With ``nprobe == n_centroids`` every list is probed, so the result
    is exactly :func:`cosine_topk` — the property the test suite pins.
    Recall at ``nprobe < n_centroids`` depends on how cluster-shaped
    the corpus is; raise ``nprobe`` to trade cost for recall.
    """
    base = corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    cents = ivf_centroids(base, n_centroids, lloyd_iters, seed)
    inv = _ivf_assign(base, cents)  # the inverted lists: (cid, __id, __v)

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    routed = with_cosine(q.crossJoin(F.broadcast(cents)), "__qv", "__cv", "__sim")
    wq = Window.partitionBy("query_id").orderBy(F.desc("__sim"), F.asc("cid"))
    probes = (
        routed.withColumn("__rn", F.row_number().over(wq))
        .where(F.col("__rn") <= nprobe)
        .select("query_id", "__qv", "cid")
    )

    cands = probes.join(inv, "cid").where(F.col("query_id") != F.col("__id"))
    scored = with_cosine(cands, "__qv", "__v")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("__id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select(
            "query_id",
            F.col("__id").alias("vec_id"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


def hyperplane_signs(
    df: DataFrame, vec_col: str, dim: int, bits: int, seed: int, out: str = "bucket"
) -> DataFrame:
    """Random-hyperplane LSH bucket id (one long per row).

    The hyperplanes are a driver-side (bits × dim) matrix folded into
    literal arrays — tiny, broadcast with the plan, no join.
    """
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((bits, dim))
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucket = F.lit(0).cast("long")
    for i in range(bits):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        d = _dot(v, plane)
        bucket = bucket.bitwiseOR(
            F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return df.withColumn(out, bucket)


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 8,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: union of per-table bucket-local exact rerank.

    Each of ``tables`` independent sign-LSH codes buckets both sides;
    a pair is scored iff it collides in at least one table.  The final
    window dedups and keeps the best k per query.
    """
    # Same id-only bucket-join discipline as embedding_near_pairs:
    # the corpus vectors never ride the tables× bucket replicas; both
    # sides' vectors re-attach after the candidate dedup (query side
    # is usually broadcast-small — Spark may still pick BHJ there from
    # honest row counts; the hint only pins the corpus side).
    cbase = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cv"))
    qbase = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    parts = []
    for t in range(tables):
        cb = hyperplane_signs(cbase, "__cv", dim, bits, seed + 131 * t).select(
            "bucket", "vec_id"
        )
        qb = hyperplane_signs(qbase, "__qv", dim, bits, seed + 131 * t).select(
            "bucket", "query_id"
        )
        parts.append(cb.join(qb, "bucket").drop("bucket"))
    cands = parts[0]
    for p in parts[1:]:
        cands = cands.unionByName(p)
    cands = (
        cands.dropDuplicates(["query_id", "vec_id"])
        .join(cbase.hint("merge"), "vec_id")
        .join(qbase, "query_id")
    )
    cands = cands.where(
        F.col("query_id") != F.col("vec_id")
    )
    scored = with_cosine(cands, "__qv", "__cv")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"))
    )


def embedding_clusters(
    corpus: DataFrame,
    n_clusters: int = 16,
    lloyd_iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Deterministic k-means clustering of an embedding column as a
    first-class op: ``(vec_id, cid, cosine)`` — each vector's cluster
    and its similarity to the final centroid.

    This is the same codebook the IVF index builds
    (:func:`ivf_centroids`: hash-sampled seeds + synchronous Lloyd
    steps, JVM-side throughout) surfaced for the pipeline uses beyond
    ANN — semantic sharding of a corpus, diversity sampling, topic
    bucketing before dedup.  Deterministic in (data, seed): seeds are
    the ``n_clusters`` vectors with the smallest portable
    ``hash60(id|seed)``, so the WHOLE pipeline (seed pick, each Lloyd
    step, the final assignment) replays in ANSI SQL and the driver
    value-checks it end-to-end (``_embed_clusters_sql`` in
    ``__spark_entry__``).  Scale: every pass is a broadcast of the tiny
    centroid table against the corpus + one posexplode mean — linear in
    corpus size, no corpus x corpus term anywhere.
    """
    base = corpus.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    )
    cents = ivf_centroids(base, n_clusters, lloyd_iters, seed)
    scored = with_cosine(
        base.crossJoin(F.broadcast(cents)), "__v", "__cv", "__sim"
    )
    w = Window.partitionBy("__id").orderBy(F.desc("__sim"), F.asc("cid"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col("__id").alias(id_col),
            "cid",
            F.round("__sim", 6).alias("cosine"),
        )
    )


def mutual_knn_graph(
    emb: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Mutual k-nearest-neighbor similarity graph ``(src < dst,
    cosine)``: an edge iff each endpoint ranks in the other's exact
    cosine top-k (deterministic tie-break: cosine desc, id asc).

    The embeddings→graph bridge: mutual-kNN is the standard
    similarity-graph construction for density clustering and
    diversity sampling — compose with
    :func:`~.components.connected_components` for cluster ids, or
    feed the motif/centrality engines.  Mutuality prunes hub
    false-neighbors (a vector that everyone lists but that lists no
    one back), which plain kNN graphs suffer under skewed density.

    This composition uses the exact :func:`cosine_topk` baseline
    (corpus-broadcast cross join) — right for the value-checked
    contract and ≤10⁵ rows; at 100-TB scale swap the neighbor source
    for :func:`ivf_ann_topk` / :func:`lsh_ann_topk` (same
    ``(query_id, vec_id, cosine)`` shape) and keep the identical
    mutual join.
    """
    nn = cosine_topk(emb, emb, k=k, id_col=id_col, vec_col=vec_col)
    fwd = nn.select(
        F.col("query_id").alias("src"),
        F.col("vec_id").alias("dst"),
        "cosine",
    )
    rev = nn.select(
        F.col("vec_id").alias("src"), F.col("query_id").alias("dst")
    )
    return (
        fwd.join(rev, ["src", "dst"])
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst", "cosine")
    )
