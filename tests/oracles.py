"""Single-node oracles for the iterative analytics passes.

``networkx.pagerank`` delegates to scipy (absent in this environment),
so the oracle here re-implements the exact published power-iteration
semantics of networkx's ``_pagerank_scipy`` (damping alpha, uniform
teleport, uniform dangling redistribution, L1 convergence with
``err < N * tol``) in pure Python dicts — small test graphs only.
"""

from __future__ import annotations


def pagerank_oracle(
    edges: list[tuple[str, str, float]],
    nodes: set[str] | None = None,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    personalization: dict[str, float] | None = None,
    nstart: dict[str, float] | None = None,
    fixed_iter: int | None = None,
) -> dict[str, float]:
    """Edge list is directed ``(src, dst, weight)``; symmetrize first
    for undirected semantics (as networkx's to_directed does).
    ``personalization`` follows networkx: weights normalized, missing
    nodes 0, dangling distribution defaults to it."""
    nodes = set(nodes or set())
    out_w: dict[str, float] = {}
    adj: dict[str, list[tuple[str, float]]] = {}
    for u, v, w in edges:
        nodes.add(u)
        nodes.add(v)
        out_w[u] = out_w.get(u, 0.0) + w
        adj.setdefault(u, []).append((v, w))
    n = len(nodes)
    if n == 0:
        return {}
    if nstart is None:
        x = {v: 1.0 / n for v in nodes}
    else:
        s0 = sum(nstart.values())
        x = {v: nstart.get(v, 0.0) / s0 for v in nodes}
    if personalization is None:
        p = {v: 1.0 / n for v in nodes}
    else:
        s = sum(personalization.values())
        p = {v: personalization.get(v, 0.0) / s for v in nodes}
    for _ in range(fixed_iter if fixed_iter is not None else max_iter):
        xlast = x
        x = {v: 0.0 for v in nodes}
        danglesum = sum(xlast[u] for u in nodes if out_w.get(u, 0.0) == 0.0)
        for u, nbrs in adj.items():
            share = xlast[u] / out_w[u]
            for v, w in nbrs:
                x[v] += alpha * share * w
        for v in nodes:
            x[v] += alpha * danglesum * p[v] + (1.0 - alpha) * p[v]
        if fixed_iter is not None:
            continue
        err = sum(abs(x[v] - xlast[v]) for v in nodes)
        if err < n * tol:
            return x
    if fixed_iter is not None:
        return x
    raise RuntimeError("oracle pagerank failed to converge")


def hits_oracle(
    edges: list[tuple[str, str, float]],
    max_iter: int = 1000,
    tol: float = 1e-12,
    normalized: bool = True,
) -> tuple[dict, dict]:
    """Classic HITS power iteration (the pure-python recurrence from
    networkx's hits_alg before the scipy rewrite): a from h over
    in-edges, h from raw a over out-edges, per-round 1/max scaling,
    L1 convergence on h, final 1/sum normalization."""
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    out = {n: [] for n in nodes}
    for u, v, w in edges:
        out[u].append((v, w))
    h = {n: 1.0 / len(nodes) for n in nodes}
    for _ in range(max_iter):
        hlast = h
        a = {n: 0.0 for n in nodes}
        for u in nodes:
            for v, w in out[u]:
                a[v] += hlast[u] * w
        h = {n: 0.0 for n in nodes}
        for u in nodes:
            for v, w in out[u]:
                h[u] += a[v] * w
        smax = max(h.values()) or 1.0
        h = {n: x / smax for n, x in h.items()}
        amax = max(a.values()) or 1.0
        a = {n: x / amax for n, x in a.items()}
        if sum(abs(h[n] - hlast[n]) for n in nodes) < tol:
            break
    if normalized:
        sh = sum(h.values()) or 1.0
        sa = sum(a.values()) or 1.0
        h = {n: x / sh for n, x in h.items()}
        a = {n: x / sa for n, x in a.items()}
    return h, a
