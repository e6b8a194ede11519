"""On-device graph centrality kernels.

jnp re-implementations of the NetworkX algorithms the reference's
evaluation pass runs per sample on the host
(ref: utils/evaluation.py:66-76,134-174), with matching semantics:

  * eigenvector centrality — (I + A) power iteration, L2 normalization,
    L1 convergence at n*tol (networkx eigenvector_centrality).
  * PageRank — row-stochastic power iteration with dangling handling
    (networkx _pagerank_scipy).
  * betweenness centrality — pivot-sampled Brandes with Dijkstra distances
    computed by dense min-plus (Bellman-Ford) relaxation and
    distance-ordered sigma/dependency accumulation. Edge weights act as
    DISTANCES, as in networkx.
  * core number — iterative peeling on the binary topology. NOTE: the
    reference's 'weighted k-core' (utils/evaluation.py:134-174) scales
    weights to integers but then calls nx.core_number, which ignores edge
    data entirely — so the result is the plain k-core of the unweighted
    topology. We implement exactly that (and document the subtlety).

All kernels are jit/vmap-friendly with static shapes; batching over
samples/pivots is via vmap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["eigenvector_centrality", "pagerank", "betweenness_centrality",
           "core_number", "weighted_kcore_scores"]

_INF = 1e30


def _offdiag(w):
    n = w.shape[-1]
    return w * (1.0 - jnp.eye(n, dtype=w.dtype))


def eigenvector_centrality(w, max_iter: int = 1000, tol: float = 1e-6,
                           return_converged: bool = False,
                           dtype=jnp.float64):
    """NetworkX-semantics eigenvector centrality of a weighted undirected
    graph given as a dense matrix (self-loops ignored).

    ``return_converged`` additionally returns the convergence flag —
    networkx RAISES PowerIterationFailedConvergence when max_iter is
    exhausted; device callers should check the flag and mirror that
    (report.py does) instead of silently using the last iterate.

    ``dtype``: float64 (default) matches networkx's double-precision
    values to ~1e-8; float32 is the TPU fast path (v5e has no native
    f64 ALU — XLA emulates it ~15x slower) with values within ~1e-6."""
    w = _offdiag(jnp.asarray(w, dtype=dtype))
    n = w.shape[0]
    x0 = jnp.full((n,), 1.0 / n, dtype=dtype)

    def cond(state):
        _, it, done = state
        return (~done) & (it < max_iter)

    def body(state):
        x, it, done = state
        xlast = x
        x = xlast + w @ xlast
        norm = jnp.sqrt(jnp.sum(x * x))
        x = x / jnp.where(norm == 0, 1.0, norm)
        new_done = jnp.sum(jnp.abs(x - xlast)) < n * tol
        # freeze once converged: under vmap the loop runs until ALL batch
        # elements converge, and extra iterations must not drift the result
        # past networkx's exact stopping point
        x = jnp.where(done, xlast, x)
        return x, it + 1, done | new_done

    x, _, done = jax.lax.while_loop(cond, body, (x0, 0, jnp.bool_(False)))
    if return_converged:
        return x, done
    return x


def pagerank(w, alpha: float = 0.85, max_iter: int = 100, tol: float = 1e-6,
             return_converged: bool = False, dtype=jnp.float64):
    """NetworkX-semantics PageRank on a dense weighted matrix (self-loops
    ignored; undirected graphs are symmetric here so in/out coincide).
    ``return_converged``/``dtype``: see eigenvector_centrality."""
    w = _offdiag(jnp.asarray(w, dtype=dtype))
    n = w.shape[0]
    s = w.sum(axis=1)
    a = jnp.where(s[:, None] != 0, w / jnp.where(s[:, None] == 0, 1.0,
                                                 s[:, None]), 0.0)
    dangling = s == 0
    p = jnp.full((n,), 1.0 / n, dtype=dtype)
    x0 = p

    def cond(state):
        _, it, done = state
        return (~done) & (it < max_iter)

    def body(state):
        x, it, done = state
        xlast = x
        x = alpha * (x @ a + jnp.sum(jnp.where(dangling, x, 0.0)) * p) \
            + (1 - alpha) * p
        new_done = jnp.sum(jnp.abs(x - xlast)) < n * tol
        x = jnp.where(done, xlast, x)  # freeze after convergence (see EC)
        return x, it + 1, done | new_done

    x, _, done = jax.lax.while_loop(cond, body, (x0, 0, jnp.bool_(False)))
    if return_converged:
        return x, done
    return x


def _dijkstra_dense(dist_mx, source: jax.Array):
    """Single-source shortest-path distances on a dense distance matrix via
    min-plus (Bellman-Ford) relaxation TO FIXPOINT; non-edges must be _INF.

    Fixpoint iteration count = the shortest-path-tree depth (a handful of
    hops for dense connectome graphs), not n — this is both the runtime
    win (n x 268^2 -> depth x 268^2 flops) and the compile win vs the
    round-1 fori(n) form (the official-metrics program's first TPU compile
    dropped from ~minutes; see PERF.md)."""
    n = dist_mx.shape[0]
    d0 = jnp.full((n,), _INF, dtype=dist_mx.dtype).at[source].set(0.0)

    def cond(state):
        _, changed, it = state
        return changed & (it < n)

    def body(state):
        d, _, it = state
        d2 = jnp.minimum(d, jnp.min(d[:, None] + dist_mx, axis=0))
        return d2, jnp.any(d2 < d), it + 1

    d, _, _ = jax.lax.while_loop(cond, body, (d0, jnp.bool_(True), 0))
    return d


def _brandes_from_pivot(dist_mx, source: jax.Array, eps: float = 1e-12):
    """Per-pivot Brandes dependency accumulation (endpoints excluded).

    Returns delta: the unnormalized dependency of each node w.r.t. this
    source. Predecessor relation: edge (u, v) with d[u] + w(u,v) == d[v]
    (within eps tolerance, scaled by distance magnitude).

    Path counts and dependencies are computed as FIXPOINTS of dense
    matrix-vector recurrences over the predecessor DAG instead of the
    textbook distance-ordered sequential accumulation: the DAG is acyclic
    (positive weights), so

        sigma = e_s + P^T sigma          converges in DAG-depth iterations
        delta = R (1 + delta),  R = P * sigma_u / sigma_v   likewise

    and the fixpoints equal the sequential results exactly. No dynamic
    indexing, no argsort — matvec loops the TPU compiler handles well.
    """
    n = dist_mx.shape[0]
    d = _dijkstra_dense(dist_mx, source)
    reach = d < _INF / 2

    # pred[u, v] = True iff u is a Dijkstra predecessor of v. The strict
    # d[u] < d[v] condition is implied by positive weights in exact math
    # but NOT under rounding: without it, a near-tie within eps in both
    # directions creates a 2-cycle in the "DAG" and the sigma fixpoint
    # explodes geometrically (observed in f32). With it the predecessor
    # graph is provably acyclic in any precision (d strictly increases
    # along every edge).
    has_edge = dist_mx < _INF / 2
    tol = eps * (1.0 + jnp.abs(d)[None, :])
    pred = has_edge & reach[:, None] & reach[None, :] \
        & (jnp.abs(d[:, None] + dist_mx - d[None, :]) <= tol) \
        & (d[:, None] < d[None, :])
    p_mx = pred.astype(d.dtype)

    e_s = jnp.zeros((n,), dtype=d.dtype).at[source].set(1.0)

    def sig_cond(state):
        sigma, prev, it = state
        return jnp.any(sigma != prev) & (it < n + 1)

    def sig_body(state):
        sigma, _, it = state
        new = (e_s + sigma @ p_mx).at[source].set(1.0)
        return new, sigma, it + 1

    sigma, _, _ = jax.lax.while_loop(
        sig_cond, sig_body, (e_s, jnp.full((n,), -1.0, dtype=d.dtype), 0))

    # R[u, v] = pred[u,v] * sigma_u / sigma_v (0 where sigma_v == 0)
    safe = jnp.where(sigma > 0, sigma, 1.0)
    r_mx = p_mx * sigma[:, None] / safe[None, :]
    r_mx = r_mx * (sigma > 0)[None, :]

    def del_cond(state):
        delta, prev, it = state
        return jnp.any(delta != prev) & (it < n + 1)

    def del_body(state):
        delta, _, it = state
        new = (r_mx @ (1.0 + delta)).at[source].set(0.0)
        return new, delta, it + 1

    delta0 = jnp.zeros((n,), dtype=d.dtype)
    delta, _, _ = jax.lax.while_loop(
        del_cond, del_body, (delta0, jnp.full((n,), -1.0, dtype=d.dtype), 0))
    return delta.at[source].set(0.0)


@partial(jax.jit, static_argnames=("normalized", "dtype"))
def betweenness_centrality(w, pivots, normalized: bool = True,
                           dtype=jnp.float64):
    """Pivot-sampled weighted betweenness centrality
    (networkx betweenness_centrality(weight='weight', k=len(pivots))).

    ``w``: dense weight matrix (weights act as distances, nx semantics);
    ``pivots``: int array of source nodes (sample them host-side to mirror
    the reference's stochastic pivot choice, ref: utils/evaluation.py:66-67).
    Uses the networkx>=3.5 sampling rescale: source pivots are scaled by
    1/((k-1)(n-2)), non-pivots by 1/(k(n-2)).

    ``dtype``: float64 (default) reproduces networkx to ~1e-9; float32
    is the TPU fast path (no native f64 on v5e) — the predecessor-tie
    tolerance widens from 1e-12 to 1e-5 relative, so near-degenerate
    shortest-path ties may resolve differently (values within ~1e-5 on
    connectome-class graphs, measured round 5).
    """
    w = _offdiag(jnp.asarray(w, dtype=dtype))
    n = w.shape[0]
    k = pivots.shape[0]
    eps = 1e-12 if dtype == jnp.float64 else 1e-5
    dist_mx = jnp.where(w != 0, w, _INF)
    dist_mx = jnp.where(jnp.eye(n, dtype=bool), _INF, dist_mx)

    deltas = jax.vmap(lambda s: _brandes_from_pivot(dist_mx, s,
                                                    eps=eps))(pivots)
    bc = deltas.sum(axis=0)

    if normalized:
        is_pivot = jnp.zeros((n,), dtype=bool).at[pivots].set(True)
        if k > 1:
            scale_src = 1.0 / ((k - 1) * (n - 2))
        else:
            scale_src = jnp.nan
        scale_non = 1.0 / (k * (n - 2))
        bc = bc * jnp.where(is_pivot, scale_src, scale_non)
    else:
        is_pivot = jnp.zeros((n,), dtype=bool).at[pivots].set(True)
        scale_src = (n - 1) / ((k - 1) * 2.0) if k > 1 else jnp.nan
        scale_non = (n - 1) / (k * 2.0)
        bc = bc * jnp.where(is_pivot, scale_src, scale_non)
    return bc


@jax.jit
def core_number(adj_bool):
    """k-core numbers of a binary undirected topology via iterative peeling
    (networkx core_number semantics; self-loops must be absent)."""
    n = adj_bool.shape[0]
    adj = jnp.asarray(adj_bool, dtype=jnp.float32)
    adj = _offdiag(adj)

    def cond(state):
        alive, _, _ = state
        return alive.any()

    def body(state):
        alive, core, k = state
        deg = (adj * alive[None, :]).sum(axis=1) * alive
        deg = jnp.where(alive, deg, jnp.inf)
        k = jnp.maximum(k, jnp.min(deg))

        # peel everything with degree <= k until fixpoint at this k
        def peel_cond(s):
            alive_i, _ = s
            deg_i = (adj * alive_i[None, :]).sum(axis=1)
            return (alive_i & (deg_i <= k)).any()

        def peel_body(s):
            alive_i, core_i = s
            deg_i = (adj * alive_i[None, :]).sum(axis=1)
            remove = alive_i & (deg_i <= k)
            core_i = jnp.where(remove, k, core_i)
            return alive_i & ~remove, core_i

        alive, core = jax.lax.while_loop(peel_cond, peel_body, (alive, core))
        return alive, core, k

    alive0 = adj.sum(axis=1) >= 0  # all nodes (isolated nodes get core 0)
    core0 = jnp.zeros((n,))
    _, core, _ = jax.lax.while_loop(cond, body,
                                    (alive0, core0, jnp.float32(0.0)))
    return core


def weighted_kcore_scores(w):
    """The reference's 'core-periphery' score
    (ref: utils/evaluation.py:134-174): integer weight scaling feeds
    nx.core_number, which ignores weights — so this is exactly the plain
    k-core of the nonzero off-diagonal topology, normalized to [0, 1] by the
    max core; returns zeros for an edgeless graph.
    """
    w = jnp.asarray(w)
    adj = _offdiag(jnp.asarray(w != 0, dtype=jnp.float32))
    core = core_number(adj)
    mx = core.max()
    return jnp.where(mx > 0, core / jnp.where(mx > 0, mx, 1.0),
                     jnp.zeros_like(core))
