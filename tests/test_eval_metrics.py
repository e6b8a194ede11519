"""Cross-checks of the on-device evaluation kernels against NetworkX/scipy
— the exact host pipeline the reference uses (utils/evaluation.py)."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _x64_scope():
    # f64 kernels for parity with NetworkX; scoped so the flag does not
    # leak into other test modules
    with jax.enable_x64(True):
        yield


from fcsr_tpu.evalx import (
    betweenness_centrality,
    core_number,
    eigenvector_centrality,
    evaluate_pair_stacks,
    jensen_shannon_distance,
    pagerank,
    pearson_corr,
    print_metrics,
    weighted_kcore_scores,
)
from fcsr_tpu.evalx.metrics import weight_histogram_kl
from tests.conftest import random_symmetric


def _nx_graph(w):
    import networkx as nx
    g = nx.from_numpy_array(w, edge_attr="weight")
    g.remove_edges_from(nx.selfloop_edges(g))
    return g


@pytest.mark.parametrize("density", [1.0, 0.3])
def test_eigenvector_centrality_vs_networkx(rng, density):
    import networkx as nx
    w = random_symmetric(rng, 30, density=density).astype(np.float64)
    w[w.sum(1) == 0, 0] = 0.5  # keep graph connected enough to converge
    w = (w + w.T) / 2
    got = np.asarray(eigenvector_centrality(w))
    want_d = nx.eigenvector_centrality(_nx_graph(w), weight="weight",
                                       max_iter=1000)
    want = np.array([want_d[i] for i in range(30)])
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("density", [1.0, 0.3])
def test_pagerank_vs_networkx(rng, density):
    import networkx as nx
    w = random_symmetric(rng, 25, density=density).astype(np.float64)
    got = np.asarray(pagerank(w))
    want_d = nx.pagerank(_nx_graph(w), weight="weight")
    want = np.array([want_d[i] for i in range(25)])
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_pagerank_handles_dangling(rng):
    import networkx as nx
    w = random_symmetric(rng, 12, density=0.4).astype(np.float64)
    w[5, :] = 0.0
    w[:, 5] = 0.0  # isolated (dangling) node
    got = np.asarray(pagerank(w))
    want_d = nx.pagerank(_nx_graph(w), weight="weight")
    want = np.array([want_d[i] for i in range(12)])
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_betweenness_full_pivots_vs_networkx(rng):
    import networkx as nx
    n = 18
    w = random_symmetric(rng, n, density=0.5).astype(np.float64)
    got = np.asarray(betweenness_centrality(
        jnp.asarray(w), jnp.arange(n, dtype=jnp.int32)))
    want_d = nx.betweenness_centrality(_nx_graph(w), weight="weight",
                                       normalized=True)
    want = np.array([want_d[i] for i in range(n)])
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_betweenness_sampled_pivots_vs_networkx(rng):
    import networkx as nx
    n, k = 22, 7
    w = random_symmetric(rng, n, density=0.6).astype(np.float64)
    g = _nx_graph(w)
    # replicate nx's pivot draw, then hand the same pivots to our kernel
    pivots = np.asarray(random.Random(123).sample(list(g.nodes()), k),
                        dtype=np.int32)
    want_d = nx.betweenness_centrality(g, weight="weight", k=k,
                                       seed=random.Random(123))
    want = np.array([want_d[i] for i in range(n)])
    got = np.asarray(betweenness_centrality(jnp.asarray(w),
                                            jnp.asarray(pivots)))
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_core_number_vs_networkx(rng):
    import networkx as nx
    for density in (0.15, 0.5):
        w = random_symmetric(rng, 40, density=density)
        adj = (w != 0).astype(np.float32)
        got = np.asarray(core_number(adj))
        want_d = nx.core_number(_nx_graph(w))
        want = np.array([want_d[i] for i in range(40)], dtype=np.float64)
        np.testing.assert_array_equal(got, want)


def test_weighted_kcore_matches_reference_semantics(rng):
    """The reference's integer-scaled 'weighted' k-core equals plain k-core
    of the topology (nx.core_number ignores edge data)."""
    import networkx as nx
    w = random_symmetric(rng, 30, density=0.4).astype(np.float64)
    got = np.asarray(weighted_kcore_scores(w))
    g = _nx_graph(w)
    core = nx.core_number(g)
    mx = max(core.values())
    want = np.array([core[i] / mx for i in range(30)])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_jsd_and_pcc_vs_scipy(rng):
    from scipy.spatial.distance import jensenshannon
    from scipy.stats import pearsonr
    x = rng.random(500)
    y = rng.random(500)
    np.testing.assert_allclose(float(jensen_shannon_distance(x, y)),
                               jensenshannon(x, y), atol=1e-9)
    np.testing.assert_allclose(float(pearson_corr(x, y)),
                               pearsonr(x, y)[0], atol=1e-6)


def test_weight_histogram_kl_vs_numpy(rng):
    from scipy.stats import entropy
    w_gt = random_symmetric(rng, 30, density=0.7).astype(np.float64)
    w_pr = random_symmetric(rng, 30, density=0.9).astype(np.float64)
    got = float(weight_histogram_kl(w_gt, w_pr))

    def edge_weights(w):
        iu = np.triu_indices(30, k=1)
        vals = w[iu]
        return vals[vals != 0]

    gw, pw = edge_weights(w_gt), edge_weights(w_pr)
    lo = min(gw.min(), pw.min())
    hi = max(gw.max(), pw.max())
    gh, _ = np.histogram(gw, bins=50, range=(lo, hi), density=True)
    ph, _ = np.histogram(pw, bins=50, range=(lo, hi), density=True)
    gh, ph = gh + 1e-10, ph + 1e-10
    want = entropy(gh / gh.sum(), ph / ph.sum())
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_backends_agree(rng):
    gt = np.stack([random_symmetric(rng, 24, density=0.5) for _ in range(2)])
    pred = np.stack([random_symmetric(rng, 24, density=0.8)
                     for _ in range(2)])
    dev = evaluate_pair_stacks(gt, pred, backend="device", seed=5)
    nxm = evaluate_pair_stacks(gt, pred, backend="networkx", seed=5)
    for key in dev:
        np.testing.assert_allclose(dev[key], nxm[key], rtol=2e-4,
                                   err_msg=key)


@pytest.mark.slow
def test_print_metrics_writes_file(rng, tmp_path):
    gt = np.stack([random_symmetric(rng, 16, density=0.6) for _ in range(2)])
    pred = gt * 0.9
    m = print_metrics(gt, pred, fold_i=3, backend="device",
                      out_dir=str(tmp_path), verbose=False)
    f = tmp_path / "results_fold_3.txt"
    assert f.exists()
    content = f.read_text()
    assert "MAE: " in content and "PCC: " in content
    assert set(m) == {"mae", "pcc", "js_distance", "kl_weights",
                      "mae_betweenness", "mae_eigenvector", "mae_pagerank",
                      "mae_core_periphery"}


def test_weight_histogram_kl_edgeless_placeholder(rng):
    """An edgeless side must contribute the reference's literal
    placeholder weight 0 to its histogram (ref: utils/evaluation.py:
    38-41 builds weights=[0]), not an empty histogram — the two differ
    by an order of magnitude exactly when a prediction degenerates."""
    from scipy.stats import entropy

    w_gt = random_symmetric(rng, 24, density=0.6).astype(np.float64)
    w_zero = np.zeros((24, 24))

    def ref_kl(gt_m, pr_m):
        iu = np.triu_indices(24, k=1)

        def weights(w):
            vals = w[iu]
            vals = vals[vals != 0]
            return vals if len(vals) else np.array([0.0])

        gw, pw = weights(gt_m), weights(pr_m)
        lo = min(gw.min(), pw.min())
        hi = max(gw.max(), pw.max())
        gh, _ = np.histogram(gw, bins=50, range=(lo, hi), density=True)
        ph, _ = np.histogram(pw, bins=50, range=(lo, hi), density=True)
        gh, ph = gh + 1e-10, ph + 1e-10
        return entropy(gh / gh.sum(), ph / ph.sum())

    for gt_m, pr_m in ((w_gt, w_zero), (w_zero, w_gt),
                       (w_zero, w_zero)):
        got = float(weight_histogram_kl(gt_m, pr_m))
        np.testing.assert_allclose(got, ref_kl(gt_m, pr_m), rtol=1e-4,
                                   err_msg=f"gt_edges={gt_m.any()}")


def test_backends_agree_degenerate_pred(rng):
    """A collapsed all-zero prediction (edgeless graphs) must not split
    the backends: device centralities/KL follow the reference's
    placeholder semantics end-to-end."""
    gt = np.stack([random_symmetric(rng, 24, density=0.5)
                   for _ in range(2)])
    pred = np.zeros_like(gt)
    dev = evaluate_pair_stacks(gt, pred, backend="device", seed=5)
    nxm = evaluate_pair_stacks(gt, pred, backend="networkx", seed=5)
    for key in dev:
        np.testing.assert_allclose(dev[key], nxm[key], rtol=2e-4,
                                   err_msg=key)


def test_device_f32_fast_path_matches_f64():
    """precision="float32" (the TPU fast path — v5e emulates f64 ~15x
    slower) agrees with the parity-grade float64 device backend to 1e-5
    on every topology metric, and its Brandes predecessor graph stays
    acyclic (the strict d[u] < d[v] guard; without it f32 near-ties
    create 2-cycles and sigma explodes — measured round 5)."""
    from fcsr_tpu.evalx.report import evaluate_pair_stacks

    rng = np.random.default_rng(11)
    gt = rng.random((6, 60, 60))
    gt = (gt + gt.transpose(0, 2, 1)) / 2
    noise = rng.normal(0, 0.02, gt.shape)
    pred = np.clip(gt + (noise + noise.transpose(0, 2, 1)) / 2, 0, 1)
    for m in gt:
        np.fill_diagonal(m, 0.0)
    for m in pred:
        np.fill_diagonal(m, 0.0)

    m64 = evaluate_pair_stacks(gt, pred, backend="device", seed=42)
    m32 = evaluate_pair_stacks(gt, pred, backend="device", seed=42,
                               precision="float32")
    for k in m64:
        # 3e-5: the full-scale (268-node, 112-pair) BC delta measured
        # 2.9e-5 — dominated by the widened f32 predecessor-tie eps
        assert abs(m64[k] - m32[k]) < 3e-5, (k, m64[k], m32[k])
    # regression metrics are host-f64 in both paths: bit-identical
    for k in ("mae", "pcc", "js_distance"):
        assert m64[k] == m32[k]
