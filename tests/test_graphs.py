"""Graph kernel tests against brute-force numpy oracles."""

import numpy as np
import scipy.sparse as sp

from singlet_tpu.graphs.spatial import (
    local_knn,
    rescale_spatial,
    snn_graph,
    spatial_graph,
)


def test_spatial_graph_weights_and_normalization(rng):
    c1 = rng.random(40) * 10
    c2 = rng.random(40) * 10
    G = spatial_graph(c1, c2, max_dist=3.0, max_k=100)
    assert G.shape == (40, 40)
    sums = np.asarray(G.sum(axis=0)).ravel()
    np.testing.assert_allclose(sums, 1.0, rtol=1e-9)
    # weight of self-edge = (max_dist - 0)/max_dist before normalization
    d = np.sqrt((c1[:, None] - c1[None, :]) ** 2 + (c2[:, None] - c2[None, :]) ** 2)
    dense = np.asarray(G.todense())
    assert ((dense > 0) <= (d < 3.0)).all()


def test_local_knn_euclidean_matches_bruteforce(rng):
    n, f, k, radius = 50, 6, 4, 4.0
    M = rng.random((f, n)).astype(np.float32)
    cx = (rng.random(n) * 10).astype(np.float32)
    cy = (rng.random(n) * 10).astype(np.float32)
    G = local_knn(M, cx, cy, k=k, radius=radius, metric="euclidean",
                  block=16)
    dense = np.asarray(G.todense())
    sd = np.sqrt((cx[:, None] - cx[None, :]) ** 2 + (cy[:, None] - cy[None, :]) ** 2)
    for i in range(n):
        md = np.linalg.norm(M[:, [i]] - M, axis=0)
        cand = [j for j in range(n) if j != i and sd[i, j] <= radius]
        cand = sorted(cand, key=lambda j: md[j])[:k]
        got = set(np.where(dense[:, i] > 0)[0])
        # ties can permute the cut; require set agreement when distances are
        # distinct at the boundary
        want = set(cand)
        assert got == want, (i, got, want)
        for j in got:
            np.testing.assert_allclose(dense[j, i], md[j], rtol=1e-4)


def test_snn_jaccard_matches_bruteforce(rng):
    n = 30
    # random directed knn-ish pattern
    A = (rng.random((n, n)) < 0.15).astype(float)
    np.fill_diagonal(A, 0)
    G = sp.csc_matrix(A)
    S = snn_graph(G, min_similarity=0.0, block=8)
    dense = np.asarray(S.todense())
    nnz = A.sum(axis=0)
    for i in range(n):
        if nnz[i] == 0:
            assert dense[:, i].sum() == 0
            continue
        assert dense[i, i] == 1.0
        for j in range(n):
            if i == j or nnz[j] == 0:
                continue
            inter = np.sum((A[:, i] > 0) & (A[:, j] > 0))
            union = nnz[i] + nnz[j] - inter
            sim = inter / union if union else 0.0
            if sim > 0:
                np.testing.assert_allclose(dense[j, i], sim, rtol=1e-6)
            else:
                assert dense[j, i] == 0


def test_rescale_spatial():
    coords = np.array([[0.0, 0.0], [0.1, 0.2], [0.2, 0.4], [0.3, 0.8]])
    out = rescale_spatial(coords)
    np.testing.assert_allclose(out[:, 0], [0, 1, 2, 3])
    np.testing.assert_allclose(out[:, 1], [0, 1, 2, 4])
