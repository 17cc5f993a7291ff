"""Sharded ELL engine: equivalence with the single-chip dense engine."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax

from singlet_tpu.parallel.sharded import make_mesh
from singlet_tpu.parallel.sharded_ell import sharded_ell_nmf_fit
from singlet_tpu.solvers.als import nmf_fit
from singlet_tpu.solvers.ard import ard_nmf_fit


def _sparse(rng, genes=48, cells=64, density=0.2):
    A = sp.random(genes, cells, density=density, random_state=11,
                  dtype=np.float32, format="csc")
    A.data = np.abs(A.data) + 0.1
    return A


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


def test_sharded_ell_plain_matches_dense(rng, mesh8):
    A = _sparse(rng)
    w0 = rng.random((A.shape[0], 4)).astype(np.float32)
    single = nmf_fit(np.asarray(A.todense()), 4, w_init=w0, tol=0.0, maxit=4)
    multi = sharded_ell_nmf_fit(A, 4, mesh=mesh8, w_init=w0, tol=0.0, maxit=4)
    np.testing.assert_allclose(multi["w"], single.w, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(multi["h"], single.h, rtol=3e-4, atol=3e-5)


def test_sharded_ell_masked_matches_dense(rng, mesh8):
    A = _sparse(rng)
    w0 = rng.random((A.shape[0], 3)).astype(np.float32)
    single = ard_nmf_fit(np.asarray(A.todense()), 3, w_init=w0, mask_seed=21,
                         inv_density=8, tol=0.0, maxit=3, trace_test_mse=10)
    multi = sharded_ell_nmf_fit(A, 3, mesh=mesh8, w_init=w0, tol=0.0,
                                maxit=3, masked=True, inv_density=8,
                                mask_seed=21)
    np.testing.assert_allclose(multi["w"], single.w, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(multi["test_mse"], single.test_mse[-1],
                               rtol=1e-3)


def test_sharded_ell_mesh_invariance(rng):
    A = _sparse(rng, genes=40, cells=48)
    w0 = rng.random((40, 3)).astype(np.float32)
    r2 = sharded_ell_nmf_fit(A, 3, mesh=make_mesh(2), w_init=w0, tol=0.0,
                             maxit=3, masked=True, inv_density=8, mask_seed=5)
    r8 = sharded_ell_nmf_fit(A, 3, mesh=make_mesh(8), w_init=w0, tol=0.0,
                             maxit=3, masked=True, inv_density=8, mask_seed=5)
    np.testing.assert_allclose(r2["w"], r8["w"], rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(r2["test_mse"], r8["test_mse"], rtol=1e-4)


def test_local_ell_ingest_equals_full_ingest(rng, mesh8):
    """Single-process twin of the multi-host ELL ingest: per-process chunk
    (= all true columns here) must assemble bit-identical planes."""
    from singlet_tpu.parallel.sharded_ell import (
        shard_ell_data,
        shard_ell_from_local,
    )

    A = _sparse(rng, genes=52, cells=72)
    full = shard_ell_data(A, mesh8)
    local = shard_ell_from_local(A, A.shape[1], mesh8)
    for f in ("b_li", "b_val", "nonempty", "gene_nonempty"):
        np.testing.assert_array_equal(np.asarray(getattr(local, f)),
                                      np.asarray(getattr(full, f)), err_msg=f)
    assert (local.cell_block, local.gene_block) == (full.cell_block,
                                                    full.gene_block)


def test_fused_vs_host_loop_equivalence(rng, mesh8):
    """The fused whole-fit device loop must reproduce the per-iteration
    host loop (which the checkpoint path uses) exactly."""
    from singlet_tpu.checkpoint import CheckpointManager
    from singlet_tpu.parallel.sharded_ell import ShardedEllEngine

    A = _sparse(rng)
    w0 = rng.random((A.shape[0], 3)).astype(np.float32)
    eng = ShardedEllEngine(A, mesh=mesh8)
    fused = eng.ard_fit(3, w_init=w0, mask_seed=9, inv_density=8, tol=0.0,
                        maxit=5, trace_test_mse=2, k_bucket=1)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        mgr = CheckpointManager(d, every=0)   # host loop, no actual saves
        host = eng.ard_fit(3, w_init=w0, mask_seed=9, inv_density=8,
                           tol=0.0, maxit=5, trace_test_mse=2,
                           checkpoint=mgr)
    np.testing.assert_allclose(fused.w, host.w, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(fused.test_mse, host.test_mse, rtol=1e-6)
    assert fused.iter == host.iter
    np.testing.assert_allclose(fused.score_overfit, host.score_overfit,
                               rtol=1e-5, atol=1e-7)


def test_k_bucket_invariance_on_mesh(rng, mesh8):
    """Rank-bucketed (k padded to a multiple) sharded masked fits must equal
    unbucketed fits — padded factor columns stay exactly zero."""
    from singlet_tpu.parallel.sharded_ell import ShardedEllEngine

    A = _sparse(rng)
    w0 = rng.random((A.shape[0], 3)).astype(np.float32)
    eng = ShardedEllEngine(A, mesh=mesh8)
    plain = eng.ard_fit(3, w_init=w0, mask_seed=4, inv_density=8, tol=0.0,
                        maxit=4, trace_test_mse=2, k_bucket=1)
    bucketed = eng.ard_fit(3, w_init=w0, mask_seed=4, inv_density=8,
                           tol=0.0, maxit=4, trace_test_mse=2, k_bucket=8)
    assert bucketed.w.shape == plain.w.shape == (A.shape[0], 3)
    np.testing.assert_allclose(bucketed.w, plain.w, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(bucketed.test_mse, plain.test_mse, rtol=1e-4)
    assert bucketed.iter == plain.iter


def test_sharded_masked_per_side_penalties(rng, mesh8):
    """A (w, h) L1 pair must reach both masked half-updates (previously the
    w side was silently dropped)."""
    from singlet_tpu.parallel.sharded_ell import sharded_ell_nmf_fit

    A = _sparse(rng)
    w0 = rng.random((A.shape[0], 3)).astype(np.float32)
    both = sharded_ell_nmf_fit(A, 3, mesh=mesh8, w_init=w0, tol=0.0, maxit=3,
                               masked=True, inv_density=8, mask_seed=3,
                               L1=(0.2, 0.0))
    none = sharded_ell_nmf_fit(A, 3, mesh=mesh8, w_init=w0, tol=0.0, maxit=3,
                               masked=True, inv_density=8, mask_seed=3,
                               L1=(0.0, 0.0))
    assert not np.allclose(both["w"], none["w"])


def test_sharded_checkpoint_resume_identical(rng, mesh8, tmp_path):
    """Mesh twin of test_checkpoint.py::test_ard_fit_resume_identical."""
    from singlet_tpu.checkpoint import CheckpointManager
    from singlet_tpu.parallel.sharded_ell import ShardedEllEngine

    A = _sparse(rng)
    w0 = rng.random((A.shape[0], 3)).astype(np.float32)
    eng = ShardedEllEngine(A, mesh=mesh8)
    mgr_full = CheckpointManager(str(tmp_path / "full"), every=0)
    full = eng.ard_fit(3, w_init=w0, mask_seed=5, inv_density=8, tol=0.0,
                       maxit=6, trace_test_mse=1, checkpoint=mgr_full)
    mgr = CheckpointManager(str(tmp_path / "resume"), every=2)
    eng.ard_fit(3, w_init=w0, mask_seed=5, inv_density=8, tol=0.0,
                maxit=4, trace_test_mse=1, checkpoint=mgr)
    res = eng.ard_fit(3, w_init=w0, mask_seed=5, inv_density=8, tol=0.0,
                      maxit=6, trace_test_mse=1, checkpoint=mgr)
    np.testing.assert_array_equal(res.w, full.w)
    assert res.test_mse == full.test_mse
    assert res.iter == full.iter


def test_largescale_synth_planes_regular(rng):
    """The closed-form large-scale operand has p distinct genes per cell,
    and the blocked planes describe the SAME operand as the row planes
    (small-shape check of benchmarks/largescale)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from benchmarks.largescale import synth_bell_planes, synth_ell_planes

    genes, cells, p, gb = 32, 96, 8, 8
    a_idx, a_val = synth_ell_planes(genes, cells, p, gene_block=gb, xp=np)
    assert a_idx.shape == (cells, p) and a_val.shape == (cells, p)
    for c in range(cells):
        assert len(set(a_idx[c].tolist())) == p    # distinct within a cell
    assert (0 <= a_idx).all() and (a_idx < genes).all()
    assert (a_val > 0).all()

    b_li, b_val, width = synth_bell_planes(genes, cells, p,
                                           gene_block=gb, xp=np)
    n_gb = genes // gb
    # 2-D device layout: row gb*width + w, column c
    assert b_li.shape == (n_gb * width, cells)
    li3 = b_li.reshape(n_gb, width, cells)
    lv3 = b_val.reshape(n_gb, width, cells)
    for c in range(0, cells, 17):
        row = set()
        for g in range(n_gb):
            live = li3[g, :, c] >= 0
            row |= {(g * gb + int(i), float(v)) for i, v in
                    zip(li3[g, :, c][live], lv3[g, :, c][live])}
        ref = {(int(i), float(v)) for i, v in zip(a_idx[c], a_val[c])}
        assert row == ref


def test_largescale_synth_fit_on_mesh(rng):
    """Tiny-shape fit through the same ShardedEllData construction the
    large-scale benchmark uses, on a 1-device mesh."""
    from benchmarks.largescale import build_sharded_ell_synth
    from singlet_tpu.parallel.sharded import make_mesh
    from singlet_tpu.parallel.sharded_ell import (
        ShardedEllEngine,
        shard_ell_data,
    )

    genes, cells, p = 64, 256, 8
    mesh1 = make_mesh(1)
    data = build_sharded_ell_synth(genes, cells, p, mesh=mesh1,
                                   cell_block=256, gene_block=64)
    eng = ShardedEllEngine(None, data=data)
    w0 = rng.random((genes, 3)).astype(np.float32)
    out = eng.fit(3, w_init=w0, tol=0.0, maxit=3)

    # ground truth: the same matrix through the scipy ingest path
    from benchmarks.largescale import synth_ell_planes
    a_idx, a_val = synth_ell_planes(genes, cells, p, gene_block=64, xp=np)
    A = sp.csc_matrix(
        (a_val.ravel(),
         (a_idx.ravel(), np.repeat(np.arange(cells), p))),
        shape=(genes, cells))
    ref = ShardedEllEngine(A, mesh=mesh1).fit(3, w_init=w0, tol=0.0, maxit=3)
    np.testing.assert_allclose(out["w"], ref["w"], rtol=3e-4, atol=3e-5)


def test_chunked_fused_fit_matches_single_program(rng, mesh8):
    """chunk_iters splits the fused loop into several device calls with a
    traced step budget — results must be identical to the one-call fit."""
    from singlet_tpu.parallel.sharded_ell import sharded_ell_nmf_fit

    A = _sparse(rng)
    w0 = rng.random((A.shape[0], 3)).astype(np.float32)
    one = sharded_ell_nmf_fit(A, 3, mesh=mesh8, w_init=w0, tol=0.0, maxit=7)
    chunked = sharded_ell_nmf_fit(A, 3, mesh=mesh8, w_init=w0, tol=0.0,
                                  maxit=7, chunk_iters=3)   # 3 + 3 + 1
    np.testing.assert_allclose(chunked["w"], one["w"], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(chunked["tol_trace"], one["tol_trace"],
                               rtol=1e-6)
    # early convergence inside a chunk stops the fit
    conv = sharded_ell_nmf_fit(A, 3, mesh=mesh8, w_init=w0, tol=0.5,
                               maxit=7, chunk_iters=3)
    assert len(conv["tol_trace"]) < 7


def test_staged_dir_ingest_equals_full_ingest(rng, mesh8, tmp_path):
    """shard_ell_from_staged (per-host reads of only its chunk slices) must
    assemble the identical operand to full-matrix ingest."""
    from singlet_tpu.parallel.sharded_ell import (
        shard_ell_data,
        shard_ell_from_staged,
    )
    from singlet_tpu.sparse.chunked import stage_chunks

    chunks = []
    for s in (1, 2, 3):
        M = sp.random(52, 24 + 8 * s, density=0.25, random_state=s,
                      format="csc", dtype=np.float32)
        M.data = np.abs(M.data) + 0.1
        chunks.append(M)
    A = sp.hstack(chunks).tocsc()
    d = stage_chunks(str(tmp_path / "staged"), chunks)

    full = shard_ell_data(A, mesh8)
    staged = shard_ell_from_staged(d, mesh8)
    for f in ("b_li", "b_val", "nonempty", "gene_nonempty"):
        np.testing.assert_array_equal(np.asarray(getattr(staged, f)),
                                      np.asarray(getattr(full, f)),
                                      err_msg=f)
    assert staged.cells_true == A.shape[1]


def test_bell_pack_roundtrip(rng):
    """bell_widths / bell_width / _pack_bell reconstruct the exact dense
    matrix through _bell_tile (unit test of the gb-major blocked layout)."""
    import jax.numpy as jnp

    from singlet_tpu.parallel.sharded_ell import (
        _bell_tile,
        _pack_bell,
        bell_width,
        bell_widths,
    )

    genes, cells, gene_block = 72, 37, 24   # genes_pad = 72, 3 gene blocks
    A = sp.random(genes, cells, density=0.3, random_state=3,
                  dtype=np.float32, format="csc")
    A.data = np.abs(A.data) + 0.1
    n_gb = genes // gene_block
    widths = bell_widths(A, n_gb, gene_block)
    assert widths.shape == (n_gb,)
    # widths are exact per-block column maxima
    D = A.toarray()
    for gb in range(n_gb):
        blk = D[gb * gene_block:(gb + 1) * gene_block]
        assert widths[gb] == (blk != 0).sum(axis=0).max()

    width = bell_width(widths)
    assert width % 8 == 0 and width >= widths.max()
    cols_pad = 40
    li, lv = _pack_bell(A, cols_pad, gene_block, n_gb, width)
    assert li.shape == (n_gb, cols_pad, width)
    # structural pads carry li == -1 and value 0
    assert (lv[li == -1] == 0).all()

    dense = np.concatenate(
        [np.asarray(_bell_tile(jnp.asarray(li[gb].T), jnp.asarray(lv[gb].T),
                               gene_block))
         for gb in range(n_gb)], axis=1)     # (cols_pad, genes)
    np.testing.assert_allclose(dense[:cells].T, D, rtol=1e-6)
    assert dense[cells:].sum() == 0


def test_bell_pack_empty_and_single_column():
    from singlet_tpu.parallel.sharded_ell import (
        _pack_bell,
        bell_width,
        bell_widths,
    )

    empty = sp.csc_matrix((16, 0), dtype=np.float32)
    w = bell_widths(empty, 2, 8)
    assert (w == 0).all()
    assert bell_width(w) == 8                # min width 8
    li, lv = _pack_bell(empty, 4, 8, 2, bell_width(w))
    assert li.shape == (2, 4, 8)
    assert (li == -1).all() and (lv == 0).all()

    one = sp.csc_matrix(np.array([[0.], [2.5], [0.], [1.0]], np.float32))
    w1 = bell_width(bell_widths(one, 1, 4))
    li1, lv1 = _pack_bell(one, 8, 4, 1, w1)
    assert sorted(li1[0, 0][li1[0, 0] >= 0].tolist()) == [1, 3]
    assert sorted(lv1[0, 0][lv1[0, 0] > 0].tolist()) == [1.0, 2.5]


def test_chunk_list_ingest_equals_full_ingest(rng, mesh8):
    """shard_ell_from_chunks (streaming, no host concatenation) assembles
    the bit-identical operand to shard_ell_data of the hstacked matrix."""
    import scipy.sparse as sp

    from singlet_tpu.parallel.sharded_ell import (shard_ell_data,
                                                  shard_ell_from_chunks)

    genes, cells = 48, 96
    chunks = []
    for i, w in enumerate([40, 25, 31]):
        M = sp.random(genes, w, density=0.2, random_state=10 + i,
                      dtype=np.float32, format="csc")
        M.data = np.abs(M.data) + 0.1
        chunks.append(M)
    full = sp.hstack(chunks).tocsc()

    d1 = shard_ell_from_chunks(chunks, mesh8)
    d2 = shard_ell_data(full, mesh8)
    assert d1.b_width == d2.b_width
    np.testing.assert_array_equal(np.asarray(d1.b_li), np.asarray(d2.b_li))
    np.testing.assert_array_equal(np.asarray(d1.b_val), np.asarray(d2.b_val))
    np.testing.assert_array_equal(np.asarray(d1.nonempty),
                                  np.asarray(d2.nonempty))
    np.testing.assert_array_equal(np.asarray(d1.gene_nonempty),
                                  np.asarray(d2.gene_nonempty))

    # and the driver routes a chunk list through the streaming path
    from singlet_tpu.solvers.drivers import run_nmf

    w0 = rng.random((genes, 3)).astype(np.float32)
    m_chunks = run_nmf(chunks, rank=3, w_init=w0, tol=0.0, maxit=3,
                       mesh=mesh8)
    m_full = run_nmf(full, rank=3, w_init=w0, tol=0.0, maxit=3, mesh=mesh8)
    np.testing.assert_allclose(m_chunks.w, m_full.w, rtol=1e-6)


def test_sharded_linked_matches_dense(rng, mesh8):
    """run_linked_nmf(mesh=) on the sharded ELL engine reproduces the dense
    single-chip linked fit (reference:src/singlet.cpp:1059-1086), and
    unlinked factors decay toward zero for unlinked cells."""
    from singlet_tpu.solvers.linked import run_linked_nmf

    A = _sparse(rng)
    genes, cells = A.shape
    k = 4
    w0 = rng.random((genes, k)).astype(np.float32)
    link_h = np.ones((k, cells), np.float32)
    link_h[0, : cells // 2] = 0.0          # factor 0 unlinked from 1st half
    link_w = np.ones((genes, k), np.float32)
    link_w[: genes // 4, 1] = 0.0          # factor 1 unlinked from 1st genes

    m_dense = run_linked_nmf(np.asarray(A.todense()), w0, link_h=link_h,
                             link_w=link_w, tol=0.0, maxit=5, verbose=False)
    m_mesh = run_linked_nmf(A, w0, link_h=link_h, link_w=link_w, tol=0.0,
                            maxit=5, verbose=False, mesh=mesh8)
    np.testing.assert_allclose(m_mesh.w, m_dense.w, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(m_mesh.d, m_dense.d, rtol=3e-4)
    np.testing.assert_allclose(m_mesh.h, m_dense.h, rtol=3e-4, atol=3e-5)
    # the link zeroed factor-0 embeddings for the first half of the cells
    # (factor order may change after the d sort; find factor by w match)
    assert np.abs(m_mesh.h[:, : cells // 2]).min() == pytest.approx(0.0)


def test_sharded_project_matches_dense(rng, mesh8):
    """project_model(mesh=) == dense projection — ProjectData's scale path
    (reference:src/singlet.cpp:405-413)."""
    from singlet_tpu.solvers.project import project_model

    A = _sparse(rng)
    W = rng.random((A.shape[0], 5)).astype(np.float32)
    h_d, d_d = project_model(np.asarray(A.todense()), W, L1=0.01)
    h_m, d_m = project_model(A, W, L1=0.01, mesh=mesh8)
    np.testing.assert_allclose(h_m, h_d, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(d_m, d_d, rtol=3e-4)
    # sparse single-chip provider path (no mesh, no densify)
    h_s, d_s = project_model(A, W, L1=0.01)
    np.testing.assert_allclose(h_s, h_d, rtol=3e-4, atol=3e-5)


def test_linked_masked_rejected_and_validation(rng, mesh8):
    """Links are a plain-fit feature (the reference's masked ARD takes no
    link matrices); shape validation fails loudly."""
    from singlet_tpu.parallel.sharded_ell import ShardedEllEngine

    A = _sparse(rng)
    eng = ShardedEllEngine(A, mesh=mesh8)
    k = 3
    lh = np.ones((A.shape[1], k), np.float32)
    with pytest.raises(ValueError, match="masked"):
        eng.fit(k, maxit=1, masked=True, link_h=lh)
    with pytest.raises(ValueError, match="link_h"):
        eng.fit(k, maxit=1, link_h=np.ones((5, k), np.float32))
    with pytest.raises(ValueError, match="link_w"):
        eng.fit(k, maxit=1, link_h=lh,
                link_w=np.ones((A.shape[0] + 1, k), np.float32))


def test_engine_project_transposed_w(rng, mesh8):
    """project accepts w as (genes, k) or (k, genes) like the reference's
    transpose check (reference:src/singlet.cpp:406)."""
    from singlet_tpu.parallel.sharded_ell import ShardedEllEngine

    A = _sparse(rng)
    eng = ShardedEllEngine(A, mesh=mesh8)
    W = rng.random((A.shape[0], 4)).astype(np.float32)
    h1, d1 = eng.project(W)
    h2, d2 = eng.project(W.T)
    np.testing.assert_allclose(h1, h2)
    np.testing.assert_allclose(d1, d2)
    with pytest.raises(ValueError, match="common edge"):
        eng.project(rng.random((7, 9)).astype(np.float32))


def test_sharded_gcnmf_matches_dense(rng, mesh8):
    """The sharded-ELL GCNMF route (sparse G planes + all_gather
    convolution) must reproduce the dense single-chip solver
    (``c_gcnmf`` semantics, reference:src/singlet.cpp:1668-1730)."""
    from singlet_tpu.solvers.gcnmf import gcnmf

    A = _sparse(rng)
    n = A.shape[1]
    w0 = rng.random((A.shape[0], 3)).astype(np.float32)
    # sparse row-normalized ring graph over cells
    G = sp.diags([np.ones(n - 1), np.ones(n), np.ones(n - 1)],
                 [-1, 0, 1], format="csc").astype(np.float32) / 3.0
    dense = gcnmf(np.asarray(A.todense()), G, 3, tol=0.0, maxit=5,
                  w_init=w0, seed=0)
    meshed = gcnmf(A, G, 3, tol=0.0, maxit=5, w_init=w0, seed=0,
                   mesh=mesh8)
    np.testing.assert_allclose(meshed.w, dense.w, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(meshed.h, dense.h, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(meshed.d, dense.d, rtol=2e-4)


def test_experiment_run_gcnmf_mesh(rng, mesh8):
    """Experiment.run_gcnmf(mesh=) routes through the sharded engine."""
    from singlet_tpu.experiment import Experiment

    A = _sparse(rng)
    n = A.shape[1]
    G = sp.diags([np.ones(n - 1), np.ones(n), np.ones(n - 1)],
                 [-1, 0, 1], format="csc").astype(np.float32) / 3.0
    exp = Experiment(data=A, gene_names=[f"g{i}" for i in range(A.shape[0])],
                     cell_names=[f"c{i}" for i in range(n)],
                     data_is_normalized=True)
    exp.run_gcnmf(G, k=3, tol=1e-3, maxit=6, mesh=mesh8)
    model = exp.reductions["gcnmf"]
    assert model.k == 3 and model.w.shape[0] == A.shape[0]


def test_sharded_batch_l1_matches_dense(rng, mesh8):
    """The sharded-ELL batch-aware L1 route (on-device penalty matrix)
    must reproduce the dense solver (``c_nmf_batch`` intent,
    reference:src/singlet.cpp:677-710)."""
    from singlet_tpu.solvers.batch import nmf_batch

    A = _sparse(rng)
    n = A.shape[1]
    w0 = rng.random((A.shape[0], 3)).astype(np.float32)
    batch_id = (np.arange(n) % 3).astype(np.int64)
    dense = nmf_batch(np.asarray(A.todense()), 3, batch_id, tol=0.0,
                      maxit=5, w_init=w0)
    meshed = nmf_batch(A, 3, batch_id, tol=0.0, maxit=5, w_init=w0,
                       mesh=mesh8)
    np.testing.assert_allclose(meshed.w, dense.w, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(meshed.h, dense.h, rtol=2e-4, atol=2e-5)
    # the batch penalty must actually bite (differ from the zero-penalty
    # single-batch case) and single-batch must stay finite
    plain = nmf_batch(np.asarray(A.todense()), 3, np.zeros(n, np.int64),
                      tol=0.0, maxit=5, w_init=w0)
    assert np.isfinite(plain.w).all()
    assert not np.allclose(dense.w, plain.w)
