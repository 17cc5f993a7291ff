"""NMFConfig wiring: the typed config is consumed by Experiment, the
drivers, and the CLI (reference defaults: R/RunNMF.R:42-60, R/ard_nmf.R:31-34).
"""

import numpy as np
import pytest
import scipy.sparse as sp

from singlet_tpu import Experiment, NMFConfig, run_nmf


def _toy(rng, genes=60, cells=80, k=4):
    W = rng.uniform(size=(genes, k))
    H = rng.uniform(size=(k, cells))
    return sp.csc_matrix((W @ H) * (rng.uniform(size=(genes, cells)) < 0.3))


def test_defaults_mirror_reference():
    cfg = NMFConfig()
    assert cfg.k is None and cfg.reps == 3
    assert cfg.tol == 1e-5 and cfg.maxit == 100
    assert cfg.L1 == 0.01 and cfg.L2 == 0.0
    assert cfg.test_set_density == 0.05
    assert cfg.learning_rate == 0.8 and cfg.tol_overfit == 1e-4
    assert cfg.trace_test_mse == 5
    assert cfg.k_init == 2 and cfg.k_max == 100 and cfg.k_min == 2
    assert cfg.cv_tol_effective == pytest.approx(1e-4)  # 10 * tol
    assert cfg.inv_density == 20


def test_validation_rules():
    with pytest.raises(ValueError, match="L1"):
        NMFConfig(L1=1.0)
    with pytest.raises(ValueError, match="k_min"):
        NMFConfig(k_min=1)
    assert NMFConfig(test_set_density=0.5).validate_density() is not None
    assert NMFConfig().validate_density() is None


def test_experiment_config_equals_kwargs(rng):
    A = _toy(rng)
    e1 = Experiment(counts=A)
    e1.run_nmf(k=3, tol=1e-3, maxit=10, seed=4, verbose=0)
    e2 = Experiment(counts=A.copy())
    e2.run_nmf(config=NMFConfig(k=3, tol=1e-3, maxit=10, seed=4, verbose=0))
    np.testing.assert_allclose(e1.reductions["nmf"].w,
                               e2.reductions["nmf"].w)
    # per-call overrides win over config fields
    e3 = Experiment(counts=A.copy())
    e3.run_nmf(config=NMFConfig(k=3, tol=1e-3, maxit=10, seed=9, verbose=0),
               seed=4)
    np.testing.assert_allclose(e1.reductions["nmf"].w,
                               e3.reductions["nmf"].w)
    with pytest.raises(TypeError):
        e1.run_nmf(k=3, not_a_field=1)


def test_driver_accepts_config(rng):
    A = _toy(rng)
    m1 = run_nmf(A, 3, tol=1e-3, maxit=8, L1=0.02, seed=2)
    m2 = run_nmf(A, 3, config=NMFConfig(tol=1e-3, maxit=8, L1=0.02, seed=2))
    np.testing.assert_allclose(m1.w, m2.w)
