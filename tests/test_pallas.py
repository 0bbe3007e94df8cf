"""Pallas fused kernels vs jnp reference path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gsmvi_tpu.ops.gsm import gsm_update
from gsmvi_tpu.ops.pallas.gsm_step import gsm_update_fused, pallas_supported


@pytest.mark.parametrize("b,d", [(2, 64), (8, 128), (32, 256), (5, 96)])
def test_fused_gsm_matches_jnp(rng, b, d):
    mu0 = rng.normal(size=d).astype(np.float32)
    l = (0.2 * rng.normal(size=(d, d))).astype(np.float32)
    s0 = (l @ l.T + np.eye(d)).astype(np.float32)
    x = rng.normal(size=(b, d)).astype(np.float32)
    v = rng.normal(size=(b, d)).astype(np.float32)
    mu_ref, s_ref = gsm_update(x, v, mu0, s0)
    mu, s = gsm_update_fused(x, v, mu0, s0, interpret=True)
    scale = float(np.abs(np.asarray(s_ref)).max())
    np.testing.assert_allclose(mu, mu_ref, atol=1e-5)
    np.testing.assert_allclose(s, s_ref, atol=1e-5 * max(scale, 1.0))


def test_fused_output_symmetric(rng):
    b, d = 8, 128
    mu0 = rng.normal(size=d).astype(np.float32)
    s0 = np.eye(d, dtype=np.float32)
    x = rng.normal(size=(b, d)).astype(np.float32)
    v = rng.normal(size=(b, d)).astype(np.float32)
    _, s = gsm_update_fused(x, v, mu0, s0, interpret=True)
    assert float(jnp.max(jnp.abs(s - s.T))) == 0.0


def test_supported_gating():
    assert pallas_supported(32, 256)
    assert not pallas_supported(4096, 4096)  # far beyond VMEM


@pytest.mark.parametrize("target_kind", ["gaussian", "student_t", "mixture",
                                         "logreg"])
def test_fused_whole_step_interpret_matches_jnp(rng, target_kind):
    """The whole-step kernel (external eps, interpret mode) with each
    in-kernel zoo score must match the jnp eps path driven by the same
    score function — sample/score/update/validity all agree on CPU."""
    import jax

    from gsmvi_tpu.models import dense_gaussian
    from gsmvi_tpu.models.mixture import gaussian_mixture
    from gsmvi_tpu.models.regression import logistic_regression
    from gsmvi_tpu.models.student_t import student_t
    from gsmvi_tpu.ops.gsm_eps import apply_eps_step
    from gsmvi_tpu.ops.pallas.fused_step import make_fused_eps_step

    b, d = 8, 16
    t = {"gaussian": lambda: dense_gaussian(jax.random.PRNGKey(1), d),
         "student_t": lambda: student_t(jax.random.PRNGKey(2), d, df=6.0),
         "mixture": lambda: gaussian_mixture(jax.random.PRNGKey(3), d),
         "logreg": lambda: logistic_regression(jax.random.PRNGKey(4), d,
                                               n_data=24)}[target_kind]()
    score_fn, params = t.pallas_score
    params = [jnp.asarray(p, jnp.float32) for p in params]

    mu = jnp.asarray(rng.normal(size=d).astype(np.float32))
    f = jnp.asarray((0.3 * rng.normal(size=(d, d))
                     + np.eye(d)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))

    step = make_fused_eps_step(score_fn, len(params), b, d,
                               external_eps=True, interpret=True)
    m_p, f_p, good_p = step(eps, mu, f, *params)

    x = mu + eps @ f.T
    vs = score_fn(x, *params)
    m_j, f_j, good_j = apply_eps_step(mu, f, eps, vs)

    assert bool(good_p) == bool(good_j)
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_j),
                               rtol=1e-4, atol=1e-4)
    s_p = np.asarray(f_p) @ np.asarray(f_p).T
    s_j = np.asarray(f_j) @ np.asarray(f_j).T
    scale = max(1.0, float(np.abs(s_j).max()))
    np.testing.assert_allclose(s_p, s_j, atol=2e-4 * scale)


def test_fused_update_chol_method_matches_jnp(rng):
    """method="chol" (in-kernel Cholesky sweeps, exact PD check) must match
    the jnp eps path — regression for the stranded-def bug that made this
    path raise NameError."""
    from gsmvi_tpu.ops.gsm_eps import apply_eps_step
    from gsmvi_tpu.ops.pallas.fused_step import gsm_eps_update_fused

    b, d = 8, 32
    f = jnp.asarray((0.3 * rng.normal(size=(d, d))
                     + np.eye(d)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=d).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    v = jnp.asarray((0.3 * rng.normal(size=(b, d))).astype(np.float32))

    m_j, f_j, good_j = apply_eps_step(mu, f, eps, v, jitter=1e-6)
    m_p, f_p, good_p = gsm_eps_update_fused(eps, v, mu, f, jitter=1e-6,
                                            interpret=True, method="chol")
    assert bool(good_p) == bool(good_j)
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_j),
                               rtol=1e-4, atol=1e-4)
    s_p = np.asarray(f_p) @ np.asarray(f_p).T
    s_j = np.asarray(f_j) @ np.asarray(f_j).T
    np.testing.assert_allclose(s_p, s_j, atol=2e-4 * max(1.0, float(np.abs(s_j).max())))


def test_ns_residual_gates_reject_unconverged_sweeps(rng):
    """With absurdly few Newton-Schulz sweeps the phase residuals must trip
    the accuracy gates (good=False) rather than return a silently-wrong
    factor — the safety net behind the tunable FactorGSM(ns_iters=)."""
    from gsmvi_tpu.ops.pallas.fused_step import _eps_smallspace_ns

    b, d = 8, 32
    f = jnp.asarray((0.5 * rng.normal(size=(d, d))
                     + np.eye(d)).astype(np.float32))
    mu = jnp.zeros((1, d), jnp.float32)
    e = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    v = jnp.asarray((0.5 * rng.normal(size=(b, d))).astype(np.float32))
    vf = v @ f

    _, _, good_default = _eps_smallspace_ns(e, v, vf, mu, f, batch=b)
    assert bool(good_default)
    _, _, good_tiny = _eps_smallspace_ns(e, v, vf, mu, f, batch=b,
                                         iters=(1, 1, 1, 1, 1))
    assert not bool(good_tiny)
