"""Vmapped replica fits: K independent fits in one compiled program."""

import jax
import jax.numpy as jnp
import numpy as np

from gsmvi_tpu import GSM
from gsmvi_tpu.models import dense_gaussian


def test_fit_batch_all_replicas_recover():
    t = dense_gaussian(jax.random.PRNGKey(3), 8)
    gsm = GSM(D=t.d, lp=t.lp, lp_g=t.lp_g)
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    means, covs = gsm.fit_batch(keys, niter=400, batch_size=8)
    assert means.shape == (5, 8) and covs.shape == (5, 8, 8)
    for i in range(5):
        np.testing.assert_allclose(means[i], t.mean, atol=5e-3)


def test_fit_batch_matches_sequential_fit():
    """Replica j of fit_batch equals fit() with the same key (same pure step)."""
    t = dense_gaussian(jax.random.PRNGKey(3), 6)
    gsm = GSM(D=t.d, lp=t.lp, lp_g=t.lp_g)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    means, covs = gsm.fit_batch(keys, niter=30, batch_size=4)
    m_ref, c_ref = gsm.fit(keys[1], niter=30, batch_size=4, verbose=False)
    np.testing.assert_allclose(means[1], m_ref, atol=1e-10)
    np.testing.assert_allclose(covs[1], c_ref, atol=1e-10)


def test_fit_batch_per_replica_warm_start():
    t = dense_gaussian(jax.random.PRNGKey(3), 6)
    gsm = GSM(D=t.d, lp=t.lp, lp_g=t.lp_g)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    means0 = jnp.stack([jnp.zeros(6), jnp.asarray(t.mean)])
    covs0 = jnp.stack([jnp.eye(6), jnp.asarray(t.cov)])
    means, _ = gsm.fit_batch(keys, mean=means0, cov=covs0, niter=50,
                             batch_size=8)
    np.testing.assert_allclose(means[1], t.mean, atol=5e-3)


def test_bam_fit_batch():
    from gsmvi_tpu import BaM, Regularizers

    t = dense_gaussian(jax.random.PRNGKey(3), 6)
    bam = BaM(D=t.d, lp=t.lp, lp_g=t.lp_g)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    means, covs = bam.fit_batch(keys, regf=Regularizers().linear(100.0),
                                niter=150, batch_size=8)
    assert means.shape == (3, 6)
    for i in range(3):
        np.testing.assert_allclose(means[i], t.mean, atol=1e-2)


def test_factor_gsm_fit_batch():
    from gsmvi_tpu import FactorGSM

    t = dense_gaussian(jax.random.PRNGKey(3), 6)
    fg = FactorGSM(D=t.d, lp=t.lp, lp_g=t.lp_g, refresh_every=0)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    means, covs = fg.fit_batch(keys, niter=300, batch_size=8)
    assert covs.shape == (3, 6, 6)
    for i in range(3):
        np.testing.assert_allclose(means[i], t.mean, atol=1e-2)


def test_advi_fit_batch():
    import optax
    from gsmvi_tpu import ADVI

    t = dense_gaussian(jax.random.PRNGKey(3), 4)
    advi = ADVI(D=4, lp=t.lp)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    means, covs, losses = advi.fit_batch(keys, optax.adam(1e-2),
                                         batch_size=16, niter=2000)
    assert means.shape == (3, 4) and covs.shape == (3, 4, 4)
    assert losses.shape == (3, 2001)
    for i in range(3):
        np.testing.assert_allclose(means[i], t.mean, atol=0.3)
        assert losses[i, -100:].mean() < losses[i, :100].mean()


def test_factor_gsm_fit_batch_ns_xla_solver():
    """The batched-replica NS-XLA step (small_solver="auto" at f32):
    converges, and its update math is BIT-IDENTICAL to the fused Pallas
    kernel's interpret-mode trace (same jnp ops, no pallas_call)."""
    from gsmvi_tpu import FactorGSM
    from gsmvi_tpu.ops.pallas.fused_step import (gsm_eps_update_fused,
                                                 gsm_eps_update_ns_xla)

    t = dense_gaussian(jax.random.PRNGKey(3), 16)
    fg = FactorGSM(D=16, lp=t.lp, lp_g=t.lp_g, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    means, covs = fg.fit_batch(keys, niter=400, batch_size=8)  # auto -> ns
    for i in range(3):
        np.testing.assert_allclose(means[i], t.mean, atol=1e-2)
        np.testing.assert_allclose(covs[i], t.cov, atol=5e-2)

    # chol solver still available and converges too
    means_c, _ = fg.fit_batch(keys, niter=400, batch_size=8,
                              small_solver="chol")
    for i in range(3):
        np.testing.assert_allclose(means_c[i], t.mean, atol=1e-2)

    # update-level agreement: NS-XLA == fused kernel (interpret) bitwise
    rng = np.random.default_rng(0)
    b, d = 8, 32
    eps = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    vs = jnp.asarray(rng.normal(size=(b, d)) * 0.2, jnp.float32)
    mu = jnp.asarray(rng.normal(size=(d,)), jnp.float32)
    f = (jnp.eye(d, dtype=jnp.float32)
         + 0.01 * jnp.asarray(rng.normal(size=(d, d)), jnp.float32))
    mk, fk, gk = gsm_eps_update_fused(eps, vs, mu, f, interpret=True)
    mx, fx, gx = gsm_eps_update_ns_xla(eps, vs, mu, f)
    np.testing.assert_array_equal(np.asarray(mk), np.asarray(mx))
    np.testing.assert_array_equal(np.asarray(fk), np.asarray(fx))
    assert bool(gk) == bool(gx)


def test_factor_gsm_fit_batch_ns_xla_vmaps_batched():
    """The NS-XLA step under vmap stays per-replica exact: replica j of the
    batched fit equals a 1-replica batched fit with the same key."""
    from gsmvi_tpu import FactorGSM

    t = dense_gaussian(jax.random.PRNGKey(3), 12)
    fg = FactorGSM(D=12, lp=t.lp, lp_g=t.lp_g, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    means, covs = fg.fit_batch(keys, niter=40, batch_size=4)
    m1, c1 = fg.fit_batch(keys[1:2], niter=40, batch_size=4)
    np.testing.assert_allclose(means[1], m1[0], atol=1e-10)
    np.testing.assert_allclose(covs[1], c1[0], atol=1e-10)


def test_factor_bam_fit_batch():
    from gsmvi_tpu import FactorBaM, Regularizers

    t = dense_gaussian(jax.random.PRNGKey(3), 8)
    bam = FactorBaM(D=t.d, lp=t.lp, lp_g=t.lp_g)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    means, covs = bam.fit_batch(keys, regf=Regularizers().linear(50.0),
                                niter=300, batch_size=8)
    assert means.shape == (3, 8) and covs.shape == (3, 8, 8)
    for i in range(3):
        np.testing.assert_allclose(means[i], t.mean, atol=2e-2)

    # Replica j equals fit() with the same key (same pure step).
    m_ref, c_ref = bam.fit(keys[1], regf=Regularizers().linear(50.0),
                           niter=300, batch_size=8, verbose=False)
    np.testing.assert_allclose(means[1], m_ref, atol=1e-8)
    np.testing.assert_allclose(covs[1], c_ref, atol=1e-8)
