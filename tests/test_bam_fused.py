"""Fused BaM kernels (ops/pallas/bam_fused.py) vs the XLA SVD path and an
f64 closed-form oracle — interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsmvi_tpu.ops.bam_eps import bam_eps_update
from gsmvi_tpu.ops.pallas.bam_fused import (
    BAM_NS_ITERS_DEFAULT, BAM_NS_TIERS, LMAX_GATE_DEFAULT,
    _bam_smallspace_ns, bam_eps_update_fused, bam_fused_supported,
    make_fused_bam_multistep, ns_tier_thresholds, predicted_gu_coeff)


def _benign_inputs(rng, b, d, score_scale=1.0):
    e = rng.normal(size=(b, d)).astype(np.float32)
    f = (np.eye(d) + 0.05 * rng.normal(size=(d, d))).astype(np.float32)
    mu = rng.normal(size=d).astype(np.float32)
    x = mu + e @ f.T
    v = (score_scale * -(x - rng.normal(size=d))).astype(np.float32)
    return (jnp.asarray(e), jnp.asarray(v), jnp.asarray(mu), jnp.asarray(f))


@pytest.mark.parametrize("reg", [0.3, 1.0, 3.0])
@pytest.mark.parametrize("b,d", [(8, 32), (32, 96)])
def test_ns_core_matches_svd_path(rng, reg, b, d):
    """In the gated (non-stiff) regime the matmul-only psi(G) chain must
    reproduce the thin-SVD update (ops/bam_eps.py) to f32 working accuracy —
    both compute the SAME factor F W1 (I + Ytil w Ytil^T)."""
    e, v, mu, f = _benign_inputs(rng, b, d)
    m_ref, f_ref, good_ref = bam_eps_update(e, v, mu, f, reg, solver="svd")
    m_ns, f_ns, good, stiff, *_ = _bam_smallspace_ns(
        e, v, mu.reshape(1, d), f, reg, batch=b)
    assert not bool(stiff)
    assert bool(good) and bool(good_ref)
    s_ref = np.asarray(f_ref @ f_ref.T)
    s_ns = np.asarray(f_ns @ f_ns.T)
    scale = max(1.0, float(np.abs(s_ref).max()))
    np.testing.assert_allclose(s_ns, s_ref, atol=3e-5 * scale)
    np.testing.assert_allclose(np.asarray(m_ns[0]), np.asarray(m_ref),
                               atol=3e-5 * max(1.0, float(np.abs(
                                   np.asarray(m_ref)).max())))


def test_psi_chain_matches_f64_closed_form(rng):
    """The NS evaluation of psi(G) = -4 (I+s)^{-2} (I+sqrt(2)(I+s)^{-1/2})^{-1}
    must match the eigendecomposition of psi(l) = (sqrt(sigma(l)) - 1)/l in
    f64 (sigma(l) = 2/(1+sqrt(1+4l)))."""
    from gsmvi_tpu.ops.pallas.bam_fused import _ns_sqrt_both
    from gsmvi_tpu.ops.pallas.fused_step import _newton_inv, _ns_sqrt

    k = 24
    a = rng.normal(size=(k, k))
    g64 = a @ a.T * 3.0  # lmax ~ O(100): comfortably inside the gate
    w, q = np.linalg.eigh(g64)
    w = np.maximum(w, 0.0)
    sig = 2.0 / (1.0 + np.sqrt(1.0 + 4.0 * w))
    psi = np.where(w > 1e-12, (np.sqrt(sig) - 1.0) / np.maximum(w, 1e-12),
                   -0.5)
    psi64 = (q * psi) @ q.T

    g = jnp.asarray(g64, jnp.float32)
    eye = jnp.eye(k, dtype=jnp.float32)
    s1 = _ns_sqrt(eye + 4.0 * g, BAM_NS_ITERS_DEFAULT[2])
    _, p = _ns_sqrt_both(eye + s1, BAM_NS_ITERS_DEFAULT[3])
    winv = _newton_inv(eye + jnp.sqrt(2.0) * p, BAM_NS_ITERS_DEFAULT[4])
    p2 = p @ p
    tau = -4.0 * (p2 @ p2 @ winv)
    np.testing.assert_allclose(np.asarray(tau), psi64, atol=2e-5)


def test_stiff_gate_trips_on_large_gram(rng):
    """Scores large enough that lmax(G) exceeds the gate must flag stiff
    (the f32 Gram no longer resolves O(1) eigenvalues there — accepting
    would bias the fit exactly like the eigh solver's mean stall)."""
    b, d = 32, 64
    e, v, mu, f = _benign_inputs(rng, b, d, score_scale=300.0)
    _, _, _, stiff, *_ = _bam_smallspace_ns(e, v, mu.reshape(1, d), f, 20.0,
                                        batch=b)
    assert bool(stiff)
    # And the same inputs with an infinite gate confirm the statistic is
    # what trips it (not a residual failure).
    _, _, good, stiff_inf, *_ = _bam_smallspace_ns(
        e, v, mu.reshape(1, d), f, 20.0, batch=b, lmax_gate=float("inf"))
    assert not bool(stiff_inf)


def test_fused_update_kernel_interpret_matches_core(rng):
    b, d = 8, 32
    e, v, mu, f = _benign_inputs(rng, b, d)
    reg = 1.5
    m_k, f_k, good_k, stiff_k, *_ = bam_eps_update_fused(e, v, mu, f, reg,
                                                     interpret=True)
    m_c, f_c, good_c, stiff_c, *_ = _bam_smallspace_ns(
        e, v, mu.reshape(1, d), f, reg, batch=b)
    assert bool(good_k) == bool(good_c)
    assert bool(stiff_k) == bool(stiff_c)
    np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_c[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_c),
                               rtol=1e-5, atol=1e-5)


def test_fused_update_selects_old_state_when_stiff(rng):
    b, d = 32, 64
    e, v, mu, f = _benign_inputs(rng, b, d, score_scale=300.0)
    m_k, f_k, good_k, stiff_k, *_ = bam_eps_update_fused(e, v, mu, f, 20.0,
                                                     interpret=True)
    assert bool(stiff_k)
    np.testing.assert_array_equal(np.asarray(m_k), np.asarray(mu))
    np.testing.assert_array_equal(np.asarray(f_k), np.asarray(f))


def test_multistep_kernel_matches_sequential_core(rng):
    """One multistep invocation (interpret) == spc sequential core steps on
    the same eps block and reg schedule."""
    from gsmvi_tpu.models import dense_gaussian

    b, d, spc = 8, 16, 4
    t = dense_gaussian(jax.random.PRNGKey(1), d)
    score_fn, params = t.pallas_score
    params = [jnp.asarray(p, jnp.float32) for p in params]

    mu = jnp.zeros(d, jnp.float32)
    f = jnp.eye(d, dtype=jnp.float32)
    eps_block = jnp.asarray(rng.normal(size=(spc, b, d)).astype(np.float32))
    regs = jnp.asarray([2.0, 1.0, 0.7, 0.5], jnp.float32)

    multi = make_fused_bam_multistep(score_fn, len(params), b, d, spc,
                                     interpret=True)
    m_k, f_k, n_done, n_acc, stopped, *_ = multi(regs, spc, 0, eps_block, mu, f,
                                             *params)
    assert int(n_done) == spc
    assert int(stopped) == 0

    m_c, f_c = mu.reshape(1, d), f
    acc = 0
    for j in range(spc):
        x = m_c + eps_block[j] @ f_c.T
        v = score_fn(x, *params)
        m_n, f_n, good, stiff, *_ = _bam_smallspace_ns(
            eps_block[j], v, m_c, f_c, regs[j], batch=b)
        keep = bool(good) and not bool(stiff)
        if keep:
            m_c, f_c = m_n, f_n
            acc += 1
    assert int(n_acc) == acc
    np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_c[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_c),
                               rtol=1e-4, atol=1e-4)


def test_multistep_kernel_stops_on_stiff_substep(rng):
    """A stiff sub-step must freeze the kernel: earlier sub-steps applied,
    the stiff one UNCONSUMED, stopped-kind == 1."""
    from gsmvi_tpu.models import dense_gaussian

    b, d, spc = 8, 16, 4
    t = dense_gaussian(jax.random.PRNGKey(1), d)
    score_fn, params = t.pallas_score
    params = [jnp.asarray(p, jnp.float32) for p in params]
    mu = jnp.zeros(d, jnp.float32)
    f = jnp.eye(d, dtype=jnp.float32)
    eps_block = jnp.asarray(rng.normal(size=(spc, b, d)).astype(np.float32))
    # Huge reg at sub-step 2 makes its Gram blow past the gate.
    regs = jnp.asarray([0.5, 0.5, 1e9, 0.5], jnp.float32)

    multi = make_fused_bam_multistep(score_fn, len(params), b, d, spc,
                                     interpret=True)
    m_k, f_k, n_done, n_acc, stopped, *_ = multi(regs, spc, 0, eps_block, mu, f,
                                             *params)
    assert int(n_done) == 2
    assert int(stopped) == 1

    # State equals exactly two sequential core steps.
    m_c, f_c = mu.reshape(1, d), f
    for j in range(2):
        x = m_c + eps_block[j] @ f_c.T
        v = score_fn(x, *params)
        m_n, f_n, good, stiff, *_ = _bam_smallspace_ns(
            eps_block[j], v, m_c, f_c, regs[j], batch=b)
        if bool(good) and not bool(stiff):
            m_c, f_c = m_n, f_n
    np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_c[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(f_k), np.asarray(f_c),
                               rtol=1e-4, atol=1e-4)


def test_multistep_nmax_limits_consumed_steps(rng):
    from gsmvi_tpu.models import dense_gaussian

    b, d, spc = 8, 16, 4
    t = dense_gaussian(jax.random.PRNGKey(1), d)
    score_fn, params = t.pallas_score
    params = [jnp.asarray(p, jnp.float32) for p in params]
    eps_block = jnp.asarray(rng.normal(size=(spc, b, d)).astype(np.float32))
    regs = jnp.full((spc,), 0.5, jnp.float32)
    multi = make_fused_bam_multistep(score_fn, len(params), b, d, spc,
                                     interpret=True)
    _, _, n_done, _, stopped, *_ = multi(regs, 3, 0, eps_block,
                                     jnp.zeros(d, jnp.float32),
                                     jnp.eye(d, dtype=jnp.float32), *params)
    assert int(n_done) == 3
    assert int(stopped) == 0


def _fused_factorbam(t, d, monkeypatch, **kw):
    import gsmvi_tpu.bam_factor as bf_mod
    from gsmvi_tpu import FactorBaM

    monkeypatch.setattr(bf_mod, "on_tpu", lambda: True)
    g = FactorBaM(D=d, lp=t.lp, lp_g=t.lp_g, dtype=jnp.float32,
                  pallas_score=t.pallas_score, **kw)
    g._interpret = True
    return g


def test_factorbam_fused_runner_end_to_end(rng, monkeypatch):
    """FactorBaM on the fused multistep path (interpret) recovers a benign
    target's moments and advances exactly niter+1 steps."""
    from gsmvi_tpu import Regularizers
    from gsmvi_tpu.models import dense_gaussian

    d = 8
    t = dense_gaussian(jax.random.PRNGKey(7), d, scale=0.3)
    g = _fused_factorbam(t, d, monkeypatch, steps_per_call=4)
    assert g._pallas_mode(8) == "step"
    state = g.fit(jax.random.PRNGKey(0), regf=Regularizers().linear(20.0),
                  niter=400, batch_size=8, verbose=False, retries=0,
                  return_state=True)
    assert int(state.step) == 401
    assert int(state.n_accepted) + int(state.n_rejected) == 401
    mean = np.asarray(state.mean)
    cov = np.asarray(t.cov)
    np.testing.assert_allclose(mean, np.asarray(t.mean),
                               atol=0.15 * max(1.0, np.abs(cov).max()))
    got = np.asarray(state.factor @ state.factor.T)
    np.testing.assert_allclose(got, cov, atol=0.25 * max(1.0, np.abs(
        cov).max()))


def test_factorbam_fused_matches_xla_on_stiff_target(rng, monkeypatch):
    """On a stiffer target (early steps trip the gate) the fused+replay
    path must land at the same converged moments as the pure XLA SVD path —
    the hybrid may not cost accuracy."""
    from gsmvi_tpu import FactorBaM, Regularizers
    from gsmvi_tpu.models import dense_gaussian

    d = 8
    t = dense_gaussian(jax.random.PRNGKey(3), d)  # scale=1: stiff early
    niter, bsz = 600, 8

    g = _fused_factorbam(t, d, monkeypatch, steps_per_call=4, lmax_gate=300.0)
    mean_f, cov_f = g.fit(jax.random.PRNGKey(0),
                          regf=Regularizers().linear(20.0), niter=niter,
                          batch_size=bsz, verbose=False, retries=2)

    x = FactorBaM(D=d, lp=t.lp, lp_g=t.lp_g, dtype=jnp.float32,
                  use_pallas=False)
    mean_x, cov_x = x.fit(jax.random.PRNGKey(0),
                          regf=Regularizers().linear(20.0), niter=niter,
                          batch_size=bsz, verbose=False, retries=2)

    scale = max(1.0, float(np.abs(np.asarray(t.cov)).max()))
    # Different RNG streams -> compare against the target, not each other.
    for m, c in ((mean_f, cov_f), (mean_x, cov_x)):
        np.testing.assert_allclose(np.asarray(m), np.asarray(t.mean),
                                   atol=0.2 * scale)
        np.testing.assert_allclose(np.asarray(c), np.asarray(t.cov),
                                   atol=0.35 * scale)


def test_factorbam_update_mode_without_pallas_score(rng, monkeypatch):
    """Without pallas_score the auto mode is "update" (fused update kernel,
    XLA sampling/score) and still fits."""
    from gsmvi_tpu import Regularizers
    from gsmvi_tpu.models import dense_gaussian

    d = 8
    t = dense_gaussian(jax.random.PRNGKey(7), d, scale=0.3)
    g = _fused_factorbam(t, d, monkeypatch)
    g.pallas_score = None
    assert g._pallas_mode(8) == "update"
    mean, cov = g.fit(jax.random.PRNGKey(0),
                      regf=Regularizers().linear(20.0), niter=300,
                      batch_size=8, verbose=False, retries=0)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(t.mean),
                               atol=0.2)


def test_bam_fused_supported_gate():
    assert bam_fused_supported(32, 256, steps_per_call=8)
    assert not bam_fused_supported(5, 256)        # sublane alignment
    assert not bam_fused_supported(32, 4096)      # beyond VMEM
    # Param bytes are budgeted at their real sizes.
    assert not bam_fused_supported(32, 1024, steps_per_call=8,
                                   param_shapes=[(100000, 1024)])


def test_factorbam_fused_runner_with_monitor(rng, monkeypatch):
    """The fused while_loop chunk runner must honor monitor cadence (chunk
    boundaries) and still advance exactly niter+1 steps."""
    from gsmvi_tpu import Regularizers
    from gsmvi_tpu.models import dense_gaussian
    from gsmvi_tpu.utils.monitors import KLMonitor

    d = 8
    t = dense_gaussian(jax.random.PRNGKey(7), d, scale=0.3)
    g = _fused_factorbam(t, d, monkeypatch, steps_per_call=4)
    mon = KLMonitor(batch_size_kl=8, checkpoint=50)
    state = g.fit(jax.random.PRNGKey(0), regf=Regularizers().linear(20.0),
                  niter=200, batch_size=8, verbose=False, retries=0,
                  monitor=mon, return_state=True)
    assert int(state.step) == 201
    assert len(mon.rkl) == 200 // 50 + 2  # in-loop checkpoints + final call
    assert np.isfinite(np.asarray(mon.rkl)).all()


def test_gu_gate_flags_extreme_reg_even_with_benign_y(rng):
    """The cu chain's conditioning is reg-scaled and independent of Y: at
    reg ~ 1e4 with TINY scores (benign Y) the map goes silently biased with
    residual gates still green — the gu-norm gate must flag stiff there."""
    b, d = 32, 128
    e = rng.normal(size=(b, d)).astype(np.float32)
    f = (np.eye(d) + 0.02 * rng.normal(size=(d, d))).astype(np.float32)
    mu = rng.normal(size=d).astype(np.float32)
    v = (0.02 * rng.normal(size=(b, d))).astype(np.float32)
    _, _, good, stiff, *_ = _bam_smallspace_ns(
        jnp.asarray(e), jnp.asarray(v), jnp.asarray(mu).reshape(1, d),
        jnp.asarray(f), 1e4, batch=b, lmax_gate=float("inf"))
    assert bool(stiff)
    # And comfortably below the gate (reg ~ 100, gu ~ 2.6e3) it stays off.
    _, _, good, stiff, *_ = _bam_smallspace_ns(
        jnp.asarray(e), jnp.asarray(v), jnp.asarray(mu).reshape(1, d),
        jnp.asarray(f), 100.0, batch=b, lmax_gate=float("inf"))
    assert not bool(stiff)
    assert bool(good)


def test_fuzz_grid_ns_map_vs_svd(rng):
    """Randomized (reg, score-scale, factor-conditioning) grid: every
    non-stiff step's NS map must track the SVD path to <= 1e-3 relative;
    stiff steps are excluded (they replay).  Statistical safety net behind
    the two gates + sweep-count choices."""
    b, d = 16, 48
    checked = 0
    for reg in (0.2, 2.0, 20.0, 200.0):
        for sscale in (0.05, 0.5, 5.0):
            for fcond in (0.02, 0.3):
                e = rng.normal(size=(b, d)).astype(np.float32)
                f = (np.eye(d)
                     + fcond * rng.normal(size=(d, d))).astype(np.float32)
                mu = rng.normal(size=d).astype(np.float32)
                x = mu + e @ f.T
                v = (-sscale * x).astype(np.float32)
                args = (jnp.asarray(e), jnp.asarray(v), jnp.asarray(mu),
                        jnp.asarray(f))
                m_ns, f_ns, good, stiff, *_ = _bam_smallspace_ns(
                    args[0], args[1], args[2].reshape(1, d), args[3], reg,
                    batch=b)
                if bool(stiff) or not bool(good):
                    continue
                m_x, f_x, _ = bam_eps_update(*args, reg, solver="svd")
                s_x = np.asarray(f_x @ f_x.T)
                s_n = np.asarray(f_ns @ f_ns.T)
                sc = max(1.0, float(np.abs(s_x).max()))
                assert np.abs(s_n - s_x).max() / sc < 1e-3, (reg, sscale,
                                                             fcond)
                msc = max(1.0, float(np.abs(np.asarray(m_x)).max()))
                assert np.abs(np.asarray(m_ns[0])
                              - np.asarray(m_x)).max() / msc < 1e-3
                checked += 1
    assert checked >= 10  # the gates must not eat the whole grid


@pytest.mark.parametrize("tier", [1, 2, 3])
def test_ns_ladder_tier_accuracy_inside_envelope(rng, tier):
    """Every benign ladder tier must track the SVD path to <= 1e-3 inside
    its OWN gate envelope, with (reg, score scale, factor conditioning)
    varied independently — the gates, not the tier prediction, are the
    accuracy authority.  (Slimmed from the 2026-08-18 offline study:
    worst in-envelope errors 2.8e-4 / 2.5e-4 / 1.4e-4 for tiers 1/2/3.)"""
    iters, gu_gate, lmax_gate = BAM_NS_TIERS[tier]
    b, d = 16, 48
    checked = 0
    for reg in (0.005, 0.02, 0.1, 0.5, 2.0, 8.0):
        for ss in (0.02, 0.05, 0.5, 3.0):
            e = rng.normal(size=(b, d)).astype(np.float32)
            f = (np.eye(d)
                 + 0.3 * rng.normal(size=(d, d)) / np.sqrt(d)
                 ).astype(np.float32)
            mu = rng.normal(size=d).astype(np.float32)
            x = mu + e @ f.T
            v = (-ss * x + 0.3 * ss * rng.normal(size=(b, d))
                 ).astype(np.float32)
            args = (jnp.asarray(e), jnp.asarray(v), jnp.asarray(mu),
                    jnp.asarray(f))
            m_n, f_n, good, stiff, *_ = _bam_smallspace_ns(
                args[0], args[1], args[2].reshape(1, d), args[3], reg,
                batch=b, iters=iters, lmax_gate=lmax_gate, gu_gate=gu_gate)
            if bool(stiff) or not bool(good):
                continue
            m_x, f_x, _ = bam_eps_update(*args, reg, solver="svd")
            s_x = np.asarray(f_x @ f_x.T)
            s_n = np.asarray(f_n @ f_n.T)
            sc = max(1.0, float(np.abs(s_x).max()))
            msc = max(1.0, float(np.abs(np.asarray(m_x)).max()))
            assert np.abs(s_n - s_x).max() / sc < 1e-3, (reg, ss)
            assert np.abs(np.asarray(m_n[0])
                          - np.asarray(m_x)).max() / msc < 1e-3, (reg, ss)
            checked += 1
    assert checked >= 5


def test_ns_tier_thresholds_descend_and_scale():
    """Thresholds must be descending (tier_of = count of thresholds above
    reg indexes the tier list) and shrink with D/B stiffness growth."""
    th = ns_tier_thresholds(32, 256)
    assert len(th) == len(BAM_NS_TIERS) - 1
    assert all(a > b for a, b in zip(th, th[1:]))
    assert all(t > 0 for t in th)
    # Larger D at same B -> larger predicted gu per unit reg -> lower
    # thresholds (tiers engage later in the schedule).
    th_big = ns_tier_thresholds(32, 1024)
    assert all(a > b for a, b in zip(th, th_big))
    # The coefficient itself matches the measured ~26 at (32, 256) to ~20%.
    assert 20.0 < predicted_gu_coeff(32, 256) < 32.0


def test_feedback_ladder_engages_at_every_d():
    """The measured-feedback ladder replaces the round-3 D<=256 cutoff:
    tier selection now runs on the kernels' exported gate statistics, which
    are correct at every D (the reg-only predictor they replace was blind
    to the D/target scaling of lmax and thrashed at D >= 512)."""
    from gsmvi_tpu import FactorBaM
    from gsmvi_tpu.models import dense_gaussian

    t = dense_gaussian(jax.random.PRNGKey(0), 4)  # lp unused here
    for d in (64, 256, 512, 1024):
        g = FactorBaM(D=d, lp=t.lp, lp_g=t.lp_g)
        assert len(g._ns_tiers()) == len(BAM_NS_TIERS), d
        assert len(FactorBaM(D=d, lp=t.lp, lp_g=t.lp_g,
                             ns_profile="long")._ns_tiers()) == 1
    # Tightening the configured gates prunes benign tiers whose gates sit
    # above them (the ladder can only ever be stricter than configured).
    g = FactorBaM(D=64, lp=t.lp, lp_g=t.lp_g, gu_gate=20.0, lmax_gate=500.0)
    assert all(gg <= 20.0 and lm <= 500.0
               for (_, gg, lm) in g._ns_tiers()[1:])


def test_ns_tier_from_stats_selection():
    """Most benign tier whose gates pass the measured stats with margin;
    inf (cold start / post-stiff) selects the long profile."""
    from gsmvi_tpu.ops.pallas.bam_fused import (FEEDBACK_MARGIN,
                                                ns_tier_from_stats)

    # BAM_NS_TIERS gates: gu (5e4, 64, 14, 3), lmax (1e4, 1500, 120, 12).
    assert int(ns_tier_from_stats(jnp.inf, jnp.inf)) == 0
    assert int(ns_tier_from_stats(1e3, 1e3)) == 0
    assert int(ns_tier_from_stats(40.0, 900.0)) == 1
    # gu would pass tier 2 but lmax only tier 1 -> the stiffer wins.
    assert int(ns_tier_from_stats(5.0, 900.0)) == 1
    assert int(ns_tier_from_stats(5.0, 50.0)) == 2
    assert int(ns_tier_from_stats(1.0, 5.0)) == 3
    # The margin is applied to the gates: just under a gate still fails.
    assert int(ns_tier_from_stats(13.9, 119.0)) == 1
    assert FEEDBACK_MARGIN < 1.0


def test_multistep_kernel_exports_last_attempt_stats(rng):
    """The multistep kernel's ns_stats output equals the core map's
    measured (gu_ub, lmax_ub) of the last attempted sub-step, and the
    single-step kernel's equals the core's directly."""
    from gsmvi_tpu.models import dense_gaussian

    b, d, spc = 8, 16, 3
    t = dense_gaussian(jax.random.PRNGKey(1), d)
    score_fn, params = t.pallas_score
    params = [jnp.asarray(p, jnp.float32) for p in params]
    mu = jnp.zeros(d, jnp.float32)
    f = jnp.eye(d, dtype=jnp.float32)
    eps_block = jnp.asarray(rng.normal(size=(spc, b, d)).astype(np.float32))
    regs = jnp.asarray([1.0, 0.7, 0.5], jnp.float32)
    multi = make_fused_bam_multistep(score_fn, len(params), b, d, spc,
                                     interpret=True)
    m_k, f_k, n_done, n_acc, stopped, ns = multi(
        regs, spc, 0, eps_block, mu, f, *params)
    assert int(n_done) == spc and int(stopped) == 0
    # Sequential core replay: stats of the LAST sub-step.
    mu_c, f_c = mu.reshape(1, d), f
    for j in range(spc):
        x = mu_c + eps_block[j] @ f_c.T
        vj = score_fn(x, *params)
        m_n, f_n, good, stiff, gu_ub, lmax_ub = _bam_smallspace_ns(
            eps_block[j], vj, mu_c, f_c, regs[j], batch=b)
        if bool(good) and not bool(stiff):
            mu_c, f_c = m_n, f_n
    np.testing.assert_allclose(np.asarray(ns),
                               np.asarray([gu_ub, lmax_ub]),
                               rtol=1e-4, atol=1e-6)
    # Single-step kernel export agrees with the core map too.
    e0 = eps_block[0]
    v0 = score_fn(mu.reshape(1, d) + e0 @ jnp.eye(d), *params)
    _, _, _, _, ns1 = bam_eps_update_fused(e0, v0, mu, jnp.eye(d),
                                           1.0, interpret=True)
    _, _, _, _, gu1, lm1 = _bam_smallspace_ns(
        e0, v0, mu.reshape(1, d), jnp.eye(d), 1.0, batch=b)
    np.testing.assert_allclose(np.asarray(ns1), np.asarray([gu1, lm1]),
                               rtol=1e-4, atol=1e-6)


def test_ladder_and_long_profiles_reach_same_moments(rng, monkeypatch):
    """ns_profile="auto" (ladder) and "long" must converge to the same
    moments on the same key — tier switching changes per-step numerics by
    <= the certified map error, never the fit."""
    from gsmvi_tpu import Regularizers
    from gsmvi_tpu.models import dense_gaussian

    d = 8
    t = dense_gaussian(jax.random.PRNGKey(7), d, scale=0.3)
    outs = {}
    for profile in ("auto", "long"):
        g = _fused_factorbam(t, d, monkeypatch, steps_per_call=4,
                             ns_profile=profile)
        st = g.fit(jax.random.PRNGKey(0), regf=Regularizers().linear(20.0),
                   niter=400, batch_size=8, verbose=False, retries=0,
                   return_state=True)
        assert int(st.step) == 401
        outs[profile] = (np.asarray(st.mean),
                         np.asarray(st.factor @ st.factor.T))
    np.testing.assert_allclose(outs["auto"][0], outs["long"][0], atol=5e-3)
    np.testing.assert_allclose(outs["auto"][1], outs["long"][1], atol=1e-2)


def test_fused_trajectory_invariant_to_spc_and_monitor_cadence(rng,
                                                               monkeypatch):
    """eps is drawn per ABSOLUTE step (fold_in(key, step)), so the fused
    trajectory must be bit-stable under steps_per_call and chunk-cadence
    (monitor checkpoint) changes.  niter=200 crosses the feedback-ladder
    cadence (FEEDBACK_CADENCE=64) three times, so the boundary-adoption /
    block-truncation mechanics are exercised, not just the pre-ladder
    single-tier path."""
    from gsmvi_tpu import Regularizers
    from gsmvi_tpu.models import dense_gaussian
    from gsmvi_tpu.ops.pallas.bam_fused import FEEDBACK_CADENCE
    from gsmvi_tpu.utils.monitors import KLMonitor

    d = 8
    t = dense_gaussian(jax.random.PRNGKey(7), d, scale=0.3)
    regf = Regularizers().linear(20.0)
    niter = 200
    assert niter >= 3 * FEEDBACK_CADENCE  # must cross cadence boundaries

    def run(spc, monitor=None):
        g = _fused_factorbam(t, d, monkeypatch, steps_per_call=spc)
        return g.fit(jax.random.PRNGKey(0), regf=regf, niter=niter,
                     batch_size=8, verbose=False, retries=0,
                     monitor=monitor, return_state=True)

    s2 = run(2)
    s4 = run(4)
    s5 = run(5)  # spc not dividing the cadence: blocks must truncate
    s4m = run(4, monitor=KLMonitor(batch_size_kl=8, checkpoint=17))
    np.testing.assert_array_equal(np.asarray(s2.mean), np.asarray(s4.mean))
    np.testing.assert_array_equal(np.asarray(s2.factor),
                                  np.asarray(s4.factor))
    np.testing.assert_array_equal(np.asarray(s2.ns_stats),
                                  np.asarray(s4.ns_stats))
    np.testing.assert_array_equal(np.asarray(s2.mean), np.asarray(s5.mean))
    np.testing.assert_array_equal(np.asarray(s2.factor),
                                  np.asarray(s5.factor))
    np.testing.assert_array_equal(np.asarray(s4.mean), np.asarray(s4m.mean))
    assert int(s2.n_accepted) == int(s4.n_accepted) == int(s5.n_accepted)


def test_fused_trajectory_invariance_with_stiff_adoption(rng, monkeypatch):
    """The stiff-adoption carry path (a gate trip adopts the stopping step's
    stats immediately, mid-window) must also be grouping-invariant: force
    trips with a tight lmax_gate and compare spc groupings bit-for-bit."""
    from gsmvi_tpu import Regularizers
    from gsmvi_tpu.models import dense_gaussian

    d = 8
    t = dense_gaussian(jax.random.PRNGKey(7), d, scale=1.0)
    regf = Regularizers().linear(20.0)

    def run(spc):
        g = _fused_factorbam(t, d, monkeypatch, steps_per_call=spc,
                             lmax_gate=300.0)
        return g.fit(jax.random.PRNGKey(0), regf=regf, niter=170,
                     batch_size=8, verbose=False, retries=0,
                     return_state=True)

    s2 = run(2)
    s5 = run(5)
    # The tight gate must actually trip (otherwise this test is vacuous):
    # a tripped step replays through the XLA SVD path, whose low bits differ
    # from the NS chain's, so the trajectory must DIFFER from a default-gate
    # run of the same config.
    g_ref = _fused_factorbam(t, d, monkeypatch, steps_per_call=2)
    s_ref = g_ref.fit(jax.random.PRNGKey(0), regf=regf, niter=170,
                      batch_size=8, verbose=False, retries=0,
                      return_state=True)
    assert not np.array_equal(np.asarray(s2.factor), np.asarray(s_ref.factor))
    np.testing.assert_array_equal(np.asarray(s2.mean), np.asarray(s5.mean))
    np.testing.assert_array_equal(np.asarray(s2.factor),
                                  np.asarray(s5.factor))
    np.testing.assert_array_equal(np.asarray(s2.ns_stats),
                                  np.asarray(s5.ns_stats))
    assert int(s2.n_accepted) == int(s5.n_accepted)


def test_restructured_core_matches_materialized_fw1(rng):
    """Round-5 restructure invariants, pinned against the direct algebra:
    the never-materialized Fw1's Frobenius screen (assembled from small
    Grams) and the fat-apply F' must match explicitly materialized
    Fw1 = F + (F Om)(cu Om^T) and F' = Fw1 + (Fw1 Y) tau Y^T."""
    import jax.numpy as jnp

    from gsmvi_tpu.ops.pallas.bam_fused import _bam_smallspace_ns

    b, d = 8, 24
    e = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    v = jnp.asarray(-0.4 * rng.normal(size=(b, d)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(1, d)), jnp.float32)
    f = (jnp.eye(d, dtype=jnp.float32)
         + 0.05 * jnp.asarray(rng.normal(size=(d, d)), jnp.float32))
    reg = jnp.float32(20.0)
    with jax.default_matmul_precision("float32"):
        ef = e @ f.T
        mu_n, f_n, good, stiff, gu_ub, lmax_ub = _bam_smallspace_ns(
            e, v, mu, f, reg, batch=b, ef_t=ef)
        mu_n2, f_n2, good2, stiff2, gu2, lm2 = _bam_smallspace_ns(
            e, v, mu, f, reg, batch=b, ef_t=None)
    # ef_t passed vs recomputed: identical math, f32-rounding-close.
    np.testing.assert_allclose(np.asarray(f_n), np.asarray(f_n2),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mu_n), np.asarray(mu_n2),
                               rtol=0, atol=2e-5)
    assert bool(good) == bool(good2) and bool(stiff) == bool(stiff2)
    # Against the pre-restructure direct algebra (f64 oracle):
    import numpy as onp

    e64, v64, f64 = (onp.asarray(x, onp.float64) for x in (e, v, f))
    r = float(reg)
    r1 = r / (1 + r)
    ebar = e64.mean(0, keepdims=True)
    gbar = v64.mean(0, keepdims=True)
    sru = onp.sqrt(r / b)
    kpad = b + 8
    pad = onp.zeros((kpad - b - 1, d))
    om_t = onp.concatenate([sru * (e64 - ebar), -onp.sqrt(r1) * ebar, pad], 0)
    fu_t = onp.concatenate([sru * (v64 - gbar), onp.sqrt(r1) * gbar, pad], 0)
    eye = onp.eye(kpad)
    gu = om_t @ om_t.T
    wu, qu = onp.linalg.eigh(eye + gu)
    cu = qu @ onp.diag(1.0 / (1.0 + onp.sqrt(wu))) @ qu.T
    q_t = fu_t @ f64
    y_t = q_t + (cu @ (om_t @ q_t.T)).T @ om_t
    g = y_t @ y_t.T
    wg, qg = onp.linalg.eigh(0.5 * (g + g.T))
    wg = onp.maximum(wg, 0)
    sig = 2.0 / (1.0 + onp.sqrt(1.0 + 4.0 * wg))
    # psi is regular at l = 0 with limit -1/2 (only the zero-padding rows
    # land there; their Y columns are zero so the value is inert anyway).
    psi = onp.where(wg > 1e-12, (onp.sqrt(sig) - 1.0) / onp.maximum(wg, 1e-12),
                    -0.5 * onp.ones_like(wg))
    tau = qg @ onp.diag(psi) @ qg.T
    fw1 = f64 + (om_t @ f64.T).T @ (cu @ om_t)
    f_new64 = fw1 + (fw1 @ y_t.T) @ tau @ y_t
    np.testing.assert_allclose(np.asarray(f_n), f_new64, rtol=0, atol=5e-4)
