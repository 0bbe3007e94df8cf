"""Fused whole-step ADVI kernel (ops/pallas/advi_fused.py) + ADVI.fit_fused.

CPU CI: the kernel runs under pallas interpret mode (the eps block is
external, so interpret runs are bit-comparable with hardware), with
``on_tpu`` monkeypatched for the fitter-level gating.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gsmvi_tpu.ops.pallas.advi_fused import (advi_fused_supported,
                                             make_fused_advi_multistep)


def _fused_advi(t, d, monkeypatch, **kw):
    import gsmvi_tpu.advi as advi_mod
    from gsmvi_tpu import ADVI

    monkeypatch.setattr(advi_mod, "on_tpu", lambda: True)
    g = ADVI(D=d, lp=t.lp, pallas_score=t.pallas_score, **kw)
    g._interpret = True
    return g


def _xla_adam_oracle(score_fn, sparams, loc, l, eps_steps, lrs, b1, b2,
                     eps_adam):
    """optax-exact reference for the fused kernel: analytic ELBO gradient
    with INJECTED eps (same draws as the kernel), optax.adam updates.

    The gradient is computed by autodiff through the same reparameterized
    negative-ELBO estimator the XLA ``fit`` path uses (advi.py ``neg_elbo``)
    — an independent derivation of the kernel's hand-written
    ``-S^T E - B diag(1/L_ii)`` form."""
    b = eps_steps.shape[1]
    d = loc.shape[0]

    def neg_elbo(params, e):
        lc, sl = params
        lt = jnp.tril(sl)
        x = lc + e @ lt.T
        logdet = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(lt))))
        # constants drop from the gradient; keep only theta-dependent terms
        logq = -b * logdet
        lp = jnp.sum(jax.vmap(
            lambda xx: jnp.sum(_lp_from_score(score_fn, sparams, xx)))(x))
        return -(lp) + logq

    # score_fn is the gradient of lp; integrate it symbolically only for the
    # quadratic (dense-Gaussian) case used in tests.
    def _lp_from_score(score_fn, sparams, x):
        mu_t, prec = sparams
        r = x[None, :] - mu_t.reshape(1, -1)
        return -0.5 * jnp.sum((r @ prec) * r)

    params = (loc, jnp.tril(l))
    opt = optax.adam(1.0, b1=b1, b2=b2, eps=eps_adam)  # lr applied per step
    opt_state = opt.init(params)
    for j in range(eps_steps.shape[0]):
        g = jax.grad(neg_elbo)(params, eps_steps[j])
        updates, opt_state = opt.update(g, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: lrs[j] * u, updates)
        params = optax.apply_updates(params, updates)
    return params


def test_fused_kernel_matches_xla_adam_oracle(rng):
    """The in-kernel analytic gradient + Adam must match autodiff + optax
    with the identical eps draws to f32 accuracy over several steps."""
    from gsmvi_tpu.models import dense_gaussian

    b, d, spc = 8, 12, 5
    t = dense_gaussian(jax.random.PRNGKey(3), d, scale=0.5)
    score_fn, sparams = t.pallas_score
    loc0 = jnp.asarray(rng.normal(size=d), jnp.float32)
    l0 = jnp.tril(jnp.eye(d, dtype=jnp.float32)
                  + 0.1 * jnp.asarray(rng.normal(size=(d, d)), jnp.float32))
    eps_steps = jnp.asarray(rng.normal(size=(spc, b, d)), jnp.float32)
    lrs = jnp.asarray([0.05, 0.03, 0.02, 0.05, 0.01], jnp.float32)
    t_idx = jnp.arange(1, spc + 1, dtype=jnp.float32)
    bc1s = 1.0 / (1.0 - 0.9 ** t_idx)
    bc2s = 1.0 / (1.0 - 0.999 ** t_idx)

    multi = make_fused_advi_multistep(score_fn, len(sparams), b, d, spc,
                                      interpret=True)
    z = jnp.zeros(d, jnp.float32)
    zm = jnp.zeros((d, d), jnp.float32)
    loc_k, l_k, *_ = multi(lrs, bc1s, bc2s, spc,
                           eps_steps.reshape(spc * b, d), loc0, l0, z, z,
                           zm, zm, *sparams)

    loc_o, l_o = _xla_adam_oracle(score_fn, sparams, loc0, l0, eps_steps,
                                  np.asarray(lrs), 0.9, 0.999, 1e-8)
    np.testing.assert_allclose(np.asarray(loc_k), np.asarray(loc_o),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(jnp.tril(l_o)),
                               atol=2e-5, rtol=2e-5)


def test_fused_kernel_nmax_freezes_tail(rng):
    """Sub-steps beyond nmax must leave the state untouched."""
    from gsmvi_tpu.models import dense_gaussian

    b, d, spc = 4, 8, 6
    t = dense_gaussian(jax.random.PRNGKey(1), d, scale=0.4)
    score_fn, sparams = t.pallas_score
    loc0 = jnp.zeros(d, jnp.float32)
    l0 = jnp.eye(d, dtype=jnp.float32)
    eps = jnp.asarray(rng.normal(size=(spc * b, d)), jnp.float32)
    lrs = jnp.full((spc,), 0.05, jnp.float32)
    t_idx = jnp.arange(1, spc + 1, dtype=jnp.float32)
    bc1s = 1.0 / (1.0 - 0.9 ** t_idx)
    bc2s = 1.0 / (1.0 - 0.999 ** t_idx)
    multi = make_fused_advi_multistep(score_fn, len(sparams), b, d, spc,
                                      interpret=True)
    z = jnp.zeros(d, jnp.float32)
    zm = jnp.zeros((d, d), jnp.float32)
    out3 = multi(lrs, bc1s, bc2s, 3, eps, loc0, l0, z, z, zm, zm, *sparams)
    out3b = multi(lrs, bc1s, bc2s, 3,
                  eps.at[3 * b:].set(123.0), loc0, l0, z, z, zm, zm,
                  *sparams)
    for a, c in zip(out3, out3b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_fit_fused_recovers_target(monkeypatch):
    """End-to-end fused fit on a benign dense Gaussian recovers moments."""
    from gsmvi_tpu.models import dense_gaussian

    d = 8
    t = dense_gaussian(jax.random.PRNGKey(7), d, scale=0.3)
    g = _fused_advi(t, d, monkeypatch, steps_per_call=8)
    assert g._fused_supported(16)
    mean, cov, losses = g.fit_fused(jax.random.PRNGKey(0),
                                    learning_rate=5e-2, niter=2000,
                                    batch_size=16, verbose=False)
    assert losses is None
    scale = max(1.0, float(np.abs(np.asarray(t.cov)).max()))
    assert np.abs(np.asarray(mean) - np.asarray(t.mean)).max() < 0.1 * scale
    assert np.abs(np.asarray(cov) - np.asarray(t.cov)).max() < 0.15 * scale


def test_fit_fused_invariant_to_spc_and_cadence(monkeypatch):
    """eps is drawn per ABSOLUTE step, lr/bias corrections are pure
    functions of the step index, and kernel blocks mask by nmax — so the
    trajectory must be invariant to steps_per_call and print cadence."""
    from gsmvi_tpu.models import dense_gaussian

    d = 6
    t = dense_gaussian(jax.random.PRNGKey(5), d, scale=0.4)
    outs = []
    for spc, nprint in ((3, 0), (8, 0), (8, 7)):
        g = _fused_advi(t, d, monkeypatch, steps_per_call=spc)
        st, _ = g.fit_fused(jax.random.PRNGKey(2), learning_rate=2e-2,
                            niter=50, batch_size=8, verbose=nprint > 0,
                            nprint=nprint, return_state=True)
        assert int(st.step) == 51
        outs.append((np.asarray(st.loc), np.asarray(st.l)))
    for loc, l in outs[1:]:
        np.testing.assert_array_equal(loc, outs[0][0])
        np.testing.assert_array_equal(l, outs[0][1])


def test_fit_fused_schedule(monkeypatch):
    """A callable learning_rate must reproduce the same trajectory as
    manually passing its per-step values through the constant-lr kernel
    (here: compare against a second schedule object with equal values)."""
    from gsmvi_tpu.models import dense_gaussian

    d = 4
    t = dense_gaussian(jax.random.PRNGKey(9), d, scale=0.5)
    sched = optax.exponential_decay(3e-2, transition_steps=20,
                                    decay_rate=0.5)
    g = _fused_advi(t, d, monkeypatch, steps_per_call=4)
    st, _ = g.fit_fused(jax.random.PRNGKey(1), learning_rate=sched,
                        niter=40, batch_size=8, verbose=False,
                        return_state=True)
    g2 = _fused_advi(t, d, monkeypatch, steps_per_call=4)
    st_c, _ = g2.fit_fused(jax.random.PRNGKey(1), learning_rate=3e-2,
                           niter=40, batch_size=8, verbose=False,
                           return_state=True)
    # the schedule decays -> must move less far than the constant rate
    assert not np.allclose(np.asarray(st.loc), np.asarray(st_c.loc))
    assert np.all(np.isfinite(np.asarray(st.l)))


def test_fit_fused_falls_back_off_tpu():
    """Without a TPU (and without the interpret hook) fit_fused must run
    the XLA fit with optax.adam — same return contract."""
    from gsmvi_tpu import ADVI
    from gsmvi_tpu.models import dense_gaussian

    d = 5
    t = dense_gaussian(jax.random.PRNGKey(4), d, scale=0.4)
    g = ADVI(D=d, lp=t.lp, pallas_score=t.pallas_score)
    assert not g._fused_supported(8)
    mean, cov, losses = g.fit_fused(jax.random.PRNGKey(0),
                                    learning_rate=2e-2, niter=60,
                                    batch_size=8, verbose=False)
    assert losses is None
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.isfinite(np.asarray(cov)))


def test_fit_fused_fallback_resumes_from_state():
    """Where the kernel is unavailable, fit_fused(state=...) must continue
    from the state's (mean, cov) through the XLA fallback — not silently
    restart from the identity init (round-3 fix)."""
    import jax.numpy as jnp

    from gsmvi_tpu import ADVI
    from gsmvi_tpu.advi import FusedADVIState
    from gsmvi_tpu.models import dense_gaussian

    d = 5
    t = dense_gaussian(jax.random.PRNGKey(4), d, scale=0.4)
    g = ADVI(D=d, lp=t.lp, pallas_score=t.pallas_score)
    assert not g._fused_supported(8)  # CPU: falls back
    loc0 = jnp.full(d, 3.0, jnp.float32)
    z = jnp.zeros(d, jnp.float32)
    zm = jnp.zeros((d, d), jnp.float32)
    st = FusedADVIState(loc0, jnp.eye(d, dtype=jnp.float32), z, z, zm, zm,
                        jax.random.PRNGKey(0), jnp.asarray(7, jnp.int32))
    mean, cov, _ = g.fit_fused(jax.random.PRNGKey(1), learning_rate=1e-3,
                               niter=5, batch_size=8, verbose=False,
                               state=st)
    # 5 steps at lr 1e-3 move each coordinate < ~5e-3: the fit must still
    # sit near the state's loc, not near the default zero init.
    assert np.abs(np.asarray(mean) - 3.0).max() < 0.1


def test_fit_fused_monitor_and_resume(monkeypatch):
    """KLMonitor runs at its cadence on the fused path, and a state=
    resume continues the exact trajectory (fold_in(key, step) stream)."""
    from gsmvi_tpu.models import dense_gaussian
    from gsmvi_tpu.utils.monitors import KLMonitor

    d = 6
    t = dense_gaussian(jax.random.PRNGKey(8), d, scale=0.4)
    g = _fused_advi(t, d, monkeypatch, steps_per_call=4)
    mon = KLMonitor(batch_size_kl=8, checkpoint=10)
    st, _ = g.fit_fused(jax.random.PRNGKey(3), learning_rate=2e-2,
                        niter=30, batch_size=8, verbose=False, monitor=mon,
                        return_state=True)
    assert len(mon.rkl) >= 3
    assert np.all(np.isfinite(np.asarray(mon.rkl)))

    # split run: 21 steps then 31 resumed steps == one 52-step run
    g2 = _fused_advi(t, d, monkeypatch, steps_per_call=4)
    st_a, _ = g2.fit_fused(jax.random.PRNGKey(3), learning_rate=2e-2,
                           niter=20, batch_size=8, verbose=False,
                           return_state=True)
    st_b, _ = g2.fit_fused(jax.random.PRNGKey(3), learning_rate=2e-2,
                           niter=30, batch_size=8, verbose=False,
                           state=st_a, return_state=True)
    g3 = _fused_advi(t, d, monkeypatch, steps_per_call=4)
    st_full, _ = g3.fit_fused(jax.random.PRNGKey(3), learning_rate=2e-2,
                              niter=51, batch_size=8, verbose=False,
                              return_state=True)
    assert int(st_b.step) == int(st_full.step)
    np.testing.assert_array_equal(np.asarray(st_b.loc),
                                  np.asarray(st_full.loc))
    np.testing.assert_array_equal(np.asarray(st_b.l),
                                  np.asarray(st_full.l))


def test_advi_fused_supported_gate():
    """VMEM budget gate: generous at bench shapes, closed at huge D and
    for sub-minimal batches."""
    if not advi_fused_supported(32, 256, 8):
        pytest.skip("pallas TPU backend not importable")
    assert advi_fused_supported(32, 1024, 8)
    assert not advi_fused_supported(1, 256, 8)
    assert not advi_fused_supported(32, 4096, 8)


def test_fit_fused_invariant_to_max_steps_per_call(monkeypatch):
    """The program-length cap (worker-watchdog guard) splits a fit into
    bounded device programs; eps is drawn per ABSOLUTE step, so the
    trajectory must be bit-identical to the uncapped run."""
    from gsmvi_tpu.models import dense_gaussian

    d = 6
    t = dense_gaussian(jax.random.PRNGKey(5), d, scale=0.4)
    outs = []
    for cap in (0, 7, 13):
        g = _fused_advi(t, d, monkeypatch, steps_per_call=4)
        st, _ = g.fit_fused(jax.random.PRNGKey(2), learning_rate=2e-2,
                            niter=50, batch_size=8, verbose=False,
                            return_state=True, max_steps_per_call=cap)
        assert int(st.step) == 51
        outs.append((np.asarray(st.loc), np.asarray(st.l)))
    for loc, l in outs[1:]:
        np.testing.assert_array_equal(loc, outs[0][0])
        np.testing.assert_array_equal(l, outs[0][1])
