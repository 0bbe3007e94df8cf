"""Fused STL ADVI kernel (make_fused_advi_stl_multistep + fit_fused).

CPU CI: interpret mode (external eps — bit-comparable with hardware).  The
kernel maintains a Newton-tracked l^{-1}; correctness is pinned two ways:

- a pure-jnp TWIN of the kernel's exact algebra (tracked inverse included)
  must match tightly — validates the Pallas lowering;
- the exact-solve XLA STL oracle must match loosely at small learning rates
  (the tracked inverse's residual shrinks as lr^2 per sweep) — validates
  the tracking approximation against ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsmvi_tpu.advi import FusedADVISTLState
from gsmvi_tpu.ops.pallas.advi_fused import (STL_SWEEPS_DEFAULT,
                                             advi_stl_fused_supported,
                                             make_fused_advi_stl_multistep)


def _fused_advi(t, d, monkeypatch, **kw):
    import gsmvi_tpu.advi as advi_mod
    from gsmvi_tpu import ADVI

    monkeypatch.setattr(advi_mod, "on_tpu", lambda: True)
    g = ADVI(D=d, lp=t.lp, pallas_score=t.pallas_score, **kw)
    g._interpret = True
    return g


def _adam1(p, m, v, g, lr, bc1, bc2, b1=0.9, b2=0.999, eps=1e-8):
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    return p - lr * (m * bc1) / (jnp.sqrt(v * bc2) + eps), m, v


def _twin_steps(score_fn, sparams, loc, l, ainv, eps_steps, lrs, sweeps,
                exact_solve=False):
    """Pure-jnp replica of the kernel's per-step algebra (f32)."""
    b = eps_steps.shape[1]
    d = loc.shape[0]
    eye = jnp.eye(d, dtype=jnp.float32)
    z = jnp.zeros(d, jnp.float32)
    zm = jnp.zeros((d, d), jnp.float32)
    mloc, vloc, ml, vl = z, z, zm, zm
    tril = jnp.tril(jnp.ones((d, d), bool))
    for j in range(eps_steps.shape[0]):
        e = eps_steps[j]
        if exact_solve:
            ainv = jax.scipy.linalg.solve_triangular(l, eye, lower=True)
        else:
            for _ in range(sweeps):
                ainv = ainv + ainv @ (eye - l @ ainv)
        x = loc[None, :] + e @ l.T
        s = score_fn(x, *sparams)
        p = e @ ainv
        g_all = s + p
        g_loc = -jnp.sum(g_all, axis=0)
        g_l = jnp.where(tril, -(g_all.T @ e), 0.0)
        t_idx = jnp.float32(j + 1)
        bc1 = 1.0 / (1.0 - 0.9 ** t_idx)
        bc2 = 1.0 / (1.0 - 0.999 ** t_idx)
        loc, mloc, vloc = _adam1(loc, mloc, vloc, g_loc, lrs[j], bc1, bc2)
        l, ml, vl = _adam1(l, ml, vl, g_l, lrs[j], bc1, bc2)
    return loc, l


def _run_kernel(score_fn, sparams, loc, l, ainv, eps_steps, lrs, spc, b, d,
                sweeps=STL_SWEEPS_DEFAULT):
    t_idx = jnp.arange(1, spc + 1, dtype=jnp.float32)
    bc1s = 1.0 / (1.0 - 0.9 ** t_idx)
    bc2s = 1.0 / (1.0 - 0.999 ** t_idx)
    multi = make_fused_advi_stl_multistep(score_fn, len(sparams), b, d, spc,
                                          sweeps=sweeps, interpret=True)
    z = jnp.zeros(d, jnp.float32)
    zm = jnp.zeros((d, d), jnp.float32)
    return multi(lrs, bc1s, bc2s, spc, eps_steps.reshape(spc * b, d),
                 loc, l, ainv, z, z, zm, zm, *sparams)


def test_stl_kernel_matches_jnp_twin(rng):
    """Tight agreement with the exact-algebra twin (tracked inverse and
    all): validates the kernel lowering itself."""
    from gsmvi_tpu.models import dense_gaussian

    b, d, spc = 8, 12, 5
    t = dense_gaussian(jax.random.PRNGKey(3), d, scale=0.5)
    score_fn, sparams = t.pallas_score
    loc0 = jnp.asarray(rng.normal(size=d), jnp.float32)
    l0 = jnp.tril(jnp.eye(d, dtype=jnp.float32) + 0.1 * jnp.asarray(
        rng.normal(size=(d, d)), jnp.float32))
    ainv0 = jax.scipy.linalg.solve_triangular(
        l0, jnp.eye(d, dtype=jnp.float32), lower=True)
    eps_steps = jnp.asarray(rng.normal(size=(spc, b, d)), jnp.float32)
    lrs = jnp.asarray([0.02, 0.01, 0.02, 0.015, 0.01], jnp.float32)

    out = _run_kernel(score_fn, sparams, loc0, l0, ainv0, eps_steps, lrs,
                      spc, b, d)
    assert int(out[7]) == spc and int(out[8]) == 0
    loc_t, l_t = _twin_steps(score_fn, sparams, loc0, l0, ainv0, eps_steps,
                             np.asarray(lrs), STL_SWEEPS_DEFAULT)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(loc_t),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(l_t),
                               atol=1e-5, rtol=1e-5)


def test_stl_kernel_tracks_exact_solve(rng):
    """At polish learning rates the tracked inverse stays close enough that
    the whole trajectory matches the EXACT-solve STL oracle."""
    from gsmvi_tpu.models import dense_gaussian

    b, d, spc = 8, 12, 6
    t = dense_gaussian(jax.random.PRNGKey(5), d, scale=0.5)
    score_fn, sparams = t.pallas_score
    loc0 = jnp.zeros(d, jnp.float32)
    l0 = jnp.tril(jnp.eye(d, dtype=jnp.float32) + 0.05 * jnp.asarray(
        rng.normal(size=(d, d)), jnp.float32))
    ainv0 = jax.scipy.linalg.solve_triangular(
        l0, jnp.eye(d, dtype=jnp.float32), lower=True)
    eps_steps = jnp.asarray(rng.normal(size=(spc, b, d)), jnp.float32)
    lrs = jnp.full((spc,), 2e-3, jnp.float32)

    out = _run_kernel(score_fn, sparams, loc0, l0, ainv0, eps_steps, lrs,
                      spc, b, d)
    loc_x, l_x = _twin_steps(score_fn, sparams, loc0, l0, ainv0, eps_steps,
                             np.asarray(lrs), 0, exact_solve=True)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(loc_x),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(l_x),
                               atol=2e-4)


def test_stl_kernel_gate_freezes(rng):
    """A stale/failing tracked inverse trips the residual gate on sub-step
    0: nothing is consumed and the state comes back untouched."""
    from gsmvi_tpu.models import dense_gaussian

    b, d, spc = 8, 12, 4
    t = dense_gaussian(jax.random.PRNGKey(1), d, scale=0.5)
    score_fn, sparams = t.pallas_score
    l0 = jnp.tril(2.0 * jnp.eye(d, dtype=jnp.float32) + 0.5 * jnp.asarray(
        rng.normal(size=(d, d)), jnp.float32))
    ainv_stale = jnp.eye(d, dtype=jnp.float32)  # residual ~ I - l0, huge
    loc0 = jnp.zeros(d, jnp.float32)
    eps_steps = jnp.asarray(rng.normal(size=(spc, b, d)), jnp.float32)
    lrs = jnp.full((spc,), 1e-2, jnp.float32)
    out = _run_kernel(score_fn, sparams, loc0, l0, ainv_stale, eps_steps,
                      lrs, spc, b, d)
    assert int(out[7]) == 0 and int(out[8]) == 1
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(loc0))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(l0))


def test_fit_fused_stl_pins_optimum(monkeypatch):
    """Started at the optimum, the fused STL fit stays pinned while the
    fused analytic fit diffuses to its variance floor — the fused version
    of test_advi_stl.test_stl_polish_beats_analytic_floor."""
    from gsmvi_tpu.models import dense_gaussian

    d = 12
    t = dense_gaussian(jax.random.PRNGKey(7), d)
    errs = {}
    for est in ("analytic", "stl"):
        g = _fused_advi(t, d, monkeypatch, steps_per_call=4)
        mean, cov, _ = g.fit_fused(jax.random.PRNGKey(2),
                                   learning_rate=5e-3, niter=1500,
                                   batch_size=16, verbose=False,
                                   mean=jnp.asarray(t.mean),
                                   cov=jnp.asarray(t.cov), estimator=est)
        scale = max(1.0, float(np.abs(np.asarray(t.cov)).max()))
        errs[est] = (np.abs(np.asarray(mean) - np.asarray(t.mean)).max()
                     + np.abs(np.asarray(cov) - np.asarray(t.cov)).max()
                     / scale)
    assert errs["stl"] < 0.1 * errs["analytic"], errs


def test_fit_fused_stl_invariant_to_spc_and_cadence(monkeypatch):
    """Trajectory invariance to steps_per_call and print cadence, with the
    tracked inverse carried in the state."""
    from gsmvi_tpu.models import dense_gaussian

    d = 8
    t = dense_gaussian(jax.random.PRNGKey(5), d, scale=0.4)
    outs = []
    for spc, nprint in ((3, 0), (8, 0), (8, 7)):
        g = _fused_advi(t, d, monkeypatch, steps_per_call=spc)
        st, _ = g.fit_fused(jax.random.PRNGKey(2), learning_rate=1e-2,
                            niter=50, batch_size=8, verbose=nprint > 0,
                            nprint=nprint, return_state=True,
                            estimator="stl")
        assert int(st.step) == 51
        outs.append((np.asarray(st.loc), np.asarray(st.l),
                     np.asarray(st.ainv)))
    for loc, l, ainv in outs[1:]:
        np.testing.assert_array_equal(loc, outs[0][0])
        np.testing.assert_array_equal(l, outs[0][1])
        np.testing.assert_array_equal(ainv, outs[0][2])


def test_fit_fused_stl_replay_path(monkeypatch):
    """A fit whose early steps trip the gate (aggressive lr on a stiff
    start) must still be spc-invariant and finite — the XLA replay is part
    of the deterministic trajectory."""
    from gsmvi_tpu.models import dense_gaussian

    d = 8
    t = dense_gaussian(jax.random.PRNGKey(9), d)
    # Tiny starting scale + huge lr: Adam's per-entry steps dwarf the
    # factor, so |Delta L^T A| blows through the residual gate and the
    # kernel hands nearly every step to the XLA replay.
    cov0 = 1e-4 * jnp.eye(d, dtype=jnp.float32)
    outs = []
    for spc in (2, 8):
        g = _fused_advi(t, d, monkeypatch, steps_per_call=spc)
        st, _ = g.fit_fused(jax.random.PRNGKey(0), learning_rate=0.5,
                            niter=40, batch_size=8, verbose=False,
                            cov=cov0, return_state=True, estimator="stl")
        assert int(st.step) == 41
        assert np.all(np.isfinite(np.asarray(st.l)))
        outs.append((np.asarray(st.loc), np.asarray(st.l)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_fit_fused_stl_resume_and_lift(monkeypatch):
    """Split-run resume is exact, and an analytic fused state lifts into
    the STL path (the all-fused two-phase recipe)."""
    from gsmvi_tpu.models import dense_gaussian

    d = 8
    t = dense_gaussian(jax.random.PRNGKey(8), d, scale=0.4)
    g = _fused_advi(t, d, monkeypatch, steps_per_call=4)
    st_a, _ = g.fit_fused(jax.random.PRNGKey(3), learning_rate=1e-2,
                          niter=20, batch_size=8, verbose=False,
                          return_state=True, estimator="stl")
    st_b, _ = g.fit_fused(jax.random.PRNGKey(3), learning_rate=1e-2,
                          niter=30, batch_size=8, verbose=False,
                          state=st_a, return_state=True, estimator="stl")
    g2 = _fused_advi(t, d, monkeypatch, steps_per_call=4)
    st_f, _ = g2.fit_fused(jax.random.PRNGKey(3), learning_rate=1e-2,
                           niter=51, batch_size=8, verbose=False,
                           return_state=True, estimator="stl")
    assert int(st_b.step) == int(st_f.step)
    np.testing.assert_array_equal(np.asarray(st_b.l), np.asarray(st_f.l))

    # lift: analytic bulk -> stl polish, both fused
    st0, _ = g.fit_fused(jax.random.PRNGKey(1), learning_rate=2e-2,
                         niter=300, batch_size=16, verbose=False,
                         return_state=True)
    assert not isinstance(st0, FusedADVISTLState)
    st1, _ = g.fit_fused(jax.random.PRNGKey(1), learning_rate=2e-3,
                         niter=200, batch_size=16, verbose=False,
                         state=st0, return_state=True, estimator="stl")
    assert isinstance(st1, FusedADVISTLState)
    assert int(st1.step) == int(st0.step) + 201
    assert np.all(np.isfinite(np.asarray(st1.l)))


def test_stl_kernel_freezes_on_nonfinite_gradient(rng):
    """A sub-step whose gradient overflows f32 (huge draw -> |g| = inf)
    must NOT be consumed: Adam would write NaN/inf into the carried state
    and the replay would revert INTO the poisoned state (review finding).
    The kernel freezes at that sub-step instead."""
    from gsmvi_tpu.models import dense_gaussian

    b, d, spc = 4, 8, 4
    t = dense_gaussian(jax.random.PRNGKey(3), d, scale=0.5)
    score_fn, sparams = t.pallas_score
    loc0 = jnp.zeros(d, jnp.float32)
    l0 = jnp.eye(d, dtype=jnp.float32)
    ainv0 = jnp.eye(d, dtype=jnp.float32)
    eps = jnp.asarray(rng.normal(size=(spc, b, d)), jnp.float32)
    eps = eps.at[2].set(1e30)  # s ~ 1e30 finite, g_l ~ s^T e -> inf
    lrs = jnp.full((spc,), 1e-2, jnp.float32)
    out = _run_kernel(score_fn, sparams, loc0, l0, ainv0, eps, lrs, spc,
                      b, d)
    assert int(out[7]) == 2 and int(out[8]) == 1
    for a in out[:7]:
        assert np.all(np.isfinite(np.asarray(a)))
    # frozen state == the clean 2-step run (nmax=2) on the same block
    t_idx = jnp.arange(1, spc + 1, dtype=jnp.float32)
    bc1s = 1.0 / (1.0 - 0.9 ** t_idx)
    bc2s = 1.0 / (1.0 - 0.999 ** t_idx)
    multi = make_fused_advi_stl_multistep(score_fn, len(sparams), b, d,
                                          spc, interpret=True)
    z = jnp.zeros(d, jnp.float32)
    zm = jnp.zeros((d, d), jnp.float32)
    ref = multi(lrs, bc1s, bc2s, 2, eps.reshape(spc * b, d), loc0, l0,
                ainv0, z, z, zm, zm, *sparams)
    for a, c in zip(out[:7], ref[:7]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_fit_fused_rejects_unknown_estimator(monkeypatch):
    """A typo'd estimator must raise on the fused path too, not silently
    run the analytic kernel (review finding)."""
    from gsmvi_tpu.models import dense_gaussian

    t = dense_gaussian(jax.random.PRNGKey(1), 6, scale=0.5)
    g = _fused_advi(t, 6, monkeypatch)
    with pytest.raises(ValueError, match="estimator"):
        g.fit_fused(jax.random.PRNGKey(0), niter=4, batch_size=8,
                    verbose=False, estimator="slt")


def test_stl_fused_gate():
    if not advi_stl_fused_supported(32, 256, 8):
        pytest.skip("pallas TPU backend not importable")
    assert advi_stl_fused_supported(32, 512, 8)
    # Above 512 the XLA STL path wins (measured) and D=1024's ~23 D^2
    # Mosaic stack would blow the 96 MB scoped-VMEM cap.
    assert not advi_stl_fused_supported(32, 1024, 8)
    assert not advi_stl_fused_supported(1, 256, 8)
