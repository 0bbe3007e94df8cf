"""Periodic fused-vs-exact audits (utils/audit.py, ``audit_every``).

The fused NS paths' residual gates catch catastrophic loss, not slow bias
(CLAUDE.md numerics lessons); the audit closes that gap at run time by
comparing the fused update against the exact XLA path on the live state.
These tests drive the fused paths on CPU via interpret mode.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsmvi_tpu import FactorBaM, FactorGSM, Regularizers
from gsmvi_tpu.models import dense_gaussian


def _fused_factorgsm(t, d, monkeypatch, **kw):
    # "update" fused mode (no pallas_score): the whole-step kernel's
    # in-kernel hardware PRNG has no CPU path (tested on hardware,
    # test_tpu_hardware.py); the audit exercises the same NS update kernel
    # either way.
    import gsmvi_tpu.gsm_factor as gf_mod

    monkeypatch.setattr(gf_mod, "on_tpu", lambda: True)
    g = FactorGSM(D=d, lp=t.lp, lp_g=t.lp_g, dtype=jnp.float32, **kw)
    g._interpret = True
    return g


def _fused_factorbam(t, d, monkeypatch, **kw):
    import gsmvi_tpu.bam_factor as bf_mod

    monkeypatch.setattr(bf_mod, "on_tpu", lambda: True)
    g = FactorBaM(D=d, lp=t.lp, lp_g=t.lp_g, dtype=jnp.float32,
                  pallas_score=t.pallas_score, **kw)
    g._interpret = True
    return g


def test_factorgsm_audit_benign(monkeypatch, recwarn):
    """With the shipped ns_iters the fused update matches the exact eps
    step to f32 working accuracy at every audited state — records land in
    audit_log, no warning fires, and the trajectory is byte-identical to
    an unaudited fit (the audit draw is stream-disjoint)."""
    d = 8
    t = dense_gaussian(jax.random.PRNGKey(7), d, scale=0.3)
    g = _fused_factorgsm(t, d, monkeypatch, steps_per_call=4)
    assert g._pallas_mode(8) == "update"
    state = g.fit(jax.random.PRNGKey(0), niter=300, batch_size=8,
                  verbose=False, return_state=True, audit_every=100)
    assert [r["i"] for r in g.audit_log] == [100, 200, 300]
    assert all(r["valid"] for r in g.audit_log)
    assert max(max(r["mean_err"], r["cov_err"]) for r in g.audit_log) < 1e-4
    assert not [w for w in recwarn if "audit" in str(w.message)]

    g2 = _fused_factorgsm(t, d, monkeypatch, steps_per_call=4)
    state2 = g2.fit(jax.random.PRNGKey(0), niter=300, batch_size=8,
                    verbose=False, return_state=True)
    np.testing.assert_array_equal(np.asarray(state.mean),
                                  np.asarray(state2.mean))
    np.testing.assert_array_equal(np.asarray(state.factor),
                                  np.asarray(state2.factor))


def test_factorgsm_audit_catches_truncated_ns(monkeypatch):
    """An under-iterated NS chain (the documented silent-bias mode: gates
    green, moments biased) must trip the audit warning — and its audited
    errors must sit measurably above the shipped profile's."""
    d = 8
    t = dense_gaussian(jax.random.PRNGKey(7), d, scale=0.3)

    g_good = _fused_factorgsm(t, d, monkeypatch, steps_per_call=4)
    g_good.fit(jax.random.PRNGKey(0), niter=200, batch_size=8,
               verbose=False, audit_every=100)
    good_err = max(max(r["mean_err"], r["cov_err"])
                   for r in g_good.audit_log)

    # iters[2] (the W1^{-1} inverse) trimmed below the shipped profile:
    # the measured silent-bias regime — residual gates stay green, the
    # audit sees ~4e-3 accepted-step bias, above the DEFAULT tolerance.
    g_bad = _fused_factorgsm(t, d, monkeypatch, steps_per_call=4,
                             ns_iters=(5, 4, 3, 7, 4))
    with pytest.warns(UserWarning, match="fused-step audit"):
        g_bad.fit(jax.random.PRNGKey(0), niter=200, batch_size=8,
                  verbose=False, audit_every=100)
    bad_err = max(max(r["mean_err"], r["cov_err"]) for r in g_bad.audit_log
                  if r["valid"])
    assert bad_err > 10 * max(good_err, 1e-8)


def test_factorbam_audit_benign(monkeypatch, recwarn):
    """Fused BaM (NS-ladder default) audits clean against the thin-SVD
    oracle on a benign target."""
    d = 8
    t = dense_gaussian(jax.random.PRNGKey(7), d, scale=0.3)
    g = _fused_factorbam(t, d, monkeypatch, steps_per_call=4)
    assert g._pallas_mode(8) == "step"
    g.fit(jax.random.PRNGKey(0), regf=Regularizers().linear(20.0),
          niter=300, batch_size=8, verbose=False, retries=0,
          audit_every=100)
    assert [r["i"] for r in g.audit_log] == [100, 200, 300]
    valid = [r for r in g.audit_log if r["valid"]]
    assert valid, "every audited step was stiff — audit vacuous"
    assert max(max(r["mean_err"], r["cov_err"]) for r in valid) < 1e-3
    assert not [w for w in recwarn if "fused-step audit" in str(w.message)]


def test_factorbam_audit_stiff_steps_vacuous(monkeypatch):
    """Steps the kernel flags stiff are replayed exactly in the real fit —
    the audit must report them valid=False with zero errors, not as bias."""
    d = 8
    t = dense_gaussian(jax.random.PRNGKey(3), d)
    # lmax_gate=0 forces every fused step stiff.
    g = _fused_factorbam(t, d, monkeypatch, steps_per_call=4, lmax_gate=1e-9,
                         gu_gate=1e-9, ns_profile="long")
    g.fit(jax.random.PRNGKey(0), regf=Regularizers().linear(20.0),
          niter=100, batch_size=8, verbose=False, retries=0,
          audit_every=50)
    assert g.audit_log and all(not r["valid"] for r in g.audit_log)
    assert all(r["mean_err"] == 0.0 and r["cov_err"] == 0.0
               for r in g.audit_log)


def test_audit_warns_when_fused_path_inactive():
    """audit_every on a config that never runs the fused kernel warns and
    runs no audits (nothing fused to audit)."""
    d = 8
    t = dense_gaussian(jax.random.PRNGKey(7), d, scale=0.3)
    g = FactorGSM(D=d, lp=t.lp, lp_g=t.lp_g, dtype=jnp.float32,
                  use_pallas=False)
    with pytest.warns(UserWarning, match="not.*active"):
        g.fit(jax.random.PRNGKey(0), niter=50, batch_size=8, verbose=False,
              audit_every=25)
    assert g.audit_log == []

    b = FactorBaM(D=d, lp=t.lp, lp_g=t.lp_g, dtype=jnp.float32,
                  use_pallas=False)
    with pytest.warns(UserWarning, match="not.*active"):
        b.fit(jax.random.PRNGKey(0), regf=Regularizers().linear(20.0),
              niter=50, batch_size=8, verbose=False, retries=0,
              audit_every=25)
    assert b.audit_log == []


def test_audit_key_disjoint_from_monitor_stream():
    """The audit's salted double fold must differ from the monitor's
    single fold at every index (stream disjointness is what guarantees
    audits cannot perturb monitor draws)."""
    from gsmvi_tpu.utils.audit import _audit_key

    key = jax.random.PRNGKey(0)
    for i in (0, 1, 100, 2**20):
        a = jax.random.key_data(_audit_key(key, i))
        m = jax.random.key_data(jax.random.fold_in(key, i))
        assert not np.array_equal(np.asarray(a), np.asarray(m))
