"""Periodic exact audits of the fused Newton-Schulz update kernels.

The fused Pallas paths accept steps through Newton-Schulz residual gates,
which catch *catastrophic* accuracy loss but NOT slow bias: an
under-iterated NS chain converges to measurably wrong moments with zero
in-kernel rejections (measured: FactorGSM iters[2] < 6 lands at cov_err
0.017 instead of 0.0026 — see gsm_factor.FactorGSM ns_iters notes).  The
safety of the shipped sweep counts otherwise rests on offline convergence
studies at fixed conditioning.

``audit_every`` on the factor fitters closes that gap at run time: every
``audit_every`` iterations the driver hands the LIVE state to this module,
which draws one fresh batch, evaluates the score, and pushes the identical
(eps, score) through BOTH the fused update kernel and the exact XLA eps
path, reporting max-abs relative errors of the proposed mean and
covariance.  That measures NS bias exactly where it matters — at the
current state's conditioning — for O(niter/audit_every) exact steps of
overhead (one extra score batch + one XLA update + one host sync each;
negligible at cadences of a few hundred).

The audit draw uses a salted double fold of the fit key, disjoint from
both the per-step eps stream and the monitor's ``fold_in(key, i)``
checkpoint keys, so enabling audits never perturbs the fit trajectory.

Reference context: the reference has no fused kernels and therefore no
analogous bias risk — its update is the exact linear-algebra path every
step (``gsmvi/gsm.py:31-76``).  This module restores that exactness
guarantee *statistically* for the fused TPU path.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp

# Salt folded on top of fold_in(key, i) so audit draws share no stream with
# monitor checkpoint keys (which use the single fold) or per-step eps.
AUDIT_SALT = 0x5D17


def _audit_key(state_key, i):
    key = state_key
    if not jnp.issubdtype(jnp.asarray(key).dtype, jax.dtypes.prng_key):
        key = jax.random.PRNGKey(jnp.asarray(key).ravel()[-1].astype(
            jnp.uint32))
    return jax.random.fold_in(jax.random.fold_in(key, i), AUDIT_SALT)


def _moment_errors(m_f, f_f, m_x, f_x):
    """Max-abs relative error of (mean, covariance) between the fused and
    exact proposals, each scaled by max(1, |exact|_max)."""
    s_f = f_f @ f_f.T
    s_x = f_x @ f_x.T
    em = jnp.max(jnp.abs(m_f - m_x)) / jnp.maximum(1.0, jnp.max(jnp.abs(m_x)))
    es = jnp.max(jnp.abs(s_f - s_x)) / jnp.maximum(1.0, jnp.max(jnp.abs(s_x)))
    return em, es


def make_gsm_audit(lp_g, batch_size: int, d: int, ns_iters, big_prec,
                   interpret: bool = False, pallas_score=None):
    """Jitted ``(state, i) -> (mean_err, cov_err, valid)`` comparing the
    fused GSM Pallas path against the exact XLA eps step on one fresh
    draw from the live state.

    With ``pallas_score`` (the fitter's ``(score_fn, params)`` pair) the
    audit replays the WHOLE fused step — the in-kernel sampling matmul,
    traced score and NS update — against host-side ``lp_g`` + the exact
    XLA eps step with the IDENTICAL eps (possible since round 5: the
    whole-step path draws eps externally per absolute step), so it also
    certifies that the Pallas-traced score matches ``lp_g``.  Without it
    the audit exercises the update-only kernel (``gsm_eps_update_fused``),
    which shares its NS small-space chain with the whole-step kernel.
    ``valid`` is False when either path rejected the proposal (errors are
    reported as 0 then: nothing was accepted to be biased).
    """
    from ..ops.gsm_eps import apply_eps_step
    from ..ops.pallas.fused_step import (gsm_eps_update_fused,
                                         make_fused_eps_step)

    if pallas_score is not None:
        score_fn, params = pallas_score
        fused_step = make_fused_eps_step(
            score_fn, len(params), batch_size, d, external_eps=True,
            big_prec=big_prec, iters=ns_iters, interpret=interpret)

    @jax.jit
    def audit(state, i):
        with jax.default_matmul_precision("float32"):
            eps = jax.random.normal(_audit_key(state.key, i),
                                    (batch_size, d), jnp.float32)
            samples = state.mean + eps @ state.factor.T
            vs = lp_g(samples).astype(jnp.float32)
            if pallas_score is not None:
                m_f, f_f, good_f = fused_step(eps, state.mean, state.factor,
                                              *params)
            else:
                m_f, f_f, good_f = gsm_eps_update_fused(
                    eps, vs, state.mean, state.factor, iters=ns_iters,
                    big_prec=big_prec, interpret=interpret)
            m_x, f_x, good_x = apply_eps_step(state.mean, state.factor,
                                              eps, vs)
            em, es = _moment_errors(m_f, f_f, m_x, f_x)
            valid = jnp.logical_and(good_f, good_x)
            zero = jnp.zeros((), em.dtype)
            return (jnp.where(valid, em, zero), jnp.where(valid, es, zero),
                    valid)

    return audit


def make_bam_audit(lp_g, batch_size: int, d: int, regf, fused_update):
    """Jitted ``(state, i) -> (mean_err, cov_err, valid)`` comparing the
    (possibly NS-ladder-tiered) fused BaM update against the exact XLA
    thin-SVD path at the step's own regularizer.

    ``fused_update(eps, vs, mean, f, reg, ns_stats) -> (mean, f, good,
    stiff, kernel_stats)`` — the fitter's tiered kernel, selecting its NS
    tier from the live state's carried feedback stats, so the audit
    exercises the exact tier the fit runs at that step.  Stiff-flagged
    steps are vacuous (the real fit replays them through the SVD path with
    the same draw, so they carry no fused bias): ``valid`` is False and
    errors report 0.
    """
    from ..ops.bam_eps import bam_eps_update

    @jax.jit
    def audit(state, i):
        with jax.default_matmul_precision("float32"):
            eps = jax.random.normal(_audit_key(state.key, i),
                                    (batch_size, d), jnp.float32)
            samples = state.mean + eps @ state.factor.T
            vs = lp_g(samples).astype(jnp.float32)
            reg = jnp.asarray(regf(state.step), jnp.float32)
            m_f, f_f, good_f, stiff, _ = fused_update(
                eps, vs, state.mean, state.factor, reg, state.ns_stats)
            # The accuracy gold: thin SVD resolves the small-space spectrum
            # at additive eps*smax (ops/bam_eps.py), independent of the
            # fitter's routed solver.
            m_x, f_x, good_x = bam_eps_update(eps, vs, state.mean,
                                              state.factor, reg,
                                              solver="svd")
            em, es = _moment_errors(m_f, f_f.astype(jnp.float32),
                                    m_x.astype(jnp.float32),
                                    f_x.astype(jnp.float32))
            valid = jnp.logical_and(jnp.logical_and(good_f, good_x), ~stiff)
            zero = jnp.zeros((), em.dtype)
            return (jnp.where(valid, em, zero), jnp.where(valid, es, zero),
                    valid)

    return audit


def make_audit_hook(audit_fn, log: list, tol: float, label: str):
    """Driver ``state_hook``: run the audit, append a host-side record to
    ``log`` and warn when an ACCEPTED fused step deviates from the exact
    path beyond ``tol`` (relative, on either moment)."""

    def hook(i, state):
        em, es, valid = audit_fn(state, jnp.int32(i))
        rec = {"i": int(i), "mean_err": float(em), "cov_err": float(es),
               "valid": bool(valid)}
        log.append(rec)
        if rec["valid"] and max(rec["mean_err"], rec["cov_err"]) > tol:
            warnings.warn(
                f"{label} fused-step audit at iteration {i}: accepted "
                f"update deviates from the exact path by "
                f"mean_err={rec['mean_err']:.2e} cov_err={rec['cov_err']:.2e}"
                f" (> tol {tol:.1e}) — the Newton-Schulz chain is biased "
                f"at this conditioning; lengthen ns_iters or disable "
                f"use_pallas", stacklevel=2)

    return hook
