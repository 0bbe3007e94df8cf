"""Fully-fused BaM whole-step Pallas kernels (the BaM analog of
fused_step.py — VERDICT r2 item #2).

ops/bam_eps.py already reduces the BaM iteration (reference
``gsmvi/bam.py:31-69``) to factor coordinates: the proposal covariance is the
congruence  S = F W1 (I + Ytil diag(w) Ytil^T) W1^T F^T  where the only
spectral object is the small Gram of Y = W1^T F^T FU (D x (B+1)).  Its XLA
implementation resolves that spectrum by a thin SVD of Y — accurate at
kappa(Y), which is what makes stiff f32 fits converge, but costing ~140 us
in-scan on v5e (the whole step budget at 40k it/s is 25 us).

This module instead evaluates the spectral map as a MATRIX FUNCTION of the
Gram G = Y^T Y with matmul-only Newton-Schulz chains (MXU-friendly, fusable
into one kernel).  The per-eigenvalue weight applied to Y is

    psi(l) = (sqrt(sigma(l)) - 1) / l,   sigma(l) = 2 / (1 + sqrt(1 + 4 l)),

which is regular at l = 0 and, eliminating the division (all terms commute),

    psi(G) = -4 (I + s)^{-2} (I + sqrt(2) (I + s)^{-1/2})^{-1},
    s = sqrt(I + 4 G),  sqrt(sigma(G)) = sqrt(2) (I + s)^{-1/2}

— two Newton-Schulz square roots and one Newton-Hotelling inverse of a
matrix with spectrum in (1, 2].  The proposal is then

    F' = F W1 (I + Y psi(G) Y^T),
    W1 = I + Om ((I + sqrt(I + Om^T Om))^{-1}) Om^T.

STIFFNESS GATE.  Forming G in f32 perturbs its spectrum by ~eps_f32 *
lmax(G) ABSOLUTELY; the weights vary fastest near l ~ 1, so when
lmax >~ 1e4 the map silently mis-contracts O(1)-eigenvalue directions —
the exact failure mode that stalled the Gram-eigh solver's mean on stiff
targets (ops/bam_eps.py docstring; only a kappa-accurate factorization of Y
itself, SVD/QR, survives that regime).  The kernel therefore computes a
cheap upper bound on lmax(G) (row-sum norm) and flags the step STIFF above
``lmax_gate`` instead of accepting a silently-biased update.  The fitter
replays flagged steps through the XLA SVD path (ops/bam_eps.py) — stiffness
is an early-fit transient (lmax ~ reg * |F^T score|^2 / B decays with the
regularizer schedule and as F adapts), so steady-state throughput is the
fused kernel's.

Reference math being matched: ``/root/reference/gsmvi/bam.py:31-69``
(bam_update), via the exact low-rank algebra of ops/bam_eps.py; equivalence
is pinned in tests/test_bam_fused.py against both the XLA SVD path and an
f64 closed-form oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .fused_step import (_HAS_PLTPU, _HI, _VMEM_LIMIT_BYTES,
                         _compiler_params, _newton_inv, _ns_sqrt,
                         _param_bytes, _spd_norm_ub)

if _HAS_PLTPU:
    from jax.experimental.pallas import tpu as pltpu
else:  # pragma: no cover
    pltpu = None

# Newton-Schulz sweep counts (u_sqrt, cu_inv, s1_sqrt, p_invsqrt, w_inv) for
# the five small-space solves, sized for the GATED envelope (both gates
# below) by a CPU accuracy study vs the SVD path (2026-08-18): the cu chain
# (u_sqrt/cu_inv — conditioning ~ gu norm, reg-scaled, bounded by the gu
# gate at ~5e4) keeps 20/13 sweeps; the tau chain (s1/p/w — conditioning
# bounded by the lmax gate at 1e4) trims to 16/11/6.  Map error within the
# envelope: <= ~2e-4 of the SVD result (vs ~1e-4 at the former
# (22,14,22,14,7) — and BOTH tuples silently bias once the gu gate is
# exceeded, which is why the gate exists, not longer chains).  CAUTION: the
# residual gates catch catastrophic loss, NOT slow bias — revalidate map
# error vs the SVD path (tests/test_bam_fused.py) when touching this.
BAM_NS_ITERS_DEFAULT = (20, 13, 16, 11, 6)

# lmax(G) above which the f32 Gram no longer resolves O(1) eigenvalues to
# the ~1e-3 absolute accuracy the contraction weights need near l ~ 1
# (eps_f32 * lmax ~ 1.2e-3 at 1e4).  Tuned against the SVD path: see
# tests/test_bam_fused.py and docs/BENCHMARKS.md.
LMAX_GATE_DEFAULT = 1e4

# Row-sum-norm bound on lmax(Om^T Om) above which the cu chain (whose
# conditioning is reg-scaled and INDEPENDENT of the Y gate — gu norm ~
# reg * lmax(ed Gram) / B ~ 26 * reg at B=32, D=256) goes silently biased
# in f32: measured 5e-3..2e-2 map error WITH residual gates still green at
# gu ~ 2.6e5 (reg ~ 1e4), <= 2e-4 at 2.6e4 (reg ~ 1e3).  Steps above it
# are flagged stiff and replayed on the XLA path.
GU_GATE_DEFAULT = 5e4

# ---- reg-adaptive NS ladder -------------------------------------------------
# The sweep counts above are sized for the WORST gated conditioning, but the
# chains' conditioning is reg-scaled (gu ~ reg * c(B, D)) and BaM schedules
# decay — at steady state (gu ~ 1, lmax ~ a few) the long chains are pure
# sweep waste (each _ns_sqrt sweep = 3 small matmuls, _newton_inv = 2; the
# default profile spends 179 small matmuls per step, the most benign tier
# needs 59).  The ladder below lists (iters, gu_gate, lmax_gate) from
# stiffest to most benign; every tier's gates were set by a map-error fuzz
# vs the SVD path with INDEPENDENT (reg, score-scale, factor-conditioning)
# variation across (B, D) in (8, 32)..(32, 1024) — worst accepted
# in-envelope error 2.8e-4 / 2.5e-4 / 1.4e-4 for tiers 1/2/3 (2026-08-18
# study; the real centered Om construction, per the round-2 lesson).  Steps
# exceeding a tier's in-kernel gates flag stiff and replay through the XLA
# SVD path, so TIER SELECTION IS THROUGHPUT-ONLY — a mis-predicted tier can
# never bias the fit.
BAM_NS_TIERS = (
    (BAM_NS_ITERS_DEFAULT, GU_GATE_DEFAULT, 1e4),
    ((10, 7, 10, 7, 4), 64.0, 1500.0),
    ((7, 5, 8, 5, 4), 14.0, 120.0),
    ((5, 4, 6, 4, 3), 3.0, 12.0),
)

# Measured-feedback ladder (round 3): tier selection from the kernels' OWN
# exported gate statistics instead of a reg-only prediction.  The reg model
# predicts gu well (reg-scaled by construction) but the lmax statistic of
# the Y-Gram is D- and target-scaled: at D=512/1024 it sits 2-4x above the
# benign tiers' gates at the reg-predicted engagement points, so every step
# gate-trips into the ~4-8x-costlier XLA SVD replay (measured -11% @512,
# -3.2x @1024 vs the long profile).  Measured on the bench target, the
# steady-state stats DO pass tier 2 from ~step 600 and tier 3 late-fit at
# all of D=256/512/1024 (.scratch/stat_probe.py, 2026-08-18) — the ladder
# win exists at large D, the predictor was just blind to it.
#
# Contract (trajectory-invariance-preserving): the carried statistic updates
# only at ABSOLUTE step indices that are multiples of FEEDBACK_CADENCE
# (kernel blocks truncate there, so the boundary step's stats are always
# exported regardless of steps_per_call / chunk grouping) and at stiff
# stops (also grouping-invariant: a stiff step stops every grouping's block
# at the same absolute index with the same state).  Tier selection is then
# a pure function of the carried stats, so the whole trajectory stays
# invariant to spc / chunk cadence — the same contract the reg ladder had.
# A mis-predicted window costs at most FEEDBACK_CADENCE replayed steps of
# throughput (the per-tier in-kernel gates remain the accuracy authority).
FEEDBACK_CADENCE = 64
FEEDBACK_MARGIN = 0.7
# Cold-start / post-stiff sentinel: fails every benign gate -> tier 0.
NS_STATS_INIT = (jnp.inf, jnp.inf)


def ns_tier_from_stats(gu_ub, lmax_ub, tiers=BAM_NS_TIERS,
                       margin: float = FEEDBACK_MARGIN):
    """Most benign tier index whose gates the MEASURED stats pass with
    ``margin`` headroom (gates decrease monotonically along the ladder, so
    passing is prefix-monotone and the index is a simple count).  inf stats
    (cold start) select tier 0, the configured long profile."""
    gu_ub = jnp.asarray(gu_ub, jnp.float32)
    lmax_ub = jnp.asarray(lmax_ub, jnp.float32)
    idx = jnp.zeros((), jnp.int32)
    for (_, gg, lm) in tiers[1:]:
        ok = (gu_ub < margin * gg) & (lmax_ub < margin * lm)
        idx = idx + ok.astype(jnp.int32)
    return idx


def predicted_gu_coeff(b: int, d: int) -> float:
    """gu_ub ~ coeff * reg for standard-normal draws: the row-sum norm of
    the (reg/B)-scaled centered-eps Gram concentrates at
    ~ (D + B sqrt(D)) / B * reg (measured 26*reg at B=32, D=256 vs 24
    predicted).  Used only to PREDICT the benign tier; the in-kernel gates
    remain the accuracy authority."""
    return (d + b * float(d) ** 0.5) / b


def ns_tier_thresholds(b: int, d: int, tiers=BAM_NS_TIERS,
                       margin: float = 0.8):
    """LEGACY reg-only tier predictor (diagnostic use only — selection now
    runs on measured feedback, ns_tier_from_stats): reg thresholds
    (descending) at which tiers 1.. engage, tier j predicted non-stiff when
    reg < margin * gu_gate_j / c(B, D).  Blind to the D/target scaling of
    the lmax statistic, which is why it thrashed at D >= 512."""
    c = predicted_gu_coeff(b, d)
    return tuple(margin * gu / c for (_, gu, _) in tiers[1:])


def _ns_sqrt_both(a, iters: int):
    """Coupled Newton-Schulz: returns (sqrt(a), a^{-1/2}) for small SPD
    ``a`` (matmul-only; same scaled iteration as fused_step._ns_sqrt, with
    the Z iterate — which converges to the inverse root — also returned)."""
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=jnp.float32)
    nrm = _spd_norm_ub(a)
    y = a / nrm
    z = eye
    for _ in range(iters):
        t = 0.5 * (3.0 * eye - jnp.dot(z, y,
                                       preferred_element_type=jnp.float32,
                                       precision=_HI))
        y = jnp.dot(y, t, preferred_element_type=jnp.float32, precision=_HI)
        z = jnp.dot(t, z, preferred_element_type=jnp.float32, precision=_HI)
    rt = jnp.sqrt(nrm)
    return y * rt, z / rt


def _bam_smallspace_ns(e, v, mu, f, reg, *, batch: int,
                       iters=BAM_NS_ITERS_DEFAULT,
                       lmax_gate: float = LMAX_GATE_DEFAULT,
                       gu_gate: float = GU_GATE_DEFAULT,
                       tol: float = 3e-3, big_prec=None, ef_t=None):
    """Loop-free BaM factor update on VMEM-sized values.

    Same math as ops/bam_eps.py (one exact rank-(B+1) BaM step in factor
    coordinates) with the small-space spectral map evaluated by the
    matmul-only psi(G) chain above instead of a thin SVD.

    Inputs: ``e`` (B, D) standard-normal draws, ``v`` (B, D) scores at
    ``mu + e @ f.T``, ``mu`` (1, D), ``f`` (D, D), ``reg`` scalar (traced).
    Returns ``(mu_new (1,D), f_new (D,D), good, stiff, gu_ub, lmax_ub)`` —
    ``stiff`` means the Gram gate tripped and the caller must NOT trust
    (and should replay) this step; ``good`` is the accept flag for the
    non-stiff case (NS residual + trace-monotonicity screens, as the XLA
    path); ``gu_ub``/``lmax_ub`` are the two measured gate statistics (the
    row-sum norms of the cu and tau chains' Grams), exported so the fitter
    can drive the measured-feedback NS ladder (ns_tier_from_stats).

    ``big_prec`` relaxes only the O(B D^2) matmuls; all (k, k) small-space
    numerics stay at HIGHEST (their accuracy is what the gates certify).
    """
    b = batch
    d = f.shape[-1]
    bp = _HI if big_prec is None else big_prec
    # Pad the B+1 small dimension to a sublane multiple with zero rows:
    # zeros add null directions (psi regular at 0), leaving the algebra
    # exact while keeping Mosaic tiles aligned.
    kpad = b + 8

    def mm(x, y, prec=_HI):
        return jnp.dot(x, y, preferred_element_type=jnp.float32,
                       precision=prec)

    def mm_t(x, y, prec=_HI):  # x @ y.T
        return jax.lax.dot_general(x, y, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

    def t_mm(x, y, prec=_HI):  # x.T @ y
        return jax.lax.dot_general(x, y, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

    reg = jnp.asarray(reg, jnp.float32)
    r1 = reg / (1.0 + reg)
    epsbar = jnp.mean(e, axis=0, keepdims=True)            # (1, D)
    gbar = jnp.mean(v, axis=0, keepdims=True)              # (1, D)
    ed = e - epsbar
    gd = v - gbar
    sru = jnp.sqrt(reg / b)
    pad = jnp.zeros((kpad - b - 1, d), jnp.float32)
    # Row layouts of the (D, B+1) factors Om, FU of ops/bam_eps.py:33-40.
    om_t = jnp.concatenate([sru * ed, -jnp.sqrt(r1) * epsbar, pad], axis=0)
    fu_t = jnp.concatenate([sru * gd, jnp.sqrt(r1) * gbar, pad], axis=0)

    eye_k = jnp.eye(kpad, dtype=jnp.float32)
    # W1 = I + Om cu Om^T with cu = (I + sqrt(I + Om^T Om))^{-1}.
    gu = mm_t(om_t, om_t)
    gu = 0.5 * (gu + gu.T)
    gu_ub = _spd_norm_ub(gu)
    s_u = _ns_sqrt(eye_k + gu, iters[0])
    s_u = 0.5 * (s_u + s_u.T)
    res_u = jnp.sum((mm(s_u, s_u) - (eye_k + gu)) ** 2) \
        / (jnp.sum((eye_k + gu) ** 2) + 1e-30)
    cu = _newton_inv(eye_k + s_u, iters[1])

    # Y^T = (W1^T Q)^T with Q = F^T FU (ops/bam_eps.py:124-130).
    q_t = mm(fu_t, f, bp)                                  # (kpad, D)
    omq = mm_t(om_t, q_t)                                  # Om^T Q
    y_t = q_t + t_mm(mm(cu, omq), om_t, bp)

    # ---- gated Gram + psi(G) chain --------------------------------------
    g = mm_t(y_t, y_t)                                     # (kpad, kpad)
    g = 0.5 * (g + g.T)
    lmax_ub = _spd_norm_ub(g)
    # Two independent stiffness statistics: the tau chain's Gram (Y-scaled)
    # and the cu chain's (reg-scaled) — either exceeding its f32-resolvable
    # bound flags the step for XLA replay.
    stiff = (lmax_ub > lmax_gate) | (gu_ub > gu_gate)
    a1 = eye_k + 4.0 * g
    s1 = _ns_sqrt(a1, iters[2])
    s1 = 0.5 * (s1 + s1.T)
    res_1 = jnp.sum((mm(s1, s1) - a1) ** 2) / (jnp.sum(a1 ** 2) + 1e-30)
    ips = eye_k + s1                                       # spectrum [2, ..]
    _, p = _ns_sqrt_both(ips, iters[3])                    # (I+s)^{-1/2}
    p = 0.5 * (p + p.T)
    res_p = jnp.sum((mm(mm(p, p), ips) - eye_k) ** 2) / kpad
    winv = _newton_inv(eye_k + jnp.sqrt(2.0) * p, iters[4])
    p2 = mm(p, p)                                          # (I+s)^{-1}
    tau = -4.0 * mm(mm(p2, p2), winv)
    tau = 0.5 * (tau + tau.T)

    # F' = F W1 (I + Y tau Y^T) = F + U1 w1row + (Fw1 Y) tau Y^T, applied
    # as ONE (D, 2*kpad) fat contraction — the round-5 op-count/F-traffic
    # restructure (same scheme as fused_step._eps_smallspace_ns).  All
    # Fw1-dependent row objects come from already-available products:
    #   (F Om)^T  = Om^T F^T, linear in the sampling product ef = e F^T;
    #   Y^T F^T   = Q^T F^T + (cu Om^T Q)^T (F Om)^T;
    #   (Fw1 Y)^T = Y^T F^T + (Y^T w1row^T) (F Om)^T.
    # Fw1 itself is never materialized; its Frobenius norm (the S' <= V
    # numerical-loss screen of the XLA path, ops/bam_eps.py:172-181) is
    # assembled from small Grams: ||F W1||^2 = ||F||^2 + 2 tr(cu Gfom)
    # ... via <F, U1 w1row> = sum((cu (F Om)^T) o (F Om)^T) and
    # ||U1 w1row||^2 = sum((U1^T U1) o (w1row w1row^T)).
    if ef_t is None:
        fom_t = mm_t(om_t, f, bp)                          # (F Om)^T
        ef_bar = None
    else:
        ef_bar = jnp.mean(ef_t, axis=0, keepdims=True)     # epsbar F^T
        fom_t = jnp.concatenate(
            [sru * (ef_t - ef_bar), -jnp.sqrt(r1) * ef_bar,
             jnp.zeros((kpad - b - 1, d), jnp.float32)], axis=0)
    w1row = mm(cu, om_t)                                   # (kpad, D)
    cu_omq = mm(cu, omq)
    qf = mm_t(q_t, f, bp)                                  # Q^T F^T
    yf = qf + t_mm(cu_omq, fom_t)                          # Y^T F^T
    yw1 = mm_t(y_t, w1row)                                 # (kpad, kpad)
    fyT = yf + mm(yw1, fom_t)                              # (Fw1 Y)^T
    u2row = mm(tau, fyT)                                   # (Fw1 Y tau)^T
    stack_u = jnp.concatenate([fom_t, u2row], axis=0)      # (2 kpad, D)
    stack_w = jnp.concatenate([w1row, y_t], axis=0)
    f_new = f + t_mm(stack_u, stack_w, bp)
    w1f = mm(cu, fom_t)                                    # w1row F^T
    tr_v = (jnp.sum(f * f) + 2.0 * jnp.sum(w1f * fom_t)
            + jnp.sum(mm_t(fom_t, fom_t) * mm_t(w1row, w1row)))
    tr_new = jnp.sum(f_new * f_new)
    good = (jnp.isfinite(tr_new)
            & (tr_new <= 1.05 * tr_v + 1e-6)
            & (res_u < tol) & (res_1 < tol) & (res_p < tol))

    # mu' = mu/(1+reg) + r1 (S' gbar + xbar) through the factors.
    t1 = mm(gbar, f_new, bp)                               # gbar^T F'
    s_gbar = mm_t(t1, f_new, bp)                           # (1, D)
    xbar = mu + (ef_bar if ef_bar is not None
                 else mm_t(epsbar, f, bp))
    mu_new = mu / (1.0 + reg) + r1 * (s_gbar + xbar)
    return mu_new, f_new, good, stiff, gu_ub, lmax_ub


def bam_fused_supported(b: int, d: int, steps_per_call: int = 1,
                        itemsize: int = 4, param_shapes=None) -> bool:
    """VMEM gate for the fused BaM kernels (mirrors fused_supported).

    Budget: f in/out + fw1/fy/f_new intermediates (~6 D^2), the
    ``steps_per_call`` external eps block, ~8 (B, D) row tensors, ~12
    (B+8)^2 small tiles, and the score params at their real sizes.

    Batch cap (round 5): at B > 128 the five NS chains run on
    (B+8)^2 >~ 136^2 tiles — the kernel is measured slower than the XLA
    SVD route there (~1k it/s at B=512/D=256) and the restructured kernel
    at B=512 overwhelms the Mosaic compiler (remote-compile 500s); large-B
    BaM legitimately belongs to the XLA path."""
    if not _HAS_PLTPU:
        return False
    if b < 4 or b % 4 != 0 or b > 128:
        return False
    kpad = b + 8
    vmem = 6 * d * d * itemsize + 2 * steps_per_call * b * d * itemsize \
        + 8 * b * d * itemsize + 12 * kpad * kpad * itemsize \
        + 2 * _param_bytes(param_shapes, d, itemsize)
    return vmem < _VMEM_LIMIT_BYTES


def _update_kernel(reg_ref, eps_ref, vs_ref, mu_ref, f_ref,
                   mu_out, f_out, flags_out, stats_out, *, batch: int,
                   iters, lmax_gate: float, gu_gate: float, big_prec):
    mu_new, f_new, good, stiff, gu_ub, lmax_ub = _bam_smallspace_ns(
        eps_ref[:], vs_ref[:], mu_ref[:], f_ref[:], reg_ref[0],
        batch=batch, iters=iters, lmax_gate=lmax_gate, gu_gate=gu_gate,
        big_prec=big_prec)
    keep = good & ~stiff
    mu_out[:] = jnp.where(keep, mu_new, mu_ref[:])
    f_out[:] = jnp.where(keep, f_new, f_ref[:])
    flags_out[0, 0] = keep.astype(jnp.int32)
    flags_out[0, 1] = stiff.astype(jnp.int32)
    stats_out[0, 0] = gu_ub
    stats_out[0, 1] = lmax_ub


@functools.partial(jax.jit, static_argnames=("interpret", "iters",
                                             "lmax_gate", "gu_gate",
                                             "big_prec"))
def bam_eps_update_fused(eps, vs, mean, f, reg, interpret: bool = False,
                         iters=BAM_NS_ITERS_DEFAULT,
                         lmax_gate: float = LMAX_GATE_DEFAULT,
                         gu_gate: float = GU_GATE_DEFAULT,
                         big_prec=None):
    """Fused BaM factor update + validity + select, one Pallas call.

    Drop-in for the accept half of ops/bam_eps.py: returns
    ``(mean, f, good, stiff, ns_stats)`` with the old state already selected
    back unless the proposal is both good and non-stiff.  ``stiff`` tells
    the caller to redo this step on the XLA SVD path (same eps for exact
    semantics); ``ns_stats`` is the measured ``(gu_ub, lmax_ub)`` pair
    (shape (2,), f32) feeding the feedback NS ladder.  f32 only.
    """
    b, d = eps.shape
    dtype = jnp.float32
    eps = eps.astype(dtype)
    vs = vs.astype(dtype)
    mu2 = mean.astype(dtype).reshape(1, d)
    f = f.astype(dtype)
    reg = jnp.asarray(reg, dtype).reshape(1)

    kernel = functools.partial(_update_kernel, batch=b, iters=iters,
                               lmax_gate=lmax_gate, gu_gate=gu_gate,
                               big_prec=big_prec)
    smem = (dict(memory_space=pltpu.SMEM) if _HAS_PLTPU else {})
    vmem = (dict(memory_space=pltpu.VMEM) if _HAS_PLTPU else {})
    mu_new, f_new, flags, stats = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, d), dtype),
            jax.ShapeDtypeStruct((d, d), dtype),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(**smem)] + [pl.BlockSpec(**vmem)] * 4,
        out_specs=(pl.BlockSpec(**vmem), pl.BlockSpec(**vmem),
                   pl.BlockSpec(**smem), pl.BlockSpec(**smem)),
        interpret=interpret,
        **({"compiler_params": _compiler_params(interpret)}
           if _compiler_params(interpret) else {}),
    )(reg, eps, vs, mu2, f)
    return mu_new[0], f_new, flags[0, 0] > 0, flags[0, 1] > 0, stats[0]


def make_fused_bam_multistep(score_fn, n_params: int, batch: int, d: int,
                             steps_per_call: int,
                             iters=BAM_NS_ITERS_DEFAULT,
                             lmax_gate: float = LMAX_GATE_DEFAULT,
                             gu_gate: float = GU_GATE_DEFAULT,
                             big_prec=None, interpret: bool = False):
    """Up to ``steps_per_call`` whole BaM iterations per kernel invocation.

    The step is sample -> score (``score_fn`` traced in-kernel) -> fused
    update; the eps block for all sub-steps arrives EXTERNALLY as a
    ``(spc*B, D)`` array (unlike the GSM multistep's on-chip PRNG) so that

    - a stiff or rejected sub-step can be REPLAYED at the XLA level with the
      IDENTICAL draw (exact reference retry semantics), and
    - the kernel runs bit-comparably under interpret mode on CPU CI.

    The kernel consumes sub-steps until the first one that is stiff (Gram
    gate) or — when ``stop_on_reject`` is set at call time via ``nmax`` —
    not accepted, then freezes.  Returns
    ``step(regs, nmax, stop_on_reject, eps_block, mean, f, *params) ->
    (mean, f, n_done, n_acc, stopped_kind, ns_stats)`` where ``n_done``
    counts consumed sub-steps, ``n_acc`` accepted ones among them,
    ``stopped_kind`` is 0 (ran to nmax), 1 (stiff), 2 (PD-reject with
    stop_on_reject), and ``ns_stats`` is the (gu_ub, lmax_ub) pair of the
    LAST ATTEMPTED sub-step (the stopping one on a stiff/reject stop, the
    last consumed one otherwise) — the measurement behind the feedback NS
    ladder.  The caller loops/replays to advance exactly its chunk.
    """
    if not _HAS_PLTPU and not interpret:
        raise RuntimeError("fused BaM multistep requires TPU pallas")
    spc = steps_per_call

    def kernel(regs_ref, nmax_ref, sor_ref, eps_ref, mu_ref, f_ref, *rest):
        params = [p[:] for p in rest[:n_params]]
        mu_out, f_out, stats_out, ns_out = rest[n_params:]
        nmax = nmax_ref[0]
        stop_on_reject = sor_ref[0] > 0

        def body(j, carry):
            mu, f, n_done, n_acc, stopped, gu_last, lm_last = carry
            active = (j < nmax) & (stopped == 0)
            e = eps_ref[pl.ds(j * batch, batch), :]
            ef = jax.lax.dot_general(
                e, f, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_HI if big_prec is None else big_prec)
            x = mu + ef
            v = score_fn(x, *params)
            mu_new, f_new, good, stiff, gu_ub, lmax_ub = _bam_smallspace_ns(
                e, v, mu, f, regs_ref[j], batch=batch, iters=iters,
                lmax_gate=lmax_gate, gu_gate=gu_gate, big_prec=big_prec,
                ef_t=ef)
            stop_now = active & (stiff | (stop_on_reject & ~good))
            consume = active & ~stop_now
            accept = consume & good
            mu = jnp.where(accept, mu_new, mu)
            f = jnp.where(accept, f_new, f)
            # Stats of the last ATTEMPTED sub-step: frozen once stopped.
            gu_last = jnp.where(active, gu_ub, gu_last)
            lm_last = jnp.where(active, lmax_ub, lm_last)
            n_done = n_done + consume.astype(jnp.int32)
            n_acc = n_acc + accept.astype(jnp.int32)
            stopped = jnp.where(
                stop_now,
                jnp.where(stiff, jnp.int32(1), jnp.int32(2)),
                stopped)
            return mu, f, n_done, n_acc, stopped, gu_last, lm_last

        zero = jnp.zeros((), jnp.int32)
        inf = jnp.full((), jnp.inf, jnp.float32)
        mu, f, n_done, n_acc, stopped, gu_last, lm_last = jax.lax.fori_loop(
            0, spc, body, (mu_ref[:], f_ref[:], zero, zero, zero, inf, inf))
        mu_out[:] = mu
        f_out[:] = f
        stats_out[0, 0] = n_done
        stats_out[0, 1] = n_acc
        stats_out[0, 2] = stopped
        ns_out[0, 0] = gu_last
        ns_out[0, 1] = lm_last

    smem = (dict(memory_space=pltpu.SMEM) if _HAS_PLTPU else {})
    vmem = (dict(memory_space=pltpu.VMEM) if _HAS_PLTPU else {})

    @jax.jit
    def step(regs, nmax, stop_on_reject, eps_block, mean, f, *params):
        mu2 = mean.astype(jnp.float32).reshape(1, d)
        regs = jnp.asarray(regs, jnp.float32).reshape(spc)
        nmax = jnp.asarray(nmax, jnp.int32).reshape(1)
        sor = jnp.asarray(stop_on_reject, jnp.int32).reshape(1)
        eps_block = eps_block.astype(jnp.float32).reshape(spc * batch, d)
        mu_new, f_new, stats, ns_stats = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((1, d), jnp.float32),
                jax.ShapeDtypeStruct((d, d), jnp.float32),
                jax.ShapeDtypeStruct((1, 3), jnp.int32),
                jax.ShapeDtypeStruct((1, 2), jnp.float32),
            ),
            in_specs=[pl.BlockSpec(**smem)] * 3
            + [pl.BlockSpec(**vmem)] * (3 + n_params),
            out_specs=(pl.BlockSpec(**vmem), pl.BlockSpec(**vmem),
                       pl.BlockSpec(**smem), pl.BlockSpec(**smem)),
            interpret=interpret,
            **({"compiler_params": _compiler_params(interpret)}
               if _compiler_params(interpret) else {}),
        )(regs, nmax, sor, eps_block, mu2, f.astype(jnp.float32),
          *[p.astype(jnp.float32) for p in params])
        return (mu_new[0], f_new, stats[0, 0], stats[0, 1], stats[0, 2],
                ns_stats[0])

    return step
