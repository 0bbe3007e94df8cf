"""Factorized GSM: covariance tracked as S = F F^T, no Cholesky in the hot loop.

Motivation.  The dense GSM step (ops/gsm.py + state.accept_or_revert) pays an
O(D^3) Cholesky every iteration — needed both for sampling and for the
validity check.  On TPU the Cholesky is the step's bottleneck: it is a
panel-sequential algorithm that maps poorly to the MXU, while everything else
in GSM is matmuls.  This module reformulates the iteration so the hot loop is
*matmul-only*:

State: a (non-triangular) factor ``F`` with ``S = F F^T`` and its maintained
inverse ``Finv``.  Sampling needs only ``x = mu + eps @ F.T`` (any square
factor works — triangularity is a Cholesky artifact).  The GSM covariance
delta is rank-2B:

    S' = S + U U^T - V V^T,     U = A^T/sqrt(B),  V = Bm^T/sqrt(B)

which conjugates into the factor as

    S' = F (I + P J P^T) F^T,   P = Finv [U, V]  (D x 2B), J = diag(I, -I)

and the middle term admits an exact square factor of the same low-rank form:

    I + P J P^T = (I + P C P^T)(I + P C P^T)^T

with symmetric C solving 2C + C G C = J, G = P^T P.  Substituting
X = G^{1/2} C G^{1/2} gives (I + X)^2 = I + H with H = G^{1/2} J G^{1/2}, so

    C = G^{-1/2} ( (I + H)^{1/2} - I ) G^{-1/2}

— computable from two (2B x 2B) symmetric eigendecompositions.  The update
and its inverse are then rank-2B corrections:

    F'    = F + (F P) C P^T
    Finv' = Finv + P Ct (P^T Finv),   Ct = -(I + C G)^{-1} C     (Woodbury)

Cost per step: a handful of (D x 2B)-shaped matmuls — O(B D^2) — plus O(B^3)
small-matrix work.  No D x D factorization anywhere.

Validity check, exactly: S' is PD  <=>  I + H is PD (similar matrices up to
congruence), so the goodness test is ``min eig(I + H) > tol`` — a byproduct of
the eigh we already compute, replacing the reference's host Cholesky-and-NaN
probe (``gsmvi/gsm.py:136-150``) with a *sharper* on-device criterion.

Drift: Finv is corrected by exact Woodbury algebra each step; consistency
error (||Finv F - I||) grows only in accumulated rounding.  ``refresh``
re-orthogonalizes both from the dense covariance at a configurable cadence
(default: every 1000 steps) for long runs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def factor_gsm_step_stats(samples, vs, mu0, F, Finv):
    """One factorized GSM update.

    Inputs: samples/vs (B, D); mu0 (D,); F, Finv (D, D) with S = F F^T.
    Returns (dmu, F_new, Finv_new, good) — ``good`` is the exact PD check of
    the proposed covariance; callers select old/new state on it.
    """
    b, d = samples.shape
    dtype = F.dtype

    # --- GSM mean update (identical math to ops/gsm.py, S applied as F F^T) ---
    a = mu0 - samples                                    # (B, D)
    t = (vs @ F) @ F.T                                   # rows S0 @ v_b
    vsv = jnp.sum(vs * t, axis=-1)
    mv = jnp.sum(a * vs, axis=-1)
    rho = 0.5 * (jnp.sqrt(1.0 + 4.0 * (vsv + mv * mv)) - 1.0)
    eps0 = t - a
    w = jnp.sum(vs * eps0, axis=-1)
    dmu_b = (eps0 - a * (w / (1.0 + rho + mv))[:, None]) / (1.0 + rho)[:, None]
    bm = a + dmu_b
    dmu = jnp.mean(dmu_b, axis=0)

    # --- rank-2B factor update ---
    scale = 1.0 / jnp.sqrt(jnp.asarray(b, dtype))
    uv = jnp.concatenate([a.T, bm.T], axis=1) * scale    # (D, 2B): [U, V]
    p = Finv @ uv                                        # (D, 2B)
    g = p.T @ p                                          # (2B, 2B)
    g = 0.5 * (g + g.T)
    jj = jnp.concatenate([jnp.ones(b, dtype), -jnp.ones(b, dtype)])

    gw, gq = jnp.linalg.eigh(g)
    gw = jnp.maximum(gw, 1e-12 * jnp.maximum(gw[-1], 1.0))
    g_half = (gq * jnp.sqrt(gw)) @ gq.T
    g_ihalf = (gq / jnp.sqrt(gw)) @ gq.T

    h = g_half * jj @ g_half                             # G^{1/2} J G^{1/2}
    m = jnp.eye(2 * b, dtype=dtype) + 0.5 * (h + h.T)
    mw, mq = jnp.linalg.eigh(m)
    good = mw[0] > 1e-8                                  # exact PD criterion
    mw_safe = jnp.maximum(mw, 1e-12)
    sqrt_m = (mq * jnp.sqrt(mw_safe)) @ mq.T
    x = sqrt_m - jnp.eye(2 * b, dtype=dtype)
    c = g_ihalf @ x @ g_ihalf
    c = 0.5 * (c + c.T)

    # F' = F + (F P) C P^T
    fp = F @ p
    f_new = F + fp @ (c @ p.T)
    # Finv' = Finv + P Ct (P^T Finv), Ct = -(I + C G)^{-1} C
    ct = -jnp.linalg.solve(jnp.eye(2 * b, dtype=dtype) + c @ g, c)
    finv_new = Finv + p @ (ct @ (p.T @ Finv))

    return dmu, f_new, finv_new, good


@partial(jax.jit, static_argnums=(2,))
def factor_refresh(F, Finv, newton_steps: int = 2):
    """Tighten Finv against F with Newton iterations (Finv <- Finv(2I - F Finv)).

    Quadratic convergence: each step squares the residual ||I - F Finv||.
    O(D^3) matmuls (MXU-fast), intended for occasional use, not the hot loop.
    """
    d = F.shape[0]
    eye = jnp.eye(d, dtype=F.dtype)

    def body(_, inv):
        return inv @ (2.0 * eye - F @ inv)

    return jax.lax.fori_loop(0, newton_steps, body, Finv)


def factor_to_cov(F):
    """Materialize the dense covariance S = F F^T (checkpoints/monitors only)."""
    s = F @ F.T
    return 0.5 * (s + s.T)
