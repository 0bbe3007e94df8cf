"""Fully-fused eps-coordinate GSM step as Pallas TPU kernels.

The measured per-step regime on v5e is OP-COUNT-bound: ~8.6us fixed cost per
XLA op inside a scan, with the D x D Cholesky of the dense path alone costing
~44us at D=256 (XLA's chol is a panel-sequential While loop of many small
ops).  These kernels collapse the *whole* reference iteration
(``gsmvi/gsm.py:107-129``: sample -> score -> update -> validity -> revert)
into one or two Pallas calls:

- ``gsm_eps_update_fused``  — everything after the score: the eps-coordinate
  rank-2B factor update of ops/gsm_eps.py (same math, bit-comparable), with
  the two (2B x 2B) Cholesky factorizations, the triangular inverse, the
  exact PD check, and the accept/revert select all inside the kernel.  A step
  becomes: [eps op] -> [sample matmul] -> [user lp_g] -> [this kernel].
- ``make_fused_eps_step`` / ``make_fused_eps_multistep`` — the whole step
  as ONE kernel for targets whose score is Pallas-traceable (e.g. the
  analytic dense-Gaussian family): sampling matmul, score, update, validity
  and select all stay in VMEM; the multistep variant loops steps_per_call
  iterations per invocation (dispatch amortizer).  One HBM round-trip per
  invocation, total.

The small-space sequential work is 3 loops of 2B steps each (two Choleskys +
one triangular inverse) over (2B x 2B) tiles — D-independent, unlike the
dense path's D-step Cholesky.

Numerics: f32 with explicit HIGHEST-precision matmuls (matching the pinned
whole-step f32 policy of the jnp path).  Since round 5 the fitter-facing
whole-step path draws eps EXTERNALLY per ABSOLUTE step
(``normal(fold_in(key, step))``, the BaM fused scheme): trajectories are
invariant to steps_per_call/chunk cadence, exactly replayable at the XLA
level, and interpret-testable on CPU.  The in-kernel hardware-PRNG variant
(``make_fused_eps_step(external_eps=False)``) remains for A/B timing only —
its Box-Muller stream differs from jax.random's threefry and cannot be
replayed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu import fails on some non-TPU builds; gate it.
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

# Mosaic's DEFAULT scoped-VMEM cap is ~16 MB — far below the chip's physical
# VMEM (128 MiB on v5e).  We raise the cap per-kernel via
# CompilerParams(vmem_limit_bytes=...) so D=1024 (measured ~22-27 MB scoped
# incl. score params) compiles; the gate below keeps a safety margin.
_VMEM_LIMIT_BYTES = 96 * 1024 * 1024
_HI = jax.lax.Precision.HIGHEST
# Validated Newton-Schulz sweep counts (sqrt1, inv1, inv2, sqrt2, inv3) for
# the in-kernel small space — the measured accuracy/speed frontier with the
# sharp inf-norm seed (docs/BENCHMARKS.md).  Single source of truth: every
# factory and FactorGSM default this tuple — FOR B <= 32, where it was
# tuned.  Round-5 finding: the profile is BATCH-dependent — at B >= 64 the
# (B, B) Grams' spectra widen and the short chains go silently biased
# (zero rejections, converged cov_err 0.012/0.049/0.21 at B=64/128/512 on
# the D=256 bench target) while the longer profile below matches the exact
# Cholesky path (2e-4/1.9e-4/3.7e-3) — measured CPU study 2026-08-21,
# .scratch/r5_bstudy*.log.  Use ``ns_iters_for_batch``.
NS_ITERS_DEFAULT = (5, 4, 6, 7, 4)
NS_ITERS_LARGE_B = (8, 6, 9, 10, 6)


def ns_iters_for_batch(b: int, override=None):
    """Batch-aware default NS profile (round 5): the short profile is
    validated at B <= 32 only; larger Monte-Carlo batches need the longer
    chains (see NS_ITERS_DEFAULT note).  ``override`` wins when given."""
    if override is not None:
        return tuple(override)
    return NS_ITERS_DEFAULT if b <= 32 else NS_ITERS_LARGE_B


def _compiler_params(interpret: bool):
    """Raised VMEM cap for the real-TPU compile (ignored under interpret)."""
    if interpret or not _HAS_PLTPU:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)


def _param_bytes(param_shapes, d: int, itemsize: int = 4) -> int:
    """VMEM bytes for the pallas_score parameter arrays at their REAL sizes
    (default: one D x D param, the analytic-Gaussian precision).  Mosaic
    pads the trailing two dims to the (8, 128) tile — approximated by a
    per-array floor."""
    if param_shapes is None:
        return d * d * itemsize
    total = 0
    for shp in param_shapes:
        n = 1
        for s in shp:
            n *= max(int(s), 1)
        total += max(n, 8 * 128) * itemsize
    return total


def fused_supported(b: int, d: int, itemsize: int = 4,
                    param_shapes=None, steps_per_call: int = 1) -> bool:
    """Gate: shapes the single-program kernel handles well.

    2B x 2B small tiles want sublane alignment (B multiple of 4); the row
    tensors, both D x D mats, and the score params must fit the raised
    scoped-VMEM cap alongside ~12 (B, D) intermediates.

    ``param_shapes`` — shapes of the ``pallas_score`` parameter arrays; the
    budget uses their REAL byte sizes (a logreg xdata (N, D) or GMM means
    (K, D) can dwarf the default D x D assumption and must fall back to XLA
    rather than fail Mosaic compilation near the cap).  Default: one D x D
    param (the analytic-Gaussian precision).

    ``steps_per_call`` — sub-steps per multistep-kernel invocation; the
    externally-drawn ``(spc*B, D)`` eps block rides in VMEM.
    """
    if not _HAS_PLTPU:
        return False
    if b < 4 or b % 4 != 0:
        return False
    # 6x D^2: f in/out + the multi-step fori_loop's carry double-buffering;
    # + the external eps block + the score params at their real sizes.
    vmem = 6 * d * d * itemsize + 16 * b * d * itemsize \
        + 2 * steps_per_call * b * d * itemsize \
        + 8 * (2 * b) * (2 * b) * itemsize \
        + 2 * _param_bytes(param_shapes, d, itemsize)
    return vmem < _VMEM_LIMIT_BYTES


def _row_iota(k):
    return jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)


def _col_iota(k):
    return jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)


def _cholt_inplace(w_ref, lt_ref, k: int):
    """In-kernel Cholesky of the (k, k) SPD matrix in ``w_ref``, writing the
    TRANSPOSED factor L^T (upper) into ``lt_ref``.  Destroys ``w_ref``.

    Row-oriented on purpose: Mosaic only allows dynamic slicing on the
    sublane (second-to-last) dimension, and since W is symmetric its j-th
    column equals its j-th row — so the classic right-looking sweep runs
    entirely on row slices.  Returns the minimum pivot; the matrix is PD iff
    it is > 0 (the exact validity criterion)."""
    cols = _col_iota(k)

    def body(j, minpiv):
        row = w_ref[pl.ds(j, 1), :]                        # (1, k) = col j of W
        # Pivot via masked reduction (value-space dynamic_slice does not
        # lower on TPU Pallas).
        piv = jnp.sum(jnp.where(cols == j, row, 0.0))
        minpiv = jnp.minimum(minpiv, piv)
        inv = jax.lax.rsqrt(jnp.maximum(piv, 1e-30))
        lrow = jnp.where(cols >= j, row * inv, 0.0)        # (1, k) = L[:,j]^T
        lt_ref[pl.ds(j, 1), :] = lrow
        w_ref[:] = w_ref[:] - jax.lax.dot_general(
            lrow, lrow, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)
        return minpiv

    return jax.lax.fori_loop(0, k, body, jnp.inf, unroll=False)


def _triu_inv_inplace(lt_ref, m_ref, k: int):
    """In-kernel inverse of the (k, k) upper-triangular ``lt_ref`` into
    ``m_ref`` (also upper) via backward substitution, row slices only."""
    cols = _col_iota(k)
    m_ref[:] = jnp.zeros((k, k), jnp.float32)

    def body(i, _):
        j = k - 1 - i
        ltrow = lt_ref[pl.ds(j, 1), :]                     # (1, k)
        piv = jnp.sum(jnp.where(cols == j, ltrow, 0.0))
        acc = jnp.dot(ltrow, m_ref[:], preferred_element_type=jnp.float32,
                      precision=_HI)                       # (1, k)
        ej = (cols == j).astype(jnp.float32)
        m_ref[pl.ds(j, 1), :] = (ej - acc) / piv
        return 0

    jax.lax.fori_loop(0, k, body, 0, unroll=False)


def _spd_norm_ub(a):
    """Cheap sharp upper bound on lambda_max of small SPD ``a``: the row-sum
    (infinity) norm.  The Frobenius norm over-estimates lambda_max by up to
    sqrt(k) (k=2B=64: ~8x), which parks the scaled spectrum far below 1 and
    wastes Newton-Schulz sweeps in the linear warm-up phase — measured, the
    tighter bound buys the same accuracy in ~2/3 of the sweeps."""
    return jnp.max(jnp.sum(jnp.abs(a), axis=-1)) + 1e-30


def _ns_sqrt(a, iters: int):
    """Newton-Schulz SPD square root on a small VMEM value (matmul-only,
    statically unrolled — no loop machinery, the in-kernel fast path)."""
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=jnp.float32)
    nrm = _spd_norm_ub(a)
    y = a / nrm
    z = eye
    for _ in range(iters):
        t = 0.5 * (3.0 * eye - jnp.dot(z, y, preferred_element_type=jnp.float32,
                                       precision=_HI))
        y = jnp.dot(y, t, preferred_element_type=jnp.float32, precision=_HI)
        z = jnp.dot(t, z, preferred_element_type=jnp.float32, precision=_HI)
    return y * jnp.sqrt(nrm)


def _newton_inv(a, iters: int):
    """Newton-Hotelling inverse of a small SPD value (matmul-only).

    X0 = I/c with c >= lambda_max gives ||I - A X0|| < 1 for SPD A, so the
    iteration X <- X(2I - A X) always converges; ~log2(cond)+5 iterations
    suffice.  c is the sharp row-sum bound (see _spd_norm_ub)."""
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=jnp.float32)
    x = eye * (1.0 / _spd_norm_ub(a))
    for _ in range(iters):
        x = jnp.dot(x, 2.0 * eye - jnp.dot(a, x,
                                           preferred_element_type=jnp.float32,
                                           precision=_HI),
                    preferred_element_type=jnp.float32, precision=_HI)
    return x


def _eps_smallspace_ns(e, v, vf, mu, f, *, batch: int, tol: float = 3e-3,
                       iters=NS_ITERS_DEFAULT, skip_small: bool = False,
                       big_prec=None, ef_t=None):
    """Loop-free small-space core: two-phase (PSD update then PSD downdate)
    factorization of M = I + (eps^T eps - C^T C)/B with matmul-only
    Newton-Schulz/Newton-Hotelling small solves.

    Returns (mu_new, f_new, good).  ``good`` combines the PD criterion
    (I - Gv > 0, detected by the NS residual — NS cannot converge on an
    indefinite input) with accuracy gates on both phase residuals, so a
    numerically-lost step rejects rather than corrupting the factor.
    All functions here are scalar functions of the two small Grams:
        cu  = (I + S1)^{-1},        S1 = sqrt(I + Gu)
        cui = (I + S1 + Gu)^{-1}                       (= W1^{-1} coefficient)
        cv  = -(I + S2)^{-1},       S2 = sqrt(I - Gv)

    ``big_prec`` (default HIGHEST) relaxes ONLY the O(B D^2) matmuls (the
    FLOP-dominant ones at large D); the (B, B) small-space numerics — whose
    accuracy the PD gates depend on — always run at HIGHEST.

    ``ef_t`` — optional precomputed ``e @ F^T`` (B, D).  Every caller
    already forms this product for sampling (``x = mu + e @ F^T``); passing
    it in removes a duplicate O(B D^2) contraction.

    ROUND-5 RESTRUCTURE (op-count / F-traffic minimization — measured on
    v5e, the batched-replica XLA step is HBM-traffic-bound on the (K, D, D)
    factor and the in-kernel step is MXU-pass-bound, NOT FLOP-bound):
    the two rank-B factor corrections apply as ONE (D, 2B) @ (2B, D)
    contraction (same exact algebra, better MXU K-dim utilization), and
    the (Fw1 Xi~)^T row tensor is formed from already-available row
    objects (ef_t, t) instead of a fresh O(B D^2) contraction against Fw1:
        Xi~^T F^T = zc (C F^T - (cui Ec) (E F^T)),  C F^T = -gamma ef + r t
        (Fw1 Xi~)^T = Xi~^T F^T + (Xi~^T W1row^T) U1row.
    Net: 5 F-sized contractions per step (ef, score, vf, t, fat-apply)
    instead of 8, and the factor is read/written once.
    """
    b = batch
    bp = _HI if big_prec is None else big_prec

    def mm(x, y, prec=_HI):
        return jnp.dot(x, y, preferred_element_type=jnp.float32,
                       precision=prec)

    def mm_t(x, y, prec=_HI):
        return jax.lax.dot_general(x, y, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

    def t_mm(x, y, prec=_HI):
        return jax.lax.dot_general(x, y, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=prec)

    ef = mm_t(e, f, bp) if ef_t is None else ef_t          # (B, D)
    a = -ef                                                # rows mu - x
    t = mm_t(vf, f, bp)
    vsv = jnp.sum(v * t, axis=1, keepdims=True)
    mv = jnp.sum(a * v, axis=1, keepdims=True)
    rho = 0.5 * (jnp.sqrt(1.0 + 4.0 * (vsv + mv * mv)) - 1.0)
    eps0 = t - a
    w = jnp.sum(v * eps0, axis=1, keepdims=True)
    den = 1.0 + rho + mv
    inv1r = 1.0 / (1.0 + rho)
    dmu_b = (eps0 - a * (w / den)) * inv1r
    dmu = jnp.sum(dmu_b, axis=0, keepdims=True) / b        # (1, D)
    gamma = 1.0 - (1.0 + w / den) * inv1r
    c = -e * gamma + vf * inv1r                            # (B, D) downdate rows
    scale2 = 1.0 / b
    eye_b = jnp.eye(b, dtype=jnp.float32)

    if skip_small:  # timing probes only: phase structure without small math
        return mu + dmu, f + 0.0 * mm_t(c, c)[:1, :1].sum() * f, \
            jnp.bool_(True)

    # Phase 1: W1 = I + Zu cu Zu^T factors I + Zu Zu^T, Zu = eps^T/sqrt(B).
    gu = mm_t(e, e) * scale2                               # (B, B)
    gu = 0.5 * (gu + gu.T)
    s1 = _ns_sqrt(eye_b + gu, iters[0])
    s1 = 0.5 * (s1 + s1.T)
    res1 = jnp.sum((mm(s1, s1) - (eye_b + gu)) ** 2) \
        / (jnp.sum((eye_b + gu) ** 2) + 1e-30)
    cu = _newton_inv(eye_b + s1, iters[1])
    cui = _newton_inv(eye_b + s1 + gu, iters[2])

    # Xi~ = W1^{-1} Zc with Zc = C^T/sqrt(B) and W1^{-1} = I - Zu cui Zu^T.
    # Carried as its transpose on row tensors:
    #   Xi~^T = [C - (cui @ (Zu^T Zc scaled)) applied through eps] / sqrt(B).
    ec = mm_t(e, c) * scale2                               # B Zu^T Zc (B, B)
    zc_scale = 1.0 / jnp.sqrt(jnp.float32(b))
    cuiec = mm(cui, ec)                                    # (B, B)
    xim_t = (c - t_mm(cuiec, e)) * zc_scale                # (B, D)

    # Phase 2: downdate by Xi~ Xi~^T.
    gv = mm_t(xim_t, xim_t)                                # (B, B)
    gv = 0.5 * (gv + gv.T)
    i_gv = eye_b - gv
    s2 = _ns_sqrt(i_gv, iters[3])
    s2 = 0.5 * (s2 + s2.T)
    res2 = jnp.sum((mm(s2, s2) - i_gv) ** 2) / (jnp.sum(i_gv ** 2) + 1e-30)
    cv = -_newton_inv(eye_b + s2, iters[4])
    good = (res1 < tol) & (res2 < tol)

    # F' = F W1 W2 = (F + U1 W1row)(I + Xi~ cv Xi~^T)
    #    = F + U1 W1row + (Fw1 Xi~) (cv Xi~^T)
    # with U1 = F Zu (carried transposed as rows), W1row = cu Zu^T.
    u1row = a * (-zc_scale)                                # (B, D) = (F Zu)^T
    w1row = mm(cu, e) * zc_scale                           # (B, D) = cu Zu^T
    # (Fw1 Xi~)^T from row objects only:
    #   Xi~^T F^T  = zc (C F^T - cuiec (E F^T)),  C F^T = -gamma ef + r t
    #   (Fw1 Xi~)^T = Xi~^T F^T + (Xi~^T W1row^T) U1row
    ximf_t = (-gamma * ef + inv1r * t - t_mm(cuiec, ef)) * zc_scale
    fw1xi_t = ximf_t + mm(mm_t(xim_t, w1row), u1row)       # (B, D)
    w2row = mm(cv, xim_t)                                  # (B, D)
    stack_u = jnp.concatenate([u1row, fw1xi_t], axis=0)    # (2B, D)
    stack_w = jnp.concatenate([w1row, w2row], axis=0)      # (2B, D)
    f_new = f + t_mm(stack_u, stack_w, bp)                 # one fat update
    return mu + dmu, f_new, good


def _eps_update_core(e, v, mu, f, *, batch: int, jitter: float,
                     w_scratch, l_scratch, n_scratch):
    """Shared kernel body: eps-coordinate update math on VMEM values.

    Returns (mu_new (1,D), f_new (D,D), good (bool scalar)).  Mirrors
    ops/gsm_eps.py exactly (same formulas, ALWAYS HIGHEST matmul precision
    — this is the bit-comparable exact-check path, so the big_prec knob
    deliberately does not reach it).
    """
    b = batch
    k2 = 2 * b
    d = f.shape[-1]

    def mm(x, y):
        return jnp.dot(x, y, preferred_element_type=jnp.float32, precision=_HI)

    def mm_t(x, y):  # x @ y.T without explicit transpose
        return jax.lax.dot_general(x, y, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=_HI)

    def t_mm(x, y):  # x.T @ y
        return jax.lax.dot_general(x, y, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=_HI)

    a = -mm_t(e, f)                                        # (B, D) rows mu - x
    vf = mm(v, f)
    t = mm_t(vf, f)
    vsv = jnp.sum(v * t, axis=1, keepdims=True)
    mv = jnp.sum(a * v, axis=1, keepdims=True)
    rho = 0.5 * (jnp.sqrt(1.0 + 4.0 * (vsv + mv * mv)) - 1.0)
    eps0 = t - a
    w = jnp.sum(v * eps0, axis=1, keepdims=True)
    den = 1.0 + rho + mv
    inv1r = 1.0 / (1.0 + rho)
    dmu_b = (eps0 - a * (w / den)) * inv1r
    dmu = jnp.sum(dmu_b, axis=0, keepdims=True) / b        # (1, D)
    bm = a + dmu_b
    gamma = 1.0 - (1.0 + w / den) * inv1r
    c = -e * gamma + vf * inv1r
    scale = 1.0 / jnp.sqrt(jnp.float32(b))
    zt = jnp.concatenate([-e, c], axis=0) * scale          # (2B, D)
    fzt = jnp.concatenate([a, bm], axis=0) * scale         # (2B, D)

    # ---- small space: G -> Lg^T -> K -> Ck^T -> S2 ----------------------
    # All factors live TRANSPOSED (upper) so the sequential sweeps only ever
    # slice rows (Mosaic's dynamic-index constraint).
    g = mm_t(zt, zt)                                       # (2B, 2B)
    g = 0.5 * (g + g.T)
    eye = jnp.eye(k2, dtype=jnp.float32)
    tr = jnp.sum(g * eye)
    w_scratch[:] = g + (jitter * (tr / k2 + 1.0)) * eye
    _cholt_inplace(w_scratch, l_scratch, k2)               # Lg^T (G is PD)
    lgt = l_scratch[:]
    jj_row = jnp.where(_col_iota(k2) < b, 1.0, -1.0)       # (1, 2B)
    # Lg^T J Lg = (Lg^T J) Lg = (lgt * jj_row) @ lgt^T
    kmat = eye + mm_t(lgt * jj_row, lgt)
    w_scratch[:] = 0.5 * (kmat + kmat.T)
    _triu_inv_inplace(l_scratch, n_scratch, k2)            # M = Lg^{-T} (upper)
    m_mat = n_scratch[:]
    minpiv = _cholt_inplace(w_scratch, l_scratch, k2)      # Ck^T
    good = minpiv > 0.0
    ckt = l_scratch[:]
    # S2 = Lg^{-T} (Ck - I) Lg^{-1} = M (Ck^T - I)^T M^T
    x = mm_t(m_mat, ckt - eye)
    s2 = mm_t(x, m_mat)
    f_new = f + t_mm(fzt, mm(s2, zt))
    return mu + dmu, f_new, good


def _update_kernel(eps_ref, vs_ref, mu_ref, f_ref, mu_out, f_out, good_out,
                   w_s, l_s, n_s, *, batch: int, jitter: float):
    e = eps_ref[:]
    v = vs_ref[:]
    mu = mu_ref[:]
    f = f_ref[:]
    mu_new, f_new, good = _eps_update_core(
        e, v, mu, f, batch=batch, jitter=jitter,
        w_scratch=w_s, l_scratch=l_s, n_scratch=n_s)
    mu_out[:] = jnp.where(good, mu_new, mu)
    f_out[:] = jnp.where(good, f_new, f)
    good_out[0, 0] = good.astype(jnp.int32)


def _update_kernel_ns(*refs, batch: int, iters=NS_ITERS_DEFAULT,
                      big_prec=None, has_ef: bool = False):
    if has_ef:
        eps_ref, vs_ref, mu_ref, f_ref, ef_ref = refs[:5]
        mu_out, f_out, good_out = refs[5:]
        ef = ef_ref[:]
    else:
        eps_ref, vs_ref, mu_ref, f_ref = refs[:4]
        mu_out, f_out, good_out = refs[4:]
        ef = None
    bp = _HI if big_prec is None else big_prec
    e = eps_ref[:]
    v = vs_ref[:]
    mu = mu_ref[:]
    f = f_ref[:]
    vf = jnp.dot(v, f, preferred_element_type=jnp.float32, precision=bp)
    mu_new, f_new, good = _eps_smallspace_ns(e, v, vf, mu, f, batch=batch,
                                             iters=iters, big_prec=bp,
                                             ef_t=ef)
    mu_out[:] = jnp.where(good, mu_new, mu)
    f_out[:] = jnp.where(good, f_new, f)
    good_out[0, 0] = good.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("jitter", "interpret", "method",
                                             "iters", "big_prec"))
def gsm_eps_update_fused(eps, vs, mean, f, jitter: float = 1e-6,
                         interpret: bool = False, method: str = "ns",
                         iters=NS_ITERS_DEFAULT, big_prec=None, ef=None):
    """Fused eps-coordinate GSM update + validity + select (one kernel).

    Drop-in for ``ops.gsm_eps.apply_eps_step``: returns (mean, f, good) with
    the old values already selected back on PD failure.  f32 only.

    ``ef`` — optional precomputed ``eps @ F^T`` (the sampling product the
    caller already formed); passing it drops one O(B D^2) in-kernel
    contraction (round-5 restructure).

    ``method``:
    - "ns" (default): matmul-only two-phase Newton-Schulz small space — no
      sequential loops in the kernel (measured: the fori_loop Cholesky
      sweeps cost ~0.4us/iteration on v5e, dominating the kernel).
    - "chol": in-kernel (2B)^2 Cholesky sweeps — exact PD check, slower.
    """
    b, d = eps.shape
    dtype = jnp.float32
    eps = eps.astype(dtype)
    vs = vs.astype(dtype)
    mu2 = mean.astype(dtype).reshape(1, d)
    f = f.astype(dtype)
    k2 = 2 * b

    specs = dict(memory_space=pltpu.VMEM) if _HAS_PLTPU else {}
    inputs = [eps, vs, mu2, f]
    if method == "ns":
        kernel = functools.partial(_update_kernel_ns, batch=b, iters=iters,
                                   big_prec=big_prec, has_ef=ef is not None)
        scratch = []
        if ef is not None:
            inputs.append(ef.astype(dtype))
    else:
        kernel = functools.partial(_update_kernel, batch=b, jitter=jitter)
        scratch = [
            pltpu.VMEM((k2, k2), dtype) if _HAS_PLTPU
            else pltpu_scratch_fallback((k2, k2), dtype)
            for _ in range(3)
        ]
    mu_new, f_new, good = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, d), dtype),
            jax.ShapeDtypeStruct((d, d), dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(**specs)] * len(inputs),
        out_specs=(pl.BlockSpec(**specs), pl.BlockSpec(**specs),
                   pl.BlockSpec(memory_space=pltpu.SMEM) if _HAS_PLTPU
                   else pl.BlockSpec()),
        scratch_shapes=scratch,
        interpret=interpret,
        **({"compiler_params": _compiler_params(interpret)}
           if _compiler_params(interpret) else {}),
    )(*inputs)
    return mu_new[0], f_new, good[0, 0] > 0


@functools.partial(jax.jit, static_argnames=("iters", "big_prec"))
def gsm_eps_update_ns_xla(eps, vs, mean, f, iters=NS_ITERS_DEFAULT,
                          big_prec=None, ef_t=None):
    """Plain-XLA twin of ``gsm_eps_update_fused``: identical matmul-only
    Newton-Schulz small-space math, traced as ordinary XLA ops (no
    ``pallas_call``).  Exists for BATCHED replica fits (``fit_batch``):

    - vmap of the Pallas kernel lowers correctly on TPU but prepends a grid
      dimension, and grid cells SERIALIZE on the chip's single TensorCore
      (measured v5e, D=64/B=32/K=8: 95.2k aggregate it/s);
    - the chol-based XLA step (``ops.gsm_eps.apply_eps_step``) vmaps, but
      its batched small Cholesky/triangular solves run as sequential panel
      loops (measured: 124-132k aggregate, flat from K=8 to K=32);
    - this twin's step is nothing but (batched) matmuls and elementwise ops,
      which XLA fuses and tiles onto the MXU across the replica dimension
      (measured: 207k aggregate at K=8, peaking 244k at K=32).

    Same residual gates, same f32 policy, same returns (mean, f, good) with
    the old state already selected back on rejection.  f32 only.
    """
    b, d = eps.shape
    dtype = jnp.float32
    eps = eps.astype(dtype)
    vs = vs.astype(dtype)
    mu0 = mean.astype(dtype)
    f = f.astype(dtype)
    bp = _HI if big_prec is None else big_prec
    vf = jnp.dot(vs, f, preferred_element_type=dtype, precision=bp)
    if ef_t is not None:
        ef_t = ef_t.astype(dtype)
    mu_new, f_new, good = _eps_smallspace_ns(
        eps, vs, vf, mu0.reshape(1, d), f, batch=b, iters=iters, big_prec=bp,
        ef_t=ef_t)
    mean_o = jnp.where(good, mu_new[0], mu0)
    f_o = jnp.where(good, f_new, f)
    return mean_o, f_o, good


def pltpu_scratch_fallback(shape, dtype):  # pragma: no cover
    raise RuntimeError("pallas TPU scratch requires pltpu")


# ---------------------------------------------------------------------------
# Whole-step kernel: on-chip PRNG + sampling + fusable score + update.
# ---------------------------------------------------------------------------

def _uniform_from_bits(bits):
    """Random bits -> uniform(0, 1) f32 (never exactly 0).

    The PRNG primitive may hand the bits back as int32; a LOGICAL right
    shift keeps the top 24 bits unsigned either way (an arithmetic shift on
    a signed reinterpretation produced negative uniforms -> NaN in the
    Box-Muller log on hardware)."""
    top24 = jax.lax.shift_right_logical(bits, 8)
    return top24.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))


def _boxmuller(shape):
    """Standard-normal draws from the on-chip PRNG (seeded by caller)."""
    u1 = _uniform_from_bits(pltpu.prng_random_bits(shape))
    u2 = _uniform_from_bits(pltpu.prng_random_bits(shape))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * jnp.pi * u2)


def make_fused_eps_step(score_fn, n_params: int, batch: int, d: int,
                        jitter: float = 1e-6, external_eps: bool = False,
                        interpret: bool = False, method: str = "ns",
                        big_prec=None, iters=NS_ITERS_DEFAULT):
    """Build the ONE-kernel GSM step for a Pallas-traceable score.

    ``score_fn(x, *params) -> (B, D)`` is traced into the kernel (element-wise
    ops + matmuls only — the analytic target zoo qualifies); ``params`` are
    passed as extra VMEM arrays.

    Returns ``step(seed_or_eps, mean, f, *params) -> (mean, f, good)`` — one
    Pallas call per iteration: PRNG -> sample -> score -> rank-2B factor
    update -> exact PD check -> select, entirely in VMEM.

    ``external_eps=False`` (TPU only): the first argument is an int32 seed
    that must differ per iteration (the fitter mixes the fit key with the
    step counter); eps comes from the on-chip PRNG via Box-Muller.
    ``external_eps=True``: the first argument is the (B, D) standard-normal
    draw itself — used for trajectory-exact comparisons against the jnp path
    and for interpret-mode CI (prng_seed has no CPU lowering).
    """
    if not _HAS_PLTPU:
        raise RuntimeError("fused whole-step kernel requires TPU pallas")
    k2 = 2 * batch
    bp = _HI if big_prec is None else big_prec

    def kernel(first_ref, mu_ref, f_ref, *rest):
        params_refs = rest[:n_params]
        mu_out, f_out, good_out = rest[n_params:n_params + 3]
        if external_eps:
            e = first_ref[:]
        else:
            pltpu.prng_seed(first_ref[0])
            e = _boxmuller((batch, d))
        mu = mu_ref[:]
        f = f_ref[:]
        ef = jax.lax.dot_general(e, f, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=bp)
        x = mu + ef
        v = score_fn(x, *[p[:] for p in params_refs])
        if method == "ns":
            vf = jnp.dot(v, f, preferred_element_type=jnp.float32,
                         precision=bp)
            mu_new, f_new, good = _eps_smallspace_ns(e, v, vf, mu, f,
                                                     batch=batch,
                                                     big_prec=bp,
                                                     iters=iters,
                                                     ef_t=ef)
            mu_out[:] = jnp.where(good, mu_new, mu)
            f_out[:] = jnp.where(good, f_new, f)
            good_out[0, 0] = good.astype(jnp.int32)
            return
        w_s, l_s, n_s = rest[n_params + 3:]
        mu_new, f_new, good = _eps_update_core(
            e, v, mu, f, batch=batch, jitter=jitter,
            w_scratch=w_s, l_scratch=l_s, n_scratch=n_s)
        mu_out[:] = jnp.where(good, mu_new, mu)
        f_out[:] = jnp.where(good, f_new, f)
        good_out[0, 0] = good.astype(jnp.int32)

    first_spec = (pl.BlockSpec(memory_space=pltpu.VMEM) if external_eps
                  else pl.BlockSpec(memory_space=pltpu.SMEM))

    @jax.jit
    def step(first, mean, f, *params):
        mu2 = mean.astype(jnp.float32).reshape(1, d)
        if external_eps:
            first = first.astype(jnp.float32)
        else:
            first = jnp.asarray(first, jnp.int32).reshape(1)
        mu_new, f_new, good = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((1, d), jnp.float32),
                jax.ShapeDtypeStruct((d, d), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ),
            in_specs=[first_spec]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + n_params),
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            scratch_shapes=([] if method == "ns"
                            else [pltpu.VMEM((k2, k2), jnp.float32)
                                  for _ in range(3)]),
            interpret=interpret,
            **({"compiler_params": _compiler_params(interpret)}
               if _compiler_params(interpret) else {}),
        )(first, mu2, f.astype(jnp.float32),
          *[p.astype(jnp.float32) for p in params])
        return mu_new[0], f_new, good[0, 0] > 0

    return step


_WEYL = -1640531527  # golden-ratio increment for per-step seed mixing


def make_fused_eps_multistep(score_fn, n_params: int, batch: int, d: int,
                             steps_per_call: int, method: str = "ns",
                             iters=NS_ITERS_DEFAULT,
                             skip_small: bool = False,
                             big_prec=None, interpret: bool = False):
    """SPC GSM iterations per kernel invocation — the dispatch amortizer.

    Measured on v5e: a Pallas kernel invocation inside a scan costs ~25us of
    fixed dispatch overhead (an EMPTY kernel times at 25us/step), which
    dominates the fused step's ~15us of actual compute.  Looping
    ``steps_per_call`` iterations INSIDE the kernel — state (mean, F) held in
    VMEM/registers — amortizes that overhead to 25/SPC us.

    The eps block for all sub-steps arrives EXTERNALLY as a ``(spc*B, D)``
    array (round-5 port of the BaM scheme, ops/pallas/bam_fused.py): the
    fitter draws ``eps_j = normal(fold_in(key, absolute_step_j))`` so the
    trajectory is (a) invariant to steps_per_call / chunk cadence, (b)
    exactly replayable at the XLA level (whole-step audits, utils/audit.py),
    and (c) bit-comparably testable under interpret mode on CPU CI — the
    three properties the retired in-kernel hardware-PRNG variant lacked
    (VERDICT r4 weak #3).

    Returns ``step(nmax, eps_block, mean, f, *params) ->
    (mean, f, n_accepted)`` advancing the first ``nmax`` (<= spc) sub-steps
    of the block — masked, so one compiled shape serves chunk remainders.
    """
    if not _HAS_PLTPU and not interpret:
        raise RuntimeError("fused multi-step kernel requires TPU pallas")
    if method != "ns":
        raise ValueError("multi-step kernel supports method='ns' only")
    bp = _HI if big_prec is None else big_prec
    spc = steps_per_call

    def kernel(nmax_ref, eps_ref, mu_ref, f_ref, *rest):
        params = [p[:] for p in rest[:n_params]]
        mu_out, f_out, acc_out = rest[n_params:]
        nmax = nmax_ref[0]

        def body(j, carry):
            mu, f, acc = carry
            active = j < nmax
            e = eps_ref[pl.ds(j * batch, batch), :]
            ef = jax.lax.dot_general(e, f, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=bp)
            x = mu + ef
            v = score_fn(x, *params)
            vf = jnp.dot(v, f, preferred_element_type=jnp.float32,
                         precision=bp)
            mu_new, f_new, good = _eps_smallspace_ns(
                e, v, vf, mu, f, batch=batch, iters=iters,
                skip_small=skip_small, big_prec=bp, ef_t=ef)
            accept = active & good
            mu = jnp.where(accept, mu_new, mu)
            f = jnp.where(accept, f_new, f)
            return (mu, f, acc + accept.astype(jnp.int32))

        mu, f, acc = jax.lax.fori_loop(
            0, spc, body,
            (mu_ref[:], f_ref[:], jnp.zeros((), jnp.int32)))
        mu_out[:] = mu
        f_out[:] = f
        acc_out[0, 0] = acc

    smem = (dict(memory_space=pltpu.SMEM) if _HAS_PLTPU else {})
    vmem = (dict(memory_space=pltpu.VMEM) if _HAS_PLTPU else {})

    @jax.jit
    def step(nmax, eps_block, mean, f, *params):
        mu2 = mean.astype(jnp.float32).reshape(1, d)
        nmax = jnp.asarray(nmax, jnp.int32).reshape(1)
        eps_block = eps_block.astype(jnp.float32).reshape(spc * batch, d)
        mu_new, f_new, acc = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((1, d), jnp.float32),
                jax.ShapeDtypeStruct((d, d), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ),
            in_specs=[pl.BlockSpec(**smem)]
            + [pl.BlockSpec(**vmem)] * (3 + n_params),
            out_specs=(pl.BlockSpec(**vmem), pl.BlockSpec(**vmem),
                       pl.BlockSpec(**smem)),
            interpret=interpret,
            **({"compiler_params": _compiler_params(interpret)}
               if _compiler_params(interpret) else {}),
        )(nmax, eps_block, mu2, f.astype(jnp.float32),
          *[p.astype(jnp.float32) for p in params])
        return mu_new[0], f_new, acc[0, 0]

    return step


def gaussian_score_kernel(x, mu_t, prec):
    """In-kernel analytic dense-Gaussian score: v = (mu_t - x) @ prec.

    Matches models/gaussian.py's analytic-precision score; ``mu_t`` is
    (1, D), ``prec`` (D, D) symmetric.
    """
    return jnp.dot(mu_t - x, prec, preferred_element_type=jnp.float32,
                   precision=_HI)


def funnel_score_kernel(x, sigma_d):
    """In-kernel analytic score of Neal's funnel (models/funnel.py).

    x0 ~ N(0, sigma^2), x_i | x0 ~ N(0, e^{x0}):
      d/dx0   = -x0/sigma^2 + e^{-x0} sum(rest^2)/2 - (D-1)/2
      d/drest = -rest e^{-x0}
    ``sigma_d`` is a (1, 2) array [sigma, D] (kernel params ride in VMEM).
    Element-wise ops + a row reduction only — Pallas-traceable.
    """
    b, d = x.shape
    sigma = sigma_d[0, 0]
    dd = sigma_d[0, 1]
    col = jax.lax.broadcasted_iota(jnp.int32, (b, d), 1)
    is0 = col == 0
    x0 = jnp.sum(jnp.where(is0, x, 0.0), axis=1, keepdims=True)   # (B, 1)
    rest2 = jnp.sum(jnp.where(is0, 0.0, x * x), axis=1, keepdims=True)
    e = jnp.exp(-x0)
    g0 = -x0 / (sigma * sigma) + 0.5 * e * rest2 - 0.5 * (dd - 1.0)
    grest = -x * e
    return jnp.where(is0, g0, grest)


def banana_score_kernel(x, cs):
    """In-kernel analytic score of the banana target (models/banana.py).

    With h = x1 - b (x0^2 - s^2):
      d/dx0 = -x0/s^2 + 2 b x0 h,  d/dx1 = -h,  d/dtail = -tail.
    ``cs`` is a (1, 2) array [curvature, scale].
    """
    b_, d = x.shape
    curv = cs[0, 0]
    s = cs[0, 1]
    col = jax.lax.broadcasted_iota(jnp.int32, (b_, d), 1)
    is0 = col == 0
    is1 = col == 1
    x0 = jnp.sum(jnp.where(is0, x, 0.0), axis=1, keepdims=True)
    x1 = jnp.sum(jnp.where(is1, x, 0.0), axis=1, keepdims=True)
    h = x1 - curv * (x0 * x0 - s * s)
    g0 = -x0 / (s * s) + 2.0 * curv * x0 * h
    g1 = -h
    return jnp.where(is0, g0, jnp.where(is1, g1, -x))


def student_t_score_kernel(x, loc, prec, df_d):
    """In-kernel analytic score of the multivariate-t (models/student_t.py).

    lp = const - (df+D)/2 log1p(maha/df) with maha = (x-loc) Prec (x-loc):
      grad = -(df+D)/(df+maha) * Prec (x-loc).
    ``loc`` is (1, D), ``prec`` (D, D) symmetric, ``df_d`` a (1, 2) array
    [df, D].  One D x D matmul + a row reduction — MXU-friendly.
    """
    df = df_d[0, 0]
    dd = df_d[0, 1]
    diff = x - loc
    pd_ = jnp.dot(diff, prec, preferred_element_type=jnp.float32,
                  precision=_HI)
    maha = jnp.sum(pd_ * diff, axis=1, keepdims=True)
    return -(df + dd) / (df + maha) * pd_


def mixture_score_kernel(x, means, logmask):
    """In-kernel analytic score of the equal-weight identity-cov GMM
    (models/mixture.py).

    grad = sum_k r_k(x) (m_k - x) with responsibilities
    r = softmax_k(x . m_k - ||m_k||^2/2)  (the -||x||^2/2 term cancels).
    ``means`` is (K_pad, D) — K padded to a sublane multiple with repeats —
    and ``logmask`` (1, K_pad) is 0 for real components, -1e30 for padding
    (softmax sends them to zero weight).  Two (B, K) matmuls, no gathers.
    """
    logits = jax.lax.dot_general(x, means, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=_HI)
    logits = logits - 0.5 * jnp.sum(means * means, axis=1)[None, :] + logmask
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    r = e / jnp.sum(e, axis=1, keepdims=True)
    return jnp.dot(r, means, preferred_element_type=jnp.float32,
                   precision=_HI) - x


def logreg_score_kernel(w, xdata, y_row, inv_ps2):
    """In-kernel analytic score of the logistic-regression posterior
    (models/regression.py).

    lp = sum_n [y_n z_n - softplus(z_n)] - ||w||^2/(2 ps^2), z = X w:
      grad = (y - sigmoid(z)) @ X - w / ps^2.
    ``xdata`` is (N, D), ``y_row`` (1, N), ``inv_ps2`` (1, 1) = 1/ps^2.
    Two (B, N) x (N, D) matmuls + elementwise sigmoid.
    """
    z = jax.lax.dot_general(w, xdata, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_HI)
    resid = y_row - 1.0 / (1.0 + jnp.exp(-z))
    return jnp.dot(resid, xdata, preferred_element_type=jnp.float32,
                   precision=_HI) - w * inv_ps2[0, 0]
