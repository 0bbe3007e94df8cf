"""Fused whole-step ADVI kernels: sample + score + ELBO grad + Adam in VMEM.

The ADVI step (reference ``gsmvi/advi.py:68-73``: one optax step on the
reparameterized negative ELBO) is, per iteration, three (B, D)x(D, D)
matmuls plus O(D^2) elementwise work — exactly the op-count-bound regime
where the per-op XLA dispatch floor (~8.6us inside a scan on v5e) dominates.
The kernels here run ``steps_per_call`` full iterations per Pallas call with
the variational state (loc, tril factor L and the four Adam moment tensors)
resident in VMEM, mirroring the fused GSM/BaM multistep kernels
(fused_step.py / bam_fused.py).

The ELBO gradient is taken ANALYTICALLY instead of by autodiff — for the
reparameterized Gaussian family it is two matmuls:

    x_b   = loc + eps_b @ L^T,       s_b = score(x_b) = grad lp(x_b)
    dloc  = -sum_b s_b
    dL    = tril( -S^T E  -  B * diag(1/L_ii) )

(the second term is the entropy gradient through logdet L; upper-triangle
entries are not parameters — the XLA path masks them via ``jnp.tril``, advi.py
``scales_to_tril`` — so the gradient is tril-masked and the Adam moments stay
identically zero there).  The in-kernel optimizer is exact optax.adam
semantics: with t the 1-based step count,

    m <- b1 m + (1-b1) g          mhat = m / (1 - b1^t)
    v <- b2 v + (1-b2) g^2        vhat = v / (1 - b2^t)
    p <- p - lr_t * mhat / (sqrt(vhat) + eps)

Per-step learning rates and bias corrections arrive as (steps_per_call,)
SMEM arrays computed OUTSIDE the kernel from the absolute step indices, so
any host-side schedule works and the trajectory is invariant to
``steps_per_call`` / chunk cadence.  The eps block likewise arrives
externally, drawn per ABSOLUTE step (``fold_in(key, step)``) like the fused
BaM path — XLA-replayable, cadence-invariant, and interpret-testable on CPU.

Unlike GSM/BaM there are no validity gates: Adam accepts every step (the
same failure mode as the reference — a diagonal crossing zero makes the
entropy gradient blow up — is untouched, not masked).

STL VARIANT (``make_fused_advi_stl_multistep``).  The sticking-the-landing
estimator (advi.py ``neg_elbo(estimator="stl")``, docs/DERIVATIONS.md §8)
replaces the analytic entropy gradient with the path derivative through the
stopped density; its gradient needs ``L^{-T} eps_b`` products.  A
triangular solve is panel-sequential (unusable in Mosaic: ~0.4 us/row), so
the kernel instead MAINTAINS ``A ~= L^{-1}`` across sub-steps with
warm-started Newton sweeps

    A <- A (2I - L A) = A + A R,   R = I - L A,   R_{k+1} = R_k^2,

which stay exactly lower-triangular (products of tril matrices) and cost
2 (D, D) matmuls per sweep.  Per Adam step ``|Delta L| <= lr`` per entry,
so the incoming residual is ``|R| <~ |Delta L|·|A|`` — small exactly in the
regime STL is for (benign conditioning / polish-phase learning rates; see
the derivation's caveat 2: STL does not help stiff targets anyway).  The
kernel gates on the FIRST residual's row-sum norm (``r^(2^sweeps) >
res_gate`` after the sweeps' exact squaring law) and on nonfinite values;
gated sub-steps are NOT applied — the kernel freezes and the fitter
replays that one step at the XLA level with the exact clamped solve and
re-seeds A with the exact inverse.  The STL gradients themselves are then
two thin matmuls: ``P = E A`` (rows ``(L^{-T} eps_b)^T``),

    dloc = -1^T S - 1^T P,      dL = tril(-S^T E - P^T E),

whose expectation reproduces the analytic ``-B diag(1/L_ii)`` barrier
(``E[P^T E] = B L^{-T}`` and ``tril(L^{-T}) = diag(1/L_ii)``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .fused_step import _HAS_PLTPU, _HI, _VMEM_LIMIT_BYTES, \
    _compiler_params, _param_bytes, pl

if _HAS_PLTPU:
    from jax.experimental.pallas import tpu as pltpu
else:  # pragma: no cover
    pltpu = None


def advi_fused_supported(b: int, d: int, steps_per_call: int = 1,
                         itemsize: int = 4, param_shapes=None) -> bool:
    """VMEM gate for the fused ADVI multistep kernel.

    Budget: L + 4 Adam moment tensors in and out is dominated by the three
    (D, D) VMEM-resident tensors and their outputs (~6 D^2) plus the dL
    transient (~2 D^2), the external eps block, ~6 (B, D) row tensors, and
    the score params at their real sizes."""
    if not _HAS_PLTPU:
        return False
    if b < 2:
        return False
    vmem = 8 * d * d * itemsize + 2 * steps_per_call * b * d * itemsize \
        + 6 * b * d * itemsize + 2 * _param_bytes(param_shapes, d, itemsize)
    return vmem < _VMEM_LIMIT_BYTES


# Post-sweep tracking-residual bound (row-sum norm of I - L A, raised to
# 2^sweeps) above which an STL sub-step is NOT trusted: the P = E A products
# then carry >~5% relative error against the exact solve, eroding the
# pathwise cancellation STL exists for.  Gated steps replay on the XLA path.
STL_RES_GATE_DEFAULT = 0.05

# Newton sweeps per sub-step for the tracked inverse.  Each sweep squares
# the residual: at polish learning rates (<=1e-2 on benign targets) the
# per-step perturbation |Delta L^T A| is <~0.2 row-sum, so one sweep holds
# the residual near (0.2)^2/(1-0.4) ~ 5e-2 and two hold it at ~2e-3; the
# default 2 keeps the tracked-P error well under the gate with margin.
STL_SWEEPS_DEFAULT = 2


def _adam_apply(p, m, v, g, lr, bc1, bc2, b1: float, b2: float, eps: float):
    """One optax.adam-exact parameter update (bias corrections precomputed)."""
    m = b1 * m + (1.0 - b1) * g
    v = b2 * v + (1.0 - b2) * (g * g)
    p = p - lr * (m * bc1) / (jnp.sqrt(v * bc2) + eps)
    return p, m, v


def make_fused_advi_multistep(score_fn, n_params: int, batch: int, d: int,
                              steps_per_call: int, b1: float = 0.9,
                              b2: float = 0.999, eps_adam: float = 1e-8,
                              big_prec=None, interpret: bool = False):
    """Up to ``steps_per_call`` whole ADVI iterations per kernel invocation.

    Returns ``step(lrs, bc1s, bc2s, nmax, eps_block, loc, l, mloc, vloc,
    ml, vl, *params) -> (loc, l, mloc, vloc, ml, vl)`` advancing
    ``min(nmax, steps_per_call)`` iterations.  ``lrs``/``bc1s``/``bc2s`` are
    (steps_per_call,) per-step learning rates and Adam bias corrections
    ``1/(1-b1^t)`` / ``1/(1-b2^t)``; ``eps_block`` is the (spc*B, D)
    standard-normal block for the sub-steps, drawn by the caller per
    absolute step."""
    if not _HAS_PLTPU and not interpret:
        raise RuntimeError("fused ADVI multistep requires TPU pallas")
    spc = steps_per_call
    bp = _HI if big_prec is None else big_prec
    bf = float(batch)

    def kernel(lrs_ref, bc1_ref, bc2_ref, nmax_ref, eps_ref,
               loc_ref, l_ref, mloc_ref, vloc_ref, ml_ref, vl_ref, *rest):
        params = [p[:] for p in rest[:n_params]]
        loc_out, l_out, mloc_out, vloc_out, ml_out, vl_out = rest[n_params:]
        nmax = nmax_ref[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
        tril = rows >= cols
        eye = rows == cols
        ones_row = jnp.ones((1, batch), jnp.float32)

        def body(j, carry):
            loc, l, mloc, vloc, ml, vl = carry
            active = j < nmax
            e = eps_ref[pl.ds(j * batch, batch), :]
            x = loc + jax.lax.dot_general(
                e, l, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=bp)
            s = score_fn(x, *params)
            g_loc = -jnp.dot(ones_row, s, preferred_element_type=jnp.float32,
                             precision=bp)
            ste = jax.lax.dot_general(
                s, e, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=bp)
            inv_diag = 1.0 / jnp.where(eye, l, 1.0)
            g_l = jnp.where(tril,
                            -ste - jnp.where(eye, bf * inv_diag, 0.0), 0.0)
            lr, bc1, bc2 = lrs_ref[j], bc1_ref[j], bc2_ref[j]
            loc_n, mloc_n, vloc_n = _adam_apply(loc, mloc, vloc, g_loc, lr,
                                                bc1, bc2, b1, b2, eps_adam)
            l_n, ml_n, vl_n = _adam_apply(l, ml, vl, g_l, lr, bc1, bc2,
                                          b1, b2, eps_adam)
            return (jnp.where(active, loc_n, loc),
                    jnp.where(active, l_n, l),
                    jnp.where(active, mloc_n, mloc),
                    jnp.where(active, vloc_n, vloc),
                    jnp.where(active, ml_n, ml),
                    jnp.where(active, vl_n, vl))

        loc, l, mloc, vloc, ml, vl = jax.lax.fori_loop(
            0, spc, body, (loc_ref[:], l_ref[:], mloc_ref[:], vloc_ref[:],
                           ml_ref[:], vl_ref[:]))
        loc_out[:] = loc
        l_out[:] = l
        mloc_out[:] = mloc
        vloc_out[:] = vloc
        ml_out[:] = ml
        vl_out[:] = vl

    smem = (dict(memory_space=pltpu.SMEM) if _HAS_PLTPU else {})
    vmem = (dict(memory_space=pltpu.VMEM) if _HAS_PLTPU else {})

    @jax.jit
    def step(lrs, bc1s, bc2s, nmax, eps_block, loc, l, mloc, vloc, ml, vl,
             *params):
        f32 = jnp.float32
        lrs = jnp.asarray(lrs, f32).reshape(spc)
        bc1s = jnp.asarray(bc1s, f32).reshape(spc)
        bc2s = jnp.asarray(bc2s, f32).reshape(spc)
        nmax = jnp.asarray(nmax, jnp.int32).reshape(1)
        eps_block = eps_block.astype(f32).reshape(spc * batch, d)
        row = lambda a: a.astype(f32).reshape(1, d)
        mat = lambda a: a.astype(f32)
        out = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((1, d), f32),
                jax.ShapeDtypeStruct((d, d), f32),
                jax.ShapeDtypeStruct((1, d), f32),
                jax.ShapeDtypeStruct((1, d), f32),
                jax.ShapeDtypeStruct((d, d), f32),
                jax.ShapeDtypeStruct((d, d), f32),
            ),
            in_specs=[pl.BlockSpec(**smem)] * 4
            + [pl.BlockSpec(**vmem)] * (7 + n_params),
            out_specs=tuple(pl.BlockSpec(**vmem) for _ in range(6)),
            interpret=interpret,
            **({"compiler_params": _compiler_params(interpret)}
               if _compiler_params(interpret) else {}),
        )(lrs, bc1s, bc2s, nmax, eps_block, row(loc), mat(l), row(mloc),
          row(vloc), mat(ml), mat(vl), *[p.astype(f32) for p in params])
        loc_n, l_n, mloc_n, vloc_n, ml_n, vl_n = out
        return loc_n[0], l_n, mloc_n[0], vloc_n[0], ml_n, vl_n

    return step


def advi_stl_fused_supported(b: int, d: int, steps_per_call: int = 1,
                             itemsize: int = 4, param_shapes=None) -> bool:
    """VMEM + crossover gate for the fused STL kernel.

    Budget: Mosaic's measured stack allocation for this kernel is ~23 D^2
    floats (5 carried (D, D) tensors with fori_loop double-buffering plus
    the Newton/gradient temporaries) — 96.28 MB at D=1024, just over the
    96 MB scoped-VMEM cap (compile error observed on v5e).  The explicit D
    cap reflects the perf crossover: the tracked-inverse sweeps cost
    2*sweeps (D, D) matmuls per step (O(D^3)); measured v5e polish-regime
    throughput vs the XLA STL path is 369k/70k at D=64, 135k/28k at 256,
    21.4k/13.1k at 512 — still a 1.6x win at the cap, with the VMEM wall
    (above) right behind it."""
    if not _HAS_PLTPU:
        return False
    if b < 2 or d > 512:
        return False
    vmem = 23 * d * d * itemsize + 2 * steps_per_call * b * d * itemsize \
        + 8 * b * d * itemsize + 2 * _param_bytes(param_shapes, d, itemsize)
    return vmem < _VMEM_LIMIT_BYTES


def make_fused_advi_stl_multistep(score_fn, n_params: int, batch: int,
                                  d: int, steps_per_call: int,
                                  b1: float = 0.9, b2: float = 0.999,
                                  eps_adam: float = 1e-8,
                                  sweeps: int = STL_SWEEPS_DEFAULT,
                                  res_gate: float = STL_RES_GATE_DEFAULT,
                                  big_prec=None, interpret: bool = False):
    """Up to ``steps_per_call`` whole STL-ADVI iterations per kernel call.

    Returns ``step(lrs, bc1s, bc2s, nmax, eps_block, loc, l, ainv, mloc,
    vloc, ml, vl, *params) -> (loc, l, ainv, mloc, vloc, ml, vl, n_done,
    stiff)``.  ``ainv`` must arrive as an exact (or well-tracked) lower-
    triangular inverse of ``l`` — seed it with an exact XLA triangular
    solve; it is part of the carried state so trajectories stay invariant
    to spc/chunk cadence.  The kernel consumes sub-steps until the first
    one whose tracking residual trips ``res_gate`` (or goes nonfinite),
    then freezes with ``stiff=1``; the caller must replay that one step
    exactly (XLA solve) and re-seed ``ainv``."""
    if not _HAS_PLTPU and not interpret:
        raise RuntimeError("fused STL ADVI multistep requires TPU pallas")
    if sweeps < 1:
        # The body always performs the first sweep (it reuses the gate's
        # residual); sweeps=0 would silently run 1 sweep with a gate
        # computed for 0.
        raise ValueError("sweeps must be >= 1")
    spc = steps_per_call
    bp = _HI if big_prec is None else big_prec
    gate_first = float(res_gate) ** (1.0 / (2.0 ** sweeps))

    def kernel(lrs_ref, bc1_ref, bc2_ref, nmax_ref, eps_ref,
               loc_ref, l_ref, ainv_ref, mloc_ref, vloc_ref, ml_ref, vl_ref,
               *rest):
        params = [p[:] for p in rest[:n_params]]
        (loc_out, l_out, ainv_out, mloc_out, vloc_out, ml_out, vl_out,
         stats_out) = rest[n_params:]
        nmax = nmax_ref[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
        tril = rows >= cols
        eye = jnp.where(rows == cols, 1.0, 0.0).astype(jnp.float32)
        ones_row = jnp.ones((1, batch), jnp.float32)

        def mm(x, y):
            return jnp.dot(x, y, preferred_element_type=jnp.float32,
                           precision=_HI)

        def body(j, carry):
            loc, l, a, mloc, vloc, ml, vl, n_done, stopped = carry
            active = (j < nmax) & (stopped == 0)
            # Newton refresh of the tracked inverse toward the CURRENT l
            # (which the previous sub-step's Adam update perturbed).
            r = eye - mm(l, a)
            r_norm = jnp.max(jnp.sum(jnp.abs(r), axis=1))
            a = a + mm(a, r)
            for _ in range(sweeps - 1):
                r = eye - mm(l, a)
                a = a + mm(a, r)
            bad = (~jnp.isfinite(r_norm)) | (r_norm > gate_first)

            e = eps_ref[pl.ds(j * batch, batch), :]
            x = loc + jax.lax.dot_general(
                e, l, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=bp)
            s = score_fn(x, *params)
            p = jnp.dot(e, a, preferred_element_type=jnp.float32,
                        precision=bp)                      # rows (L^-T e_b)^T
            g_loc = -jnp.dot(ones_row, s + p,
                             preferred_element_type=jnp.float32,
                             precision=bp)
            spe = jax.lax.dot_general(
                s + p, e, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=bp)
            g_l = jnp.where(tril, -spe, 0.0)
            # A nonfinite gradient (score overflow, exploding sample) must
            # NOT be consumed: Adam would write NaN (or silently poison
            # the second moments with inf) into the carried state, and the
            # replay would then revert INTO the poisoned state.  Finite
            # gradients make every downstream Adam op finite, so gating at
            # the source suffices.
            bad = bad | ~(jnp.all(jnp.isfinite(g_loc))
                          & jnp.all(jnp.isfinite(g_l)))
            stop_now = active & bad
            consume = active & ~stop_now
            lr, bc1, bc2 = lrs_ref[j], bc1_ref[j], bc2_ref[j]
            loc_n, mloc_n, vloc_n = _adam_apply(loc, mloc, vloc, g_loc, lr,
                                                bc1, bc2, b1, b2, eps_adam)
            l_n, ml_n, vl_n = _adam_apply(l, ml, vl, g_l, lr, bc1, bc2,
                                          b1, b2, eps_adam)
            sel = lambda new, old: jnp.where(consume, new, old)
            return (sel(loc_n, loc), sel(l_n, l), sel(a, carry[2]),
                    sel(mloc_n, mloc), sel(vloc_n, vloc), sel(ml_n, ml),
                    sel(vl_n, vl), n_done + consume.astype(jnp.int32),
                    jnp.where(stop_now, jnp.int32(1), stopped))

        zero = jnp.zeros((), jnp.int32)
        out = jax.lax.fori_loop(
            0, spc, body,
            (loc_ref[:], l_ref[:], ainv_ref[:], mloc_ref[:], vloc_ref[:],
             ml_ref[:], vl_ref[:], zero, zero))
        loc_out[:], l_out[:], ainv_out[:] = out[0], out[1], out[2]
        mloc_out[:], vloc_out[:], ml_out[:], vl_out[:] = out[3:7]
        stats_out[0, 0] = out[7]
        stats_out[0, 1] = out[8]

    smem = (dict(memory_space=pltpu.SMEM) if _HAS_PLTPU else {})
    vmem = (dict(memory_space=pltpu.VMEM) if _HAS_PLTPU else {})

    @jax.jit
    def step(lrs, bc1s, bc2s, nmax, eps_block, loc, l, ainv, mloc, vloc,
             ml, vl, *params):
        f32 = jnp.float32
        lrs = jnp.asarray(lrs, f32).reshape(spc)
        bc1s = jnp.asarray(bc1s, f32).reshape(spc)
        bc2s = jnp.asarray(bc2s, f32).reshape(spc)
        nmax = jnp.asarray(nmax, jnp.int32).reshape(1)
        eps_block = eps_block.astype(f32).reshape(spc * batch, d)
        row = lambda x: x.astype(f32).reshape(1, d)
        out = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((1, d), f32),
                jax.ShapeDtypeStruct((d, d), f32),
                jax.ShapeDtypeStruct((d, d), f32),
                jax.ShapeDtypeStruct((1, d), f32),
                jax.ShapeDtypeStruct((1, d), f32),
                jax.ShapeDtypeStruct((d, d), f32),
                jax.ShapeDtypeStruct((d, d), f32),
                jax.ShapeDtypeStruct((1, 2), jnp.int32),
            ),
            in_specs=[pl.BlockSpec(**smem)] * 4
            + [pl.BlockSpec(**vmem)] * (8 + n_params),
            out_specs=tuple([pl.BlockSpec(**vmem)] * 7
                            + [pl.BlockSpec(**smem)]),
            interpret=interpret,
            **({"compiler_params": _compiler_params(interpret)}
               if _compiler_params(interpret) else {}),
        )(lrs, bc1s, bc2s, nmax, eps_block, row(loc), l.astype(f32),
          ainv.astype(f32), row(mloc), row(vloc), ml.astype(f32),
          vl.astype(f32), *[p.astype(f32) for p in params])
        (loc_n, l_n, ainv_n, mloc_n, vloc_n, ml_n, vl_n, stats) = out
        return (loc_n[0], l_n, ainv_n, mloc_n[0], vloc_n[0], ml_n, vl_n,
                stats[0, 0], stats[0, 1])

    return step
