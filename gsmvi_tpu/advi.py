"""ADVI fitter: ELBO maximization over (mean, Cholesky factor), TPU-native.

API parity with the reference ``gsmvi/advi.py:8-112`` (``ADVI(D, lp)`` +
``fit(key, opt, ...) -> (mean, cov, losses)``).  The reference already has the
right single-jitted-step shape (``gsmvi/advi.py:68-73``); this rebuild goes
further:

- The per-iteration Python dispatch loop (``gsmvi/advi.py:90-103``) becomes a
  ``lax.scan`` over optimizer steps — losses come back as one device array.
- q's sampling/log-density use the native reparameterized MVN primitives
  (distributions.py) rather than numpyro; the ELBO gradient flows through
  ``x = loc + eps @ L^T`` (same estimator as numpyro's ``rsample`` path).
- The RNG key is split *before* each step (the reference evaluates the loss
  with the pre-split key and splits after, ``gsmvi/advi.py:100-101`` — a
  documented quirk, not replicated).
- With ``mesh=`` the MC batch is sharded over the data axis; XLA inserts the
  gradient ``psum``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .distributions import mvn_logpdf
from .driver import RunnerCache, make_chunk_runner, on_tpu, run_fit_loop
from .ops.pallas.advi_fused import (advi_fused_supported,
                                    advi_stl_fused_supported,
                                    make_fused_advi_multistep,
                                    make_fused_advi_stl_multistep)
from .parallel.mesh import data_sharding
from .state import VIState  # noqa: F401  (monitor protocol shares shapes)


class ADVIState(NamedTuple):
    loc: jax.Array       # (D,)
    scales: jax.Array    # (D*(D+1)/2,) flattened lower-triangle of L
    opt_state: object
    key: jax.Array
    step: jax.Array
    loss: jax.Array      # most recent loss value


class FusedADVIState(NamedTuple):
    """State of the fused-Pallas ADVI path: tril factor + explicit Adam
    moments (the in-kernel optimizer is hard-wired adam, so the opaque
    optax ``opt_state`` unrolls into its four moment tensors)."""
    loc: jax.Array       # (D,)
    l: jax.Array         # (D, D) lower-triangular factor (masked-dense)
    mloc: jax.Array      # (D,)   Adam first moment of loc
    vloc: jax.Array      # (D,)   Adam second moment of loc
    ml: jax.Array        # (D, D) Adam first moment of L
    vl: jax.Array        # (D, D) Adam second moment of L
    key: jax.Array       # constant seed base; eps = fold_in(key, step)
    step: jax.Array


class FusedADVISTLState(NamedTuple):
    """State of the fused STL path: the standard fused state plus the
    tracked lower-triangular inverse ``ainv ~= l^{-1}`` (part of the state
    so trajectories stay invariant to chunk/monitor cadence and resume
    exactly; re-seeded with an exact solve after every stiff replay)."""
    loc: jax.Array       # (D,)
    l: jax.Array         # (D, D)
    ainv: jax.Array      # (D, D) Newton-tracked l^{-1}
    mloc: jax.Array      # (D,)
    vloc: jax.Array      # (D,)
    ml: jax.Array        # (D, D)
    vl: jax.Array        # (D, D)
    key: jax.Array
    step: jax.Array


def _as_lr_fn(learning_rate):
    """Normalize a float-or-schedule learning rate to ``step -> lr``."""
    if callable(learning_rate):
        return learning_rate
    lr_const = float(learning_rate)
    return lambda s: lr_const


def _lr_bias_arrays(lr_fn, b1f, b2f, steps):
    """Per-step learning rates and Adam bias corrections for ABSOLUTE step
    indices ``steps`` — the single source the fused kernels, their
    runners, and the XLA replay all share (optax.adam exactness rests on
    these being one formula)."""
    t = (steps + 1).astype(jnp.float32)
    lrs = jax.vmap(lambda s: jnp.asarray(lr_fn(s), jnp.float32))(steps)
    return (lrs, 1.0 / (1.0 - jnp.power(b1f, t)),
            1.0 / (1.0 - jnp.power(b2f, t)))


class ADVI:
    """Fit a dense-covariance Gaussian by maximizing the ELBO with optax.

    Parity: reference ``gsmvi/advi.py:14-23``.  ``lp`` must be jax-traceable
    (its gradient is taken by autodiff, as in the reference).
    """

    def __init__(self, D, lp, mesh=None, data_axis: str = "data", dtype=None,
                 pallas_score=None, steps_per_call=None):
        """``pallas_score``: optional ``(score_fn, params)`` pair (e.g.
        ``target.pallas_score``) enabling :meth:`fit_fused` — the whole ADVI
        iteration (sampling, score, analytic ELBO gradient, Adam) fused into
        one Pallas TPU kernel looping ``steps_per_call`` steps in VMEM
        (ops/pallas/advi_fused.py).  :meth:`fit` is unaffected."""
        self.D = D
        self.lp = lp
        self.mesh = mesh
        self.data_axis = data_axis
        self.dtype = dtype or jnp.zeros(0).dtype
        self.idx_tril = jnp.tril_indices(D)
        self.pallas_score = pallas_score
        self.steps_per_call = (steps_per_call if steps_per_call is not None
                               else (16 if D <= 128 else 8))
        # Tests drive the fused path on CPU via pallas interpret mode
        # (plus monkeypatched on_tpu); not part of the public surface.
        self._interpret = False
        self._runners = RunnerCache()

    # -- parameterization ---------------------------------------------------
    def scales_to_tril(self, scales):
        """Lower-triangular factor from either parameter form.

        Internally ADVI optimizes a MASKED-DENSE (D, D) matrix — `jnp.tril`
        is a cheap mask, whereas the reference's flat-vector form needs a
        525k-element scatter/gather pair per step at D=1024 (milliseconds on
        TPU).  The two give identical adam trajectories: upper entries start
        at zero and receive zero gradient.  Flat (D(D+1)/2,) vectors are
        still accepted for reference-API compatibility."""
        if scales.ndim == 2:
            return jnp.tril(scales)
        tril = jnp.zeros((self.D, self.D), scales.dtype)
        return tril.at[self.idx_tril].set(scales)

    def scales_to_cov(self, scales):
        """Parity helper (reference ``gsmvi/advi.py:25-29``)."""
        l = self.scales_to_tril(scales)
        return l @ l.T

    # -- loss ---------------------------------------------------------------
    def neg_elbo(self, params, key, batch_size, estimator="analytic"):
        """Negative ELBO with reparameterized sampling.

        ``estimator="analytic"`` (default) matches the estimator of reference
        ``gsmvi/advi.py:31-45``: -(sum lp(x) - sum log q(x)) over a batch of
        q-samples, with the entropy term's parameter dependence kept analytic
        (log q(x(theta); theta) == -|eps|^2/2 - logdet L - const identically
        in theta for reparameterized samples).

        ``estimator="stl"`` is the "sticking the landing" path-derivative
        estimator (Roeder, Wu & Duvenaud, NeurIPS 2017): log q is evaluated
        at STOPPED variational parameters, so the gradient flows only through
        the sample path ``x = loc + eps @ L^T``.  The two estimators have the
        same expectation; STL's gradient VARIANCE vanishes as q -> p (the
        score term it drops is exactly the one that stays MC-noisy at the
        optimum — measured ~3.6e3x lower gradient norm at the optimum on the
        D=64 bench target).  Cost: one (D, D) x (D, B) triangular solve per
        step (the analytic form is solve-free); the solve is panel-sequential
        on TPU, so STL is the accuracy mode — run the bulk of the fit with
        the fast analytic/fused path and polish with STL (docs/BENCHMARKS.md
        "ADVI accuracy recipe").
        """
        # True-f32 matmuls: the reparameterized gradient is sensitive to the
        # TPU's default bf16 matmul passes.
        import math

        with jax.default_matmul_precision("float32"):
            loc, scales = params
            l = self.scales_to_tril(scales)
            eps = jax.random.normal(key, (batch_size, self.D), loc.dtype)
            if self.mesh is not None:
                eps = jax.lax.with_sharding_constraint(
                    eps, data_sharding(self.mesh, self.data_axis))
            samples = loc + eps @ l.T
            if estimator == "stl":
                # v == eps in VALUE (so the loss value matches the analytic
                # estimator to roundoff) but the solve re-expresses it as a
                # function of (loc, L) at stopped density parameters — the
                # gradient keeps only the path derivative.
                #
                # Diagonal clamp (_safe_tril): STL drops the analytic
                # entropy gradient's -B/L_ii barrier, so MC noise can pin a
                # diagonal entry at ~0 (Adam's second moment then explodes:
                # measured f32 overflow -> NaN at D=1024 on the stiff bench
                # target by step ~860).  Clamping |L_ii| at 1e-5 of the
                # largest diagonal bounds the solve (|v| <= 1e5 |L eps|,
                # second moments ~1e16 << f32 max) while biasing nothing
                # until the factor's diagonal spread exceeds 1e5 (cov
                # condition 1e10).
                l_safe = self._safe_tril(jax.lax.stop_gradient(l))
                loc_bar = jax.lax.stop_gradient(loc)
                v = jax.scipy.linalg.solve_triangular(
                    l_safe, (samples - loc_bar).T, lower=True).T
                logdet = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(l_safe))))
                ent_quad = -0.5 * jnp.sum(v * v)
            elif estimator == "analytic":
                logdet = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(l))))
                ent_quad = -0.5 * jnp.sum(eps * eps)
            else:
                raise ValueError(f"unknown estimator: {estimator!r}")
            logq = (ent_quad
                    - batch_size * (logdet
                                    + 0.5 * self.D * math.log(2.0 * math.pi)))
            logl = jnp.sum(self.lp(samples))
            return -(logl - logq)

    def _make_step(self, batch_size: int, opt, estimator="analytic"):
        """One jitted ADVI step: (state) -> (state, loss) — the aux contract
        of ``run_fit_loop(collect_aux=True)``."""

        def loss_fn(params, key):
            return self.neg_elbo(params, key, batch_size, estimator)

        def step(state: ADVIState):
            key, key_step = jax.random.split(state.key)
            params = (state.loc, state.scales)
            loss, grads = jax.value_and_grad(loss_fn)(params, key_step)
            updates, opt_state2 = opt.update(grads, state.opt_state, params)
            loc, scales = optax.apply_updates(params, updates)
            if estimator == "stl":
                # On-device revert of a nonfinite step (insurance behind the
                # diagonal clamp; the default estimator keeps the
                # reference's accept-every-step behavior).
                good = jnp.all(jnp.isfinite(loc)) & jnp.all(
                    jnp.isfinite(scales))
                sel = lambda a, b: jnp.where(good, a, b)
                loc = sel(loc, state.loc)
                scales = sel(scales, state.scales)
                opt_state2 = jax.tree_util.tree_map(sel, opt_state2,
                                                    state.opt_state)
            return (ADVIState(loc, scales, opt_state2, key, state.step + 1,
                              loss), loss)

        return step

    def fit(self, key, opt, mean=None, cov=None, batch_size=8, niter=1000,
            nprint=10, verbose=True, monitor=None, return_state=False,
            return_losses=True, estimator="analytic",
            max_steps_per_call=None):
        """Run the fit; signature parity with reference ``gsmvi/advi.py:47``.

        Returns (mean, cov, losses) — three values, unlike GSM/BaM, matching
        the reference (``gsmvi/advi.py:112``).  ``losses`` is a numpy array of
        length ``niter + 1``; with ``return_losses=False`` it is ``None`` and
        the per-step loss trace is neither stacked on device nor transferred
        to host — the throughput-measurement / serving mode (the transfer
        scales with niter, so it would otherwise contaminate differential
        timings).

        ``estimator="stl"`` switches the ELBO gradient to the
        sticking-the-landing path-derivative form (see :meth:`neg_elbo`) —
        same expectation, near-zero gradient variance at the optimum; use it
        to polish a warm start (``mean=``/``cov=`` from a fused bulk fit)
        far below the analytic estimator's variance floor.
        """
        dtype = self.dtype
        if mean is None:
            mean = jnp.zeros(self.D, dtype)
        if cov is None:
            cov = jnp.eye(self.D, dtype=dtype)

        # One jitted program for the whole init (cholesky + tril + opt.init):
        # eagerly these are ~15 separate dispatches, which on a tunneled
        # device cost ~35 ms each and dominate short fits.
        def build_init():
            @jax.jit
            def init_state(mean, cov, key):
                # Optimize unconstrained Cholesky entries (reference
                # gsmvi/advi.py:80-83) in masked-dense form (scales_to_tril).
                l0 = jnp.linalg.cholesky(jnp.asarray(cov, dtype))
                params = (jnp.asarray(mean, dtype), jnp.tril(l0))
                return ADVIState(params[0], params[1], opt.init(params), key,
                                 jnp.zeros((), jnp.int32),
                                 jnp.zeros((), dtype))

            return init_state

        init_state = self._runners.get(("init",), (opt,), build_init)
        state = init_state(mean, cov, key)

        # ``opt`` is identity-keyed; RunnerCache pins it against id reuse.
        # The step closure is only built on a cache miss.
        run_chunk = self._runners.get(
            (batch_size, return_losses, estimator), (opt,),
            lambda: make_chunk_runner(
                (self._make_step(batch_size, opt, estimator)
                 if return_losses
                 else (lambda step: (lambda s: step(s)[0]))(
                     self._make_step(batch_size, opt, estimator))),
                collect_aux=return_losses))
        out = run_fit_loop(
            None,  # cached run_chunk carries the body
            state,
            niter,
            monitor=monitor,
            monitor_params=lambda s: [s.loc, self.scales_to_cov(s.scales)],
            lp=self.lp,
            nprint=nprint,
            verbose=verbose,
            batch_size=batch_size,
            run_chunk=run_chunk,
            collect_aux=return_losses,
            max_steps_per_call=max_steps_per_call,
        )
        if return_losses:
            state, losses = out
            losses = np.asarray(losses)
        else:
            state, losses = out, None
        if return_state:
            return state, losses
        return state.loc, self.scales_to_cov(state.scales), losses

    # -- fused-Pallas path ----------------------------------------------------
    def _fused_supported(self, batch_size: int,
                         estimator: str = "analytic") -> bool:
        if self.pallas_score is None or self.mesh is not None:
            return False
        if not (on_tpu() or self._interpret):
            return False
        shapes = [jnp.shape(p) for p in self.pallas_score[1]]
        gate = (advi_stl_fused_supported if estimator == "stl"
                else advi_fused_supported)
        return gate(batch_size, self.D, self.steps_per_call,
                    param_shapes=shapes)

    def _make_fused_runner(self, batch_size: int, learning_rate, b1: float,
                           b2: float, eps_adam: float):
        """Chunk runner on the fused whole-step kernel.

        Per while-iteration: compute the next ``steps_per_call`` absolute
        step indices, their learning rates (any host schedule — evaluated
        as a traced function of the step) and Adam bias corrections, draw
        the eps block per absolute step (``fold_in(key, step)`` — the
        trajectory is invariant to spc/chunk cadence and exactly
        reproducible at the XLA level), and run the kernel."""
        score_fn, params = self.pallas_score
        spc = self.steps_per_call
        d = self.D
        multi = make_fused_advi_multistep(
            score_fn, len(params), batch_size, d, spc, b1=b1, b2=b2,
            eps_adam=eps_adam, interpret=self._interpret)
        lr_fn = _as_lr_fn(learning_rate)
        b1f, b2f = jnp.float32(b1), jnp.float32(b2)

        from functools import partial

        @partial(jax.jit, static_argnums=1)
        def run_chunk(state, k):
            key = state.key
            step0 = state.step

            def body(state):
                steps = state.step + jnp.arange(spc, dtype=jnp.int32)
                lrs, bc1s, bc2s = _lr_bias_arrays(lr_fn, b1f, b2f, steps)
                eps_block = jax.vmap(
                    lambda s: jax.random.normal(jax.random.fold_in(key, s),
                                                (batch_size, d),
                                                jnp.float32))(steps)
                nmax = jnp.minimum(jnp.int32(spc),
                                   jnp.int32(k) - (state.step - step0))
                loc, l, mloc, vloc, ml, vl = multi(
                    lrs, bc1s, bc2s, nmax, eps_block, state.loc, state.l,
                    state.mloc, state.vloc, state.ml, state.vl, *params)
                return FusedADVIState(loc, l, mloc, vloc, ml, vl, key,
                                      state.step + nmax)

            return jax.lax.while_loop(
                lambda s: s.step - step0 < k, body, state)

        return run_chunk

    @staticmethod
    def _safe_tril(l):
        """Diagonal-clamped factor for solves (same floor as the STL loss:
        bias-free below covariance condition 1e10, bounded above f32
        overflow)."""
        diag = jnp.diagonal(l)
        floor = 1e-5 * jnp.maximum(jnp.max(jnp.abs(diag)), 1e-30)
        safe = jnp.where(jnp.abs(diag) < floor,
                         jnp.where(diag < 0, -floor, floor), diag)
        return l + jnp.diag(safe - diag)

    def _exact_ainv(self, l):
        return jax.scipy.linalg.solve_triangular(
            self._safe_tril(l), jnp.eye(self.D, dtype=jnp.float32),
            lower=True)

    def _make_fused_stl_runner(self, batch_size: int, learning_rate,
                               b1: float, b2: float, eps_adam: float):
        """Chunk runner on the fused STL kernel (tracked inverse + gate).

        Mirrors the BaM fused runner's stiff-replay structure: the kernel
        freezes at the first sub-step whose inverse-tracking residual trips
        the gate; that one step replays here at the XLA level — exact
        clamped triangular solve, identical draw and optax-exact Adam — and
        the tracked inverse re-seeds with an exact solve."""
        score_fn, params = self.pallas_score
        spc = self.steps_per_call
        d = self.D
        from .ops.pallas.advi_fused import _adam_apply

        multi = make_fused_advi_stl_multistep(
            score_fn, len(params), batch_size, d, spc, b1=b1, b2=b2,
            eps_adam=eps_adam, interpret=self._interpret)
        lr_fn = _as_lr_fn(learning_rate)
        b1f, b2f = jnp.float32(b1), jnp.float32(b2)

        from functools import partial

        @partial(jax.jit, static_argnums=1)
        def run_chunk(state, k):
            key = state.key
            step0 = state.step

            def body(state):
                steps = state.step + jnp.arange(spc, dtype=jnp.int32)
                lrs, bc1s, bc2s = _lr_bias_arrays(lr_fn, b1f, b2f, steps)
                eps_block = jax.vmap(
                    lambda s: jax.random.normal(jax.random.fold_in(key, s),
                                                (batch_size, d),
                                                jnp.float32))(steps)
                nmax = jnp.minimum(jnp.int32(spc),
                                   jnp.int32(k) - (state.step - step0))
                (loc, l, ainv, mloc, vloc, ml, vl, n_done, stiff) = multi(
                    lrs, bc1s, bc2s, nmax, eps_block, state.loc, state.l,
                    state.ainv, state.mloc, state.vloc, state.ml, state.vl,
                    *params)
                state = FusedADVISTLState(loc, l, ainv, mloc, vloc, ml, vl,
                                          key, state.step + n_done)

                def replay(s):
                    with jax.default_matmul_precision("float32"):
                        lr1, bc11, bc21 = _lr_bias_arrays(
                            lr_fn, b1f, b2f, s.step[None])
                        lr, bc1, bc2 = lr1[0], bc11[0], bc21[0]
                        e = jax.random.normal(
                            jax.random.fold_in(key, s.step),
                            (batch_size, d), jnp.float32)
                        l_safe = self._safe_tril(s.l)
                        x = s.loc[None, :] + e @ s.l.T
                        sc = score_fn(x, *params)
                        # X = L^{-T} E^T  (exact clamped solve)
                        w = jax.scipy.linalg.solve_triangular(
                            l_safe, e.T, lower=True, trans=1)
                        g_all = sc + w.T
                        g_loc = -jnp.sum(g_all, axis=0)
                        g_l = jnp.tril(-g_all.T @ e)
                        loc_n, mloc_n, vloc_n = _adam_apply(
                            s.loc, s.mloc, s.vloc, g_loc, lr, bc1, bc2,
                            b1, b2, eps_adam)
                        l_n, ml_n, vl_n = _adam_apply(
                            s.l, s.ml, s.vl, g_l, lr, bc1, bc2, b1, b2,
                            eps_adam)
                        good = jnp.all(jnp.isfinite(loc_n)) & jnp.all(
                            jnp.isfinite(l_n))
                        sel = lambda a, b: jnp.where(good, a, b)
                        l_n = sel(l_n, s.l)
                        return FusedADVISTLState(
                            sel(loc_n, s.loc), l_n, self._exact_ainv(l_n),
                            sel(mloc_n, s.mloc), sel(vloc_n, s.vloc),
                            sel(ml_n, s.ml), sel(vl_n, s.vl), key,
                            s.step + 1)

                return jax.lax.cond(stiff > 0, replay, lambda s: s, state)

            return jax.lax.while_loop(
                lambda s: s.step - step0 < k, body, state)

        return run_chunk

    def fit_fused(self, key, learning_rate=1e-2, b1=0.9, b2=0.999,
                  eps=1e-8, mean=None, cov=None, batch_size=8, niter=1000,
                  nprint=10, verbose=True, monitor=None, return_state=False,
                  state=None, estimator="analytic",
                  max_steps_per_call=None):
        """ADVI fit on the fused whole-step Pallas kernel (TPU serving path).

        The optimizer is in-kernel Adam with exact ``optax.adam`` semantics;
        ``learning_rate`` may be a float or a schedule ``step -> lr``
        (anything jax-traceable — optax schedules qualify).  Requires
        ``pallas_score`` and a TPU; anywhere the fused kernel is
        unavailable (no TPU, VMEM gate at large D, ``mesh=``) this method
        FALLS BACK to :meth:`fit` with ``optax.adam`` — same estimator and
        optimizer, different eps stream, so trajectories match the fused
        path in distribution, not bitwise.

        ``estimator="stl"`` runs the sticking-the-landing gradient
        (:meth:`neg_elbo`) fused: the kernel maintains a Newton-tracked
        ``l^{-1}`` for the ``L^{-T} eps`` products (a triangular solve is
        panel-sequential and cannot live in the kernel), gates on the
        tracking residual, and stiff steps replay here with the exact
        clamped solve — see ops/pallas/advi_fused.py.

        Returns ``(mean, cov, losses=None)`` (loss traces are not computed
        in-kernel; fit with ``return_losses=True`` or a ``monitor`` covers
        diagnostics), or ``(state, None)`` with ``return_state``.
        """
        if estimator not in ("analytic", "stl"):
            # Validate HERE, not just in neg_elbo: on the fused path an
            # unknown string would otherwise silently select the analytic
            # kernel (and only raise on machines without a TPU).
            raise ValueError(f"unknown estimator: {estimator!r}")
        if not self._fused_supported(batch_size, estimator):
            if state is not None:
                # Resume-through-fallback: continue from the state's
                # (mean, cov) — fused states carry l, XLA states carry
                # scales.  The Adam moments restart (optax state and
                # kernel moments are different pytrees), which only costs
                # a short re-warmup of the second-moment scale.
                mean = state.loc
                cov = self.scales_to_cov(state.l if hasattr(state, "l")
                                         else state.scales)
            return self.fit(key, optax.adam(learning_rate, b1=b1, b2=b2,
                                            eps=eps),
                            mean=mean, cov=cov, batch_size=batch_size,
                            niter=niter, nprint=nprint, verbose=verbose,
                            monitor=monitor, return_state=return_state,
                            return_losses=False, estimator=estimator,
                            max_steps_per_call=max_steps_per_call)
        f32 = jnp.float32
        d = self.D
        stl = estimator == "stl"
        if state is None:
            def build_init():
                @jax.jit
                def init_state(mean, cov, key):
                    l0 = jnp.tril(jnp.linalg.cholesky(
                        jnp.asarray(cov, f32)))
                    z_row = jnp.zeros(d, f32)
                    z_mat = jnp.zeros((d, d), f32)
                    if stl:
                        return FusedADVISTLState(
                            jnp.asarray(mean, f32), l0,
                            self._exact_ainv(l0), z_row, z_row, z_mat,
                            z_mat, key, jnp.zeros((), jnp.int32))
                    return FusedADVIState(
                        jnp.asarray(mean, f32), l0, z_row, z_row, z_mat,
                        z_mat, key, jnp.zeros((), jnp.int32))

                return init_state

            init_state = self._runners.get(("fused_init", stl), (),
                                           build_init)
            state = init_state(
                jnp.zeros(d, f32) if mean is None else mean,
                jnp.eye(d, dtype=f32) if cov is None else cov, key)
        elif hasattr(state, "scales"):
            # An XLA ADVIState (e.g. from a fallback leg): lift (loc,
            # scales) into the fused form; Adam moments restart.
            z_row = jnp.zeros(d, f32)
            z_mat = jnp.zeros((d, d), f32)
            l0 = self.scales_to_tril(state.scales).astype(f32)
            state = FusedADVIState(jnp.asarray(state.loc, f32), l0, z_row,
                                   z_row, z_mat, z_mat, state.key,
                                   jnp.asarray(state.step, jnp.int32))
            if stl:
                state = FusedADVISTLState(
                    state.loc, state.l, self._exact_ainv(state.l),
                    state.mloc, state.vloc, state.ml, state.vl, state.key,
                    state.step)
        elif stl and not isinstance(state, FusedADVISTLState):
            # Lift a standard fused state into the STL path (two-phase
            # recipe without leaving the fused kernels).
            state = FusedADVISTLState(
                state.loc, state.l, self._exact_ainv(state.l), state.mloc,
                state.vloc, state.ml, state.vl, state.key, state.step)
        elif not stl and isinstance(state, FusedADVISTLState):
            state = FusedADVIState(state.loc, state.l, state.mloc,
                                   state.vloc, state.ml, state.vl,
                                   state.key, state.step)

        lr_objs = (learning_rate,) if callable(learning_rate) else ()
        run_chunk = self._runners.get(
            ("fused", estimator, batch_size, self.steps_per_call, b1, b2,
             eps, None if callable(learning_rate) else float(learning_rate),
             self._interpret),
            (self.pallas_score[0], *self.pallas_score[1], *lr_objs),
            lambda: (self._make_fused_stl_runner if stl
                     else self._make_fused_runner)(batch_size,
                                                   learning_rate, b1, b2,
                                                   eps))
        if max_steps_per_call is None:
            # Batch-aware program-length guard: the env-default 1M-step cap
            # (driver.run_fit_loop) assumes small-batch step times, but the
            # fused kernel's per-step cost scales as ~(17 + 0.23 B)(D/1024)^2
            # us on v5e (docs/BENCHMARKS.md D=1024 section) and the tunneled
            # worker's watchdog kills ~90 s device programs — a 1M-step
            # B=512/D=1024 chunk (133 s) crashed it.  Bound each program at
            # ~60 s of ESTIMATED device time (pessimistic off-v5e: programs
            # just split earlier, one ~35 ms dispatch per boundary).
            import os as _os

            est_us = (17.0 + 0.23 * batch_size) * (self.D / 1024.0) ** 2
            est_cap = max(10_000, int(60e6 / max(est_us, 1e-3)))
            env_cap = int(_os.environ.get("GSMVI_MAX_STEPS_PER_CALL",
                                          "1000000"))
            max_steps_per_call = (min(est_cap, env_cap) if env_cap
                                  else est_cap)
        state = run_fit_loop(
            None, state, niter,
            monitor=monitor,
            monitor_params=lambda s: [s.loc, self.scales_to_cov(s.l)],
            lp=self.lp,
            nprint=nprint,
            verbose=verbose,
            batch_size=batch_size,
            run_chunk=run_chunk,
            max_steps_per_call=max_steps_per_call,
        )
        if return_state:
            return state, None
        return state.loc, self.scales_to_cov(state.l), None

    def fit_batch(self, keys, opt, mean=None, cov=None, batch_size=8,
                  niter=1000):
        """K independent ADVI replicas in one compiled program.

        Same contract as ``GSM.fit_batch``: ``keys`` (K,) stacked PRNG keys;
        ``mean``/``cov`` broadcast or carry a leading K axis.  Returns
        (means (K, D), covs (K, D, D), losses (K, niter+1)).
        """
        k = keys.shape[0]
        dtype = self.dtype
        d = self.D

        from .driver import broadcast_replicas

        def broadcast(x, default, shape):
            return broadcast_replicas(x, default, k, shape, dtype)

        means0 = broadcast(mean, jnp.zeros(d, dtype), (d,))
        covs0 = broadcast(cov, jnp.eye(d, dtype=dtype), (d, d))

        def init_one(kk, m, c):
            l0 = jnp.linalg.cholesky(c)
            scales = jnp.tril(l0)
            params = (m, scales)
            return ADVIState(m, scales, opt.init(params), kk,
                             jnp.zeros((), jnp.int32), jnp.zeros((), dtype))

        state = jax.vmap(init_one)(keys, means0, covs0)
        step = jax.vmap(self._make_step(batch_size, opt))

        @jax.jit
        def run(s):
            return jax.lax.scan(lambda c, _: step(c), s, None,
                                length=niter + 1)

        state, losses = run(state)
        covs = jax.vmap(self.scales_to_cov)(state.scales)
        return state.loc, covs, np.asarray(losses).T
