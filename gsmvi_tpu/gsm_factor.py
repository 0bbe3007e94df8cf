"""FactorGSM: the Cholesky-free GSM fitter (see ops/gsm_factor.py).

Same fitting semantics and ``fit`` surface as ``GSM``, but the state carries a
square-root factor ``F`` (S = F F^T) and its inverse instead of (cov, chol):

- sampling is ``mu + eps @ F.T`` (any factor works — no triangularity needed);
- the covariance update is a rank-2B factor correction, O(B D^2) matmuls;
- validity is the exact PD criterion ``min eig(I + H) > 0`` from a (2B x 2B)
  eigh — sharper and far cheaper than the dense path's D x D Cholesky probe.

The hot loop contains no O(D^3) factorization, which on TPU (where Cholesky
is panel-sequential and MXU-hostile) is the dense step's dominant cost for
D >~ 256.  An optional Newton refresh of Finv runs every ``refresh_every``
steps (O(D^3) matmuls, amortized to noise).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .distributions import safe_cholesky
from .driver import RunnerCache, is_traceable, make_chunk_runner, \
    on_tpu, run_fit_loop
from .ops.gsm_eps import apply_eps_step
from .ops.gsm_factor import (factor_gsm_step_stats, factor_gsm_step_stats_v2,
                             factor_refresh, factor_to_cov)
from .ops.pallas.fused_step import (NS_ITERS_DEFAULT, fused_supported,
                                    ns_iters_for_batch,
                                    gsm_eps_update_fused,
                                    gsm_eps_update_ns_xla,
                                    make_fused_eps_multistep,
                                    make_fused_eps_step)
from .parallel.mesh import data_sharding


# Cold-start sentinel for the feedback NS ladder's carried statistics
# (ops/pallas/bam_fused.py): inf fails every benign gate -> long profile.
# A plain numpy constant so importing this module never touches a backend.
_NS_STATS0 = np.full((2,), np.inf, dtype=np.float32)


class FactorVIState(NamedTuple):
    mean: jax.Array     # (D,)
    factor: jax.Array   # (D, D), S = factor @ factor.T
    finv: jax.Array     # (D, D), maintained inverse of factor
    key: jax.Array
    step: jax.Array
    n_accepted: jax.Array
    n_rejected: jax.Array
    # (gu_ub, lmax_ub) measured at the last feedback-cadence boundary (or
    # stiff stop) — drives FactorBaM's measured-feedback NS ladder; unused
    # (and reset each step, harmlessly) by the GSM family's constructors.
    ns_stats: jax.Array = _NS_STATS0

    # Duck-typed accessors so monitors/checkpoint helpers written for VIState
    # largely work; cov is materialized on demand.
    @property
    def cov(self):
        return factor_to_cov(self.factor)

    @property
    def chol(self):
        return safe_cholesky(self.cov)


class FactorGSM:
    """Cholesky-free GSM fitter; ``fit`` surface matches ``GSM.fit``."""

    def __init__(self, D, lp, lp_g, mesh=None, data_axis: str = "data",
                 dtype=None, refresh_every: int = 1000,
                 method: str = "eps", use_pallas: "bool | str" = "auto",
                 pallas_score=None, steps_per_call=None,
                 cov_sharding=None, pallas_precision: str = "highest",
                 ns_iters=None):
        """``method``:
        - "eps" (default): eps-coordinate update (ops/gsm_eps.py) — the
          state is (mean, F) only; no maintained inverse, no QR, no eigh;
          the small solves are (2B x 2B) Choleskys.
        - "twophase": round-1 matmul-only rank-B update/downdate phases
          (maintains Finv).
        - "qr": thin-QR orthogonal reduction (maintains Finv).

        ``use_pallas`` ("auto"/True/False) fuses the eps step into Pallas
        kernels on TPU: with ``pallas_score`` (a ``(score_fn, params)`` pair,
        e.g. ``target.pallas_score``) the ENTIRE iteration — sampling
        matmul, score, rank-2B update, exact PD check, select — is one
        kernel; otherwise sampling/score stay in XLA and the update+check+
        select fuse (``gsm_eps_update_fused``).  The one-kernel path draws
        eps per ABSOLUTE step (``normal(fold_in(key, step))``, round 5):
        trajectories are invariant to ``steps_per_call``/chunk cadence,
        exactly resumable, and replayable at the XLA level (whole-step
        audits).

        ``pallas_precision`` ("highest" default | "bf16") sets the MXU pass
        count for the O(B D^2) matmuls inside the fused kernels: "bf16"
        (1-pass, f32 accumulation) trades matmul FLOP-time for precision on
        the FLOP-dominant large-D path; the (B, B) small-space numerics and
        their PD gates always run at HIGHEST.  Measure convergence before
        adopting "bf16" — covariance accuracy saturates at the bf16
        product-rounding floor (see docs/BENCHMARKS.md).
        """
        self.D = D
        self.lp = lp
        self.lp_g = lp_g
        self.mesh = mesh
        self.data_axis = data_axis
        self.dtype = dtype or jnp.zeros(0).dtype
        self.refresh_every = refresh_every
        self.method = method
        self.use_pallas = use_pallas
        self.pallas_score = pallas_score
        # Sub-steps looped INSIDE one kernel invocation on the fully-fused
        # path: kernel dispatch costs ~25us on v5e (measured with an empty
        # kernel), so amortizing it across steps_per_call iterations is the
        # single largest throughput lever.  Warm-differential sweeps (quiet
        # machine): D=256 flat from spc=8 (62-64k at 4/8/16/32); D<=128 is
        # dispatch-dominated enough that 16 still pays (+9.5% at D=64:
        # 98.6k vs 90.0k).  Sub-step seeds are spc-invariant so trajectories
        # do not change with this knob; None = auto by D.
        self.steps_per_call = (steps_per_call if steps_per_call is not None
                               else (16 if D <= 128 else 8))
        # Mosaic lowers only DEFAULT (1-pass bf16, f32 accumulate) and
        # HIGHEST (full f32) dot precisions — Precision.HIGH (3-pass
        # bf16x3, ~f32 accuracy at half the HIGHEST MXU passes) has no TPU
        # kernel lowering, so "high" disables the fused kernels and runs
        # the XLA eps paths (where it is a pure big-matmul speedup; round-5
        # fit_batch measurements in docs/BENCHMARKS.md).
        # Newton-Schulz sweep counts for the in-kernel small space
        # (sqrt1, inv1, inv2, sqrt2, inv3).  The default is the measured
        # accuracy/speed frontier on v5e with the sharp inf-norm spectral
        # scaling (79k it/s @ D=256 at full converged accuracy; sweep
        # 2026-08-17).  CAUTION: the residual gates catch catastrophic loss,
        # NOT slow bias — cutting iters[2] (the W1^{-1} inverse) below 6
        # measurably degrades converged cov_err (0.0026 -> 0.017) with zero
        # rejections.  Validate convergence when changing this.
        # None = batch-aware auto (ns_iters_for_batch): the short profile
        # is validated at B <= 32 only; B >= 64 silently biases it and gets
        # the longer chains (round-5 CPU study, fused_step.py note).
        self.ns_iters = tuple(ns_iters) if ns_iters is not None else None
        self.pallas_precision = {
            "highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "bf16": jax.lax.Precision.DEFAULT,
        }[pallas_precision]
        # Optional NamedSharding splitting the (D, D) factor over a model
        # axis: the LARGE-D scaling path.  Unlike the dense fitter — whose
        # per-step D x D Cholesky XLA must gather — the eps step is pure
        # matmuls, which GSPMD partitions cleanly over a 2-D (data x model)
        # mesh; only O(B*D) row tensors and (2B)^2 scalars cross chips.
        self.cov_sharding = cov_sharding
        # Tests drive the fused paths on CPU via pallas interpret mode
        # (plus monkeypatched on_tpu); not part of the public surface.
        self._interpret = False
        self._runners = RunnerCache()

    def _pallas_mode(self, batch_size: int):
        """None | "update" | "step" — which fused kernel this config uses."""
        if self.method != "eps":
            return None
        # Precision.HIGH has no Mosaic lowering: "high" is an XLA-path-only
        # option (see __init__); the fused kernels stay off.
        if self.pallas_precision == jax.lax.Precision.HIGH:
            return None
        # The fused kernels keep F in VMEM on one chip — they cannot honor a
        # model-sharded factor; the generic XLA step (which applies the
        # with_sharding_constraint) is the large-D path.
        if self.cov_sharding is not None:
            return None
        if self.dtype != jnp.float32 or not on_tpu():
            return None
        if self.mesh is not None:
            # Data mesh composes with the fused UPDATE kernel (scores stay
            # data-parallel; rows all_gather onto every chip and the kernel
            # runs replicated — see _make_step).  The whole-step kernel
            # would pull the score on-chip and forfeit the parallelism.
            n = self.mesh.shape[self.data_axis]
            if batch_size % n != 0:
                return None
            if not fused_supported(batch_size, self.D):
                return None
            if self.use_pallas == "auto" or self.use_pallas is True:
                return "update"
            return None
        param_shapes = (
            [tuple(p.shape) for p in self.pallas_score[1]]
            if self.pallas_score is not None else None)
        spc = self.steps_per_call if self.pallas_score is not None else 1
        if not fused_supported(batch_size, self.D, param_shapes=param_shapes,
                               steps_per_call=spc):
            return None
        if self.use_pallas == "auto" or self.use_pallas is True:
            return "step" if self.pallas_score is not None else "update"
        return None

    def _iters(self, batch_size: int):
        """NS profile for this batch: user override or the batch-aware
        default (``ns_iters_for_batch`` — B <= 32 short, else long)."""
        return ns_iters_for_batch(batch_size, self.ns_iters)

    def _get_runner(self, batch_size: int):
        # The key covers everything the compiled runner closes over:
        # hashable config inline, the pallas_score pair by pinned identity
        # (a stale hit on a mutated fitter would silently fit the wrong
        # target — RunnerCache docstring).
        mode = self._pallas_mode(batch_size)
        score_objs = ()
        if self.pallas_score is not None:
            score_objs = (self.pallas_score[0], *self.pallas_score[1])

        def build():
            if mode == "step" and self.steps_per_call > 1:
                return self._make_fused_runner(batch_size)
            return make_chunk_runner(self._make_step(batch_size))

        return self._runners.get(
            (batch_size, mode, self.steps_per_call, self.method,
             self._iters(batch_size), self.pallas_precision,
             self.refresh_every,
             self._interpret), score_objs, build)

    def _make_fused_runner(self, batch_size: int):
        """Chunk runner on the multi-step kernel: dispatch amortized over
        ``steps_per_call`` in-kernel iterations.

        Per block the runner draws the eps for the next ``spc`` ABSOLUTE
        step indices (``normal(fold_in(key, step))`` — the BaM fused
        scheme, round 5) and hands the ``(spc*B, D)`` block to the kernel;
        a chunk remainder reuses the same compiled kernel with a masked
        ``nmax``.  The trajectory is therefore invariant to spc/chunk
        cadence and exactly replayable at the XLA level."""
        from functools import partial

        score_fn, params = self.pallas_score
        spc = self.steps_per_call
        d = self.D
        multi = make_fused_eps_multistep(score_fn, len(params), batch_size,
                                         self.D, spc,
                                         big_prec=self.pallas_precision,
                                         iters=self._iters(batch_size),
                                         interpret=self._interpret)

        @partial(jax.jit, static_argnums=1)
        def run_chunk(state, k):
            key = state.key

            def eps_for(s):
                return jax.random.normal(jax.random.fold_in(key, s),
                                         (batch_size, d), jnp.float32)

            def block(s, nmax):
                steps = s.step + jnp.arange(spc, dtype=jnp.int32)
                eps_block = jax.vmap(eps_for)(steps)
                mu, f, nacc = multi(nmax, eps_block, s.mean, s.factor,
                                    *params)
                ndone = jnp.int32(nmax)
                return FactorVIState(
                    mu, f, s.finv, s.key, s.step + ndone,
                    s.n_accepted + nacc,
                    s.n_rejected + (ndone - nacc), s.ns_stats)

            n_multi, rem = divmod(k, spc)
            if n_multi:
                state = jax.lax.scan(
                    lambda s, _: (block(s, spc), None), state, None,
                    length=n_multi)[0]
            if rem:
                state = block(state, rem)
            return state

        return run_chunk

    def _make_audit_hook(self, batch_size: int, tol: float):
        """Build (and cache) the periodic fused-vs-exact audit hook; no-op
        (with a one-time warning) when this config never runs the fused
        kernel — there is nothing fused to audit then."""
        import warnings

        from .utils.audit import make_audit_hook, make_gsm_audit

        mode = self._pallas_mode(batch_size)
        if mode is None:
            warnings.warn("audit_every set but the fused Pallas path is not "
                          "active for this config; no audits will run",
                          stacklevel=3)
            self.audit_log = []
            return None
        # Whole-step audits on the one-kernel path (round 5): the external
        # fold_in eps makes the full fused step replayable, so the audit
        # also certifies the Pallas-traced score against lp_g.
        score = self.pallas_score if mode == "step" else None
        score_objs = (() if score is None else (score[0], *score[1]))
        audit_fn = self._runners.get(
            ("audit", batch_size, mode, self._iters(batch_size),
             self.pallas_precision, self._interpret),
            (self.lp_g, *score_objs),
            lambda: make_gsm_audit(self.lp_g, batch_size, self.D,
                                   self._iters(batch_size),
                                   self.pallas_precision,
                                   interpret=self._interpret,
                                   pallas_score=score))
        self.audit_log = []
        return make_audit_hook(audit_fn, self.audit_log, tol, "FactorGSM")

    def _make_step(self, batch_size: int, allow_pallas=True):
        """``allow_pallas``: True (normal gating), False (force the chol XLA
        eps step), or "ns_xla" (the batched-replica step: the fused kernel's
        matmul-only NS small space traced as plain XLA — see
        ``gsm_eps_update_ns_xla``; f32 eps method only)."""
        lp_g = self.lp_g
        d = self.D
        dtype = self.dtype
        refresh_every = self.refresh_every
        method = self.method
        sharding = (
            data_sharding(self.mesh, self.data_axis)
            if self.mesh is not None else None
        )
        mode = self._pallas_mode(batch_size) if allow_pallas is True else None
        use_ns_xla = (allow_pallas == "ns_xla" and method == "eps"
                      and dtype == jnp.float32)
        cov_sh = self.cov_sharding

        if mode == "step":
            score_fn, params = self.pallas_score
            fused = make_fused_eps_step(score_fn, len(params), batch_size, d,
                                        big_prec=self.pallas_precision,
                                        iters=self._iters(batch_size),
                                        external_eps=True,
                                        interpret=self._interpret)

            def step(state: FactorVIState) -> FactorVIState:
                # Per-step draw: eps = normal(fold_in(key, step)) — the key
                # field deliberately stays CONSTANT on this path: it is the
                # stream base and state.step the stream position, which
                # keeps the trajectory invariant to chunk/monitor cadence
                # AND to steps_per_call (the multistep runner draws the
                # identical per-absolute-step eps), makes checkpoint-resume
                # exact, and lets audits replay any step at the XLA level;
                # monitors get a per-checkpoint fold_in of it from the
                # driver (driver._monitor_key).
                key = state.key
                eps = jax.random.normal(jax.random.fold_in(key, state.step),
                                        (batch_size, d), jnp.float32)
                mean, f, good = fused(eps, state.mean, state.factor, *params)
                g32 = good.astype(jnp.int32)
                return FactorVIState(mean, f, state.finv, key,
                                     state.step + 1,
                                     state.n_accepted + g32,
                                     state.n_rejected + (1 - g32))

            return step

        if mode == "update":
            ns_iters = self._iters(batch_size)
            big_prec = self.pallas_precision
            interpret = self._interpret

            if self.mesh is not None:
                # Mesh-composed fused step (VERDICT r2 item #4): scores
                # evaluate data-parallel on each chip's row shard; the
                # O(B*D) rows all_gather over ICI (the only collective) and
                # the fused rank-2B update kernel runs REPLICATED — every
                # chip computes the identical new (mean, F), so a sharded
                # fit keeps the whole fused-kernel win instead of dropping
                # to the XLA op sequence.
                from .parallel.sharded import make_gathered_update

                gathered_update = make_gathered_update(
                    self.mesh, self.data_axis, lp_g,
                    lambda e, v, mean, f: gsm_eps_update_fused(
                        e, v, mean, f, iters=ns_iters, big_prec=big_prec,
                        interpret=interpret))

                def step(state: FactorVIState) -> FactorVIState:
                    key, key_sample = jax.random.split(state.key)
                    eps = jax.random.normal(key_sample, (batch_size, d),
                                            dtype)
                    mean, f, good = gathered_update(eps, state.mean,
                                                    state.factor)
                    g32 = good.astype(jnp.int32)
                    return FactorVIState(mean, f, state.finv, key,
                                         state.step + 1,
                                         state.n_accepted + g32,
                                         state.n_rejected + (1 - g32))

                return step

            def step(state: FactorVIState) -> FactorVIState:
                with jax.default_matmul_precision("float32"):
                    key, key_sample = jax.random.split(state.key)
                    eps = jax.random.normal(key_sample, (batch_size, d), dtype)
                    ef = eps @ state.factor.T
                    samples = state.mean + ef
                    vs = lp_g(samples)
                    mean, f, good = gsm_eps_update_fused(
                        eps, vs.astype(jnp.float32), state.mean,
                        state.factor, iters=ns_iters, big_prec=big_prec,
                        interpret=interpret, ef=ef.astype(jnp.float32))
                    g32 = good.astype(jnp.int32)
                    return FactorVIState(mean, f, state.finv, key,
                                         state.step + 1,
                                         state.n_accepted + g32,
                                         state.n_rejected + (1 - g32))

            return step

        def step(state: FactorVIState) -> FactorVIState:
            with jax.default_matmul_precision("float32"):
                return _step_body(state)

        def _step_body(state: FactorVIState) -> FactorVIState:
            key, key_sample = jax.random.split(state.key)
            eps = jax.random.normal(key_sample, (batch_size, d), dtype)
            if sharding is not None:
                eps = jax.lax.with_sharding_constraint(eps, sharding)
            ef = eps @ state.factor.T
            samples = state.mean + ef
            # Pin the score to the state dtype: a user lp_g emitting f64
            # under global x64 would otherwise promote the whole carry.
            vs = lp_g(samples).astype(dtype)
            if method == "eps":
                if use_ns_xla:
                    # ef is shared with the update (round-5 F-traffic
                    # restructure): the batched-replica step streams the
                    # (K, D, D) factor once less per step.
                    mean, f, good = gsm_eps_update_ns_xla(
                        eps, vs, state.mean, state.factor,
                        iters=self._iters(batch_size),
                        big_prec=self.pallas_precision,
                        ef_t=ef.astype(jnp.float32))
                else:
                    mean, f, good = apply_eps_step(state.mean, state.factor,
                                                   eps, vs)
                if cov_sh is not None:
                    f = jax.lax.with_sharding_constraint(f, cov_sh)
                g32 = good.astype(jnp.int32)
                return FactorVIState(mean, f, state.finv, key,
                                     state.step + 1,
                                     state.n_accepted + g32,
                                     state.n_rejected + (1 - g32))
            step_stats = (factor_gsm_step_stats_v2 if method == "twophase"
                          else factor_gsm_step_stats)
            dmu, f_new, finv_new, good = step_stats(
                samples, vs, state.mean, state.factor, state.finv)
            mean = jnp.where(good, state.mean + dmu, state.mean)
            f = jnp.where(good, f_new, state.factor)
            finv = jnp.where(good, finv_new, state.finv)
            if refresh_every:
                finv = jax.lax.cond(
                    (state.step + 1) % refresh_every == 0,
                    lambda args: factor_refresh(*args),
                    lambda args: args[1],
                    (f, finv),
                )
            g32 = good.astype(jnp.int32)
            return FactorVIState(mean, f, finv, key, state.step + 1,
                                 state.n_accepted + g32,
                                 state.n_rejected + (1 - g32))

        return step

    def fit(self, key, mean=None, cov=None, batch_size=2, niter=5000,
            nprint=10, verbose=True, check_goodness=True, monitor=None,
            return_state=False, state=None, audit_every=0, audit_tol=1e-3):
        """Same contract as ``GSM.fit`` (reference ``gsmvi/gsm.py:79``).

        ``state`` — optional ``FactorVIState`` (from ``return_state=True``)
        resuming the exact trajectory, ignoring ``key``/``mean``/``cov``.

        ``audit_every`` — when > 0 and the fused Pallas path is active, run
        a periodic exact audit (utils/audit.py): every ``audit_every``
        iterations one fresh draw is pushed through both the fused NS
        update kernel and the exact XLA eps step from the LIVE state;
        accepted-step deviations beyond ``audit_tol`` (relative, either
        moment) raise a warning.  Records land in ``self.audit_log``.  The
        audit draw is stream-disjoint from the fit, so trajectories are
        unchanged.  This catches slow NS bias the in-kernel residual gates
        cannot (they only catch catastrophic loss).
        """
        dtype = self.dtype
        if state is None:
            mean0 = (jnp.zeros(self.D, dtype) if mean is None
                     else jnp.asarray(mean, dtype))
            if cov is None:
                f0 = jnp.eye(self.D, dtype=dtype)
            else:
                f0 = safe_cholesky(jnp.asarray(cov, dtype))
            if self.method == "eps":
                # The eps method never applies F^{-1}; carry an empty
                # placeholder so the scan state stays (mean, F) sized.
                finv0 = jnp.zeros((0, 0), dtype)
            else:
                finv0 = jax.scipy.linalg.solve_triangular(
                    f0, jnp.eye(self.D, dtype=dtype), lower=True)
            zero = jnp.zeros((), jnp.int32)
            state = FactorVIState(mean0, f0, finv0, key, zero, zero, zero)

        probe = jax.ShapeDtypeStruct((batch_size, self.D), dtype)
        if not is_traceable(self.lp_g, probe):
            raise TypeError(
                "FactorGSM requires a jax-traceable lp_g; use GSM for "
                "plain-numpy score functions")
        state_hook = None
        if audit_every:
            state_hook = self._make_audit_hook(batch_size, audit_tol)
        state = run_fit_loop(
            None,  # cached run_chunk / eager_step below carries the body
            state,
            niter,
            monitor=monitor,
            monitor_params=lambda s: [s.mean, factor_to_cov(s.factor)],
            lp=self.lp,
            nprint=nprint,
            verbose=verbose,
            batch_size=batch_size,
            run_chunk=self._get_runner(batch_size),
            state_hook=state_hook,
            state_hook_every=audit_every,
        )
        if return_state:
            return state
        return state.mean, factor_to_cov(state.factor)

    def _batch_fused_ok(self, batch_size: int, small_solver: str) -> bool:
        """Whether ``fit_batch`` runs on the K-replica fused Pallas kernel
        (ops/pallas/batch_fused.py): explicit ``small_solver="fused"`` plus
        eps method, f32, a Pallas-traceable score, a TPU backend (or
        interpret-mode tests), and VMEM-fitting shapes.

        NOT part of "auto": measured on v5e (round 5, .scratch/r5_probe5),
        the grid kernel's replicas SERIALIZE on the single TensorCore —
        86-97k aggregate it/s at every (D, K) probed, i.e. ~the single-fit
        fused rate — while the batched NS-XLA step reaches 143k/176k
        aggregate at D=256 K=8/32 and 241k at D=64 K=32.  "fused" buys
        per-replica bit-identity with same-key single fused fits, not
        aggregate throughput."""
        if small_solver != "fused":
            return False
        if self.method != "eps" or self.dtype != jnp.float32:
            return False
        if self.pallas_precision == jax.lax.Precision.HIGH:
            return False
        if self.pallas_score is None or self.use_pallas is False:
            return False
        if not (on_tpu() or self._interpret):
            return False
        param_shapes = [tuple(p.shape) for p in self.pallas_score[1]]
        return fused_supported(batch_size, self.D,
                               param_shapes=param_shapes,
                               steps_per_call=self.steps_per_call)

    def _get_batch_fused_runner(self, batch_size: int, k: int):
        from functools import partial

        from .ops.pallas.batch_fused import make_fused_eps_batch_multistep

        score_fn, params = self.pallas_score
        spc = self.steps_per_call
        d = self.D

        def build():
            multi = make_fused_eps_batch_multistep(
                score_fn, len(params), batch_size, d, k, spc,
                iters=self._iters(batch_size),
                big_prec=self.pallas_precision,
                interpret=self._interpret)

            @partial(jax.jit, static_argnums=1)
            def run_chunk(state, nsteps):
                keys = state.key

                def eps_for(kk, s):
                    return jax.random.normal(jax.random.fold_in(kk, s),
                                             (batch_size, d), jnp.float32)

                def block(s, nmax):
                    steps = s.step[0] + jnp.arange(spc, dtype=jnp.int32)
                    eps = jax.vmap(lambda kk: jax.vmap(
                        lambda st: eps_for(kk, st))(steps))(keys)
                    mu, f, nacc = multi(nmax, eps, s.mean, s.factor,
                                        *params)
                    nd = jnp.int32(nmax)
                    return FactorVIState(
                        mu, f, s.finv, s.key, s.step + nd,
                        s.n_accepted + nacc, s.n_rejected + (nd - nacc),
                        s.ns_stats)

                n_multi, rem = divmod(nsteps, spc)
                if n_multi:
                    state = jax.lax.scan(
                        lambda s, _: (block(s, spc), None), state, None,
                        length=n_multi)[0]
                if rem:
                    state = block(state, rem)
                return state

            return run_chunk

        return self._runners.get(
            ("batch_fused", batch_size, k, spc, self._iters(batch_size),
             self.pallas_precision, self._interpret),
            (score_fn, *params), build)

    def fit_batch(self, keys, mean=None, cov=None, batch_size=2, niter=5000,
                  return_state=False, small_solver="auto"):
        """K independent FactorGSM replicas in one compiled program.

        ``small_solver`` — the batched per-replica step implementation:

        - "auto" (default): the fused kernel's matmul-only Newton-Schulz
          small space traced as plain XLA (``gsm_eps_update_ns_xla``) when
          ``method="eps"`` and the dtype is f32 — the whole batched step
          is (K-batched) matmuls, which XLA tiles onto the MXU across
          replicas; since round 5 the step shares the sampling product and
          applies the factor correction as one fat (D, 2B) contraction
          (5 F-sized contractions/step instead of 8).  Measured v5e @
          B=32 (round 5): aggregate 143k/176k it/s at D=256 K=8/32, 241k
          at D=64 K=32 (vs the chol step's ~45-132k and ~30k for a single
          XLA fit).  Falls back to "chol" otherwise.
        - "fused": the K-replica fused Pallas whole-step kernel
          (ops/pallas/batch_fused.py) — the replica axis is the Pallas
          grid, each grid step advances one replica ``steps_per_call``
          fused sub-steps in VMEM; eps per replica per ABSOLUTE step
          (``fold_in(replica_key, step)``), so each replica's trajectory
          is BIT-IDENTICAL to the same-key single fused ``fit``.  Requires
          ``pallas_score`` + TPU + f32 + eps method.  Measured: grid
          replicas serialize on the one TensorCore (~86-97k aggregate at
          every (D, K) probed) — choose it for exactness/auditability of
          batched runs, not aggregate throughput (the measured ceiling
          study lives in docs/BENCHMARKS.md round-5 fit_batch section).
        - "ns": force the NS-XLA step (no Pallas).
        - "chol": the exact-PD-check Cholesky eps step
          (``ops.gsm_eps.apply_eps_step``); its batched small solves run as
          sequential panel loops on TPU — the aggregate saturates by K=8.
        """
        k = keys.shape[0]
        d = self.D
        dtype = self.dtype

        from .driver import broadcast_replicas

        def broadcast(x, default, shape):
            return broadcast_replicas(x, default, k, shape, dtype)

        means0 = broadcast(mean, jnp.zeros(d, dtype), (d,))
        covs0 = broadcast(cov, jnp.eye(d, dtype=dtype), (d, d))

        def init_one(kk, m, c):
            f0 = safe_cholesky(c)
            if self.method == "eps":
                finv0 = jnp.zeros((0, 0), dtype)
            else:
                finv0 = jax.scipy.linalg.solve_triangular(
                    f0, jnp.eye(d, dtype=dtype), lower=True)
            zero = jnp.zeros((), jnp.int32)
            return FactorVIState(m, f0, finv0, kk, zero, zero, zero)

        state = jax.vmap(init_one)(keys, means0, covs0)

        if self._batch_fused_ok(batch_size, small_solver):
            state = self._get_batch_fused_runner(batch_size, k)(
                state, niter + 1)
            if return_state:
                return state
            return state.mean, jax.vmap(factor_to_cov)(state.factor)

        # XLA fallback: replica fits vmap the step.  vmap-of-pallas_call of
        # the single-replica kernel is deliberately NOT used here: it
        # lowers (leading grid dim, verified bit-exact on v5e) but
        # re-dispatches one grid cell per STEP per replica — measured
        # SLOWER than both batched XLA paths (95k flat-in-K vs chol 124k /
        # NS-XLA 207k aggregate it/s at D=64/K=8).  The K-grid MULTISTEP
        # kernel above is the round-5 fix; the NS-XLA step remains for
        # targets without a Pallas-traceable score.
        use_ns = (small_solver in ("auto", "ns", "fused")
                  and self.method == "eps" and dtype == jnp.float32)
        step = jax.vmap(self._make_step(
            batch_size, allow_pallas="ns_xla" if use_ns else False))

        @jax.jit
        def run(s):
            return jax.lax.scan(lambda c, _: (step(c), None), s, None,
                                length=niter + 1)[0]

        state = run(state)
        if return_state:
            return state
        return state.mean, jax.vmap(factor_to_cov)(state.factor)
