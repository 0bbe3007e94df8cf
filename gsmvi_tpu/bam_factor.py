"""FactorBaM: Batch-and-Match with factor-coordinate state — no D x D
factorization in the hot loop (see ops/bam_eps.py for the derivation).

Same fitting semantics and ``fit`` surface as ``BaM`` (reference
``gsmvi/bam.py:117-233``): per-iteration regularizer schedule, up-to-
``retries`` resampling attempts on a failed validity check, warm starts.
Differences, all TPU-motivated:

- state is (mean, F) with S = F F^T; sampling is one matmul; the validity
  check is the EXACT PD flag of the small middle factor (free) instead of a
  D x D Cholesky probe;
- full-rank and low-rank coincide (U is exactly rank B+1), so there is no
  ``use_lowrank`` switch — this path IS the exact low-rank algebra;
- no jitter is needed: the proposal is PD by construction and the exact
  PD flag only screens numerical loss (``fit`` still accepts ``jitter=``
  for BaM surface parity; it is inert on this route).

Use ``BaM`` when you need the dense-state path (e.g. cov-sharded large-D) or
eager numpy callables; use this for throughput.

Numerical route: the small-space spectrum needs kappa(Y) — NOT kappa(Y)^2 —
accuracy on stiff steps; a thin SVD of the (D, B+1) factor delivers it
(that is what makes this path work in f32 on stiff targets —
``dense_gaussian`` at D=256, cond ~ 4e6, converges to mean_err ~ 8e-4 on
TPU v5e, the very regime where the reference's BaM requires x64,
``examples/example_bam.py:14-15``) but costs ~140 us in-scan, while the
Gram eigh is ~70 us cheaper yet stalls the MEAN there.  The default
``solver="auto"`` routes per step by a cheap conditioning bound (see
ops/bam_eps.py), and on TPU the fused Pallas kernels (use_pallas="auto")
collapse the whole benign-regime step into matmul-only Newton-Schulz
chains, replaying only gate-flagged stiff steps through the SVD
(ops/pallas/bam_fused.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .distributions import safe_cholesky
from .driver import RunnerCache, is_traceable, make_chunk_runner, \
    on_tpu, run_fit_loop
from .gsm_factor import FactorVIState
from .ops.bam_eps import bam_eps_update
from .ops.gsm_factor import factor_to_cov
from .ops.pallas.bam_fused import (BAM_NS_ITERS_DEFAULT, BAM_NS_TIERS,
                                   FEEDBACK_CADENCE, GU_GATE_DEFAULT,
                                   LMAX_GATE_DEFAULT, bam_eps_update_fused,
                                   bam_fused_supported,
                                   make_fused_bam_multistep,
                                   ns_tier_from_stats)
from .parallel.mesh import data_sharding


class FactorBaM:
    """Fit a dense-covariance Gaussian by BaM updates on factor state.

    PERFORMANCE NOTE (measured, v5e): instantiating this class with
    ``use_pallas=False`` (or off the fused gates) lands on the pure-XLA
    factor route, which at small D is STRUCTURALLY ~3x slower than the
    dense ``BaM`` class (8.1k vs 25.2k it/s @ D=64 — the per-step thin
    SVD/QR of the (D, B+1) factor costs more than XLA's D x D Cholesky
    there; full decomposition in docs/BENCHMARKS.md "FactorBaM small-D
    gap").  Prefer ``BaM(use_factor="auto")`` — which routes through this
    algebra only where it wins and picks up the fused eps-update kernel —
    or pass ``pallas_score=`` here for the fused whole-step route (the
    fastest BaM path at every measured D).  The pure-XLA route remains the
    exactness oracle and the off-TPU/x64 path.
    """

    def __init__(self, D, lp, lp_g, mesh=None, data_axis: str = "data",
                 dtype=None, solver: str = "auto",
                 use_pallas: "bool | str" = "auto", pallas_score=None,
                 steps_per_call=None, lmax_gate: float = LMAX_GATE_DEFAULT,
                 gu_gate: float = GU_GATE_DEFAULT,
                 ns_iters=BAM_NS_ITERS_DEFAULT, ns_profile: str = "auto"):
        """``use_pallas`` ("auto"/True/False) fuses the BaM step into Pallas
        kernels on TPU (ops/pallas/bam_fused.py): with ``pallas_score`` (a
        ``(score_fn, params)`` pair, e.g. ``target.pallas_score``) the whole
        iteration — sampling matmul, score, rank-(B+1) update, validity —
        runs ``steps_per_call`` sub-steps per kernel; otherwise only the
        update+check+select fuse.  Steps whose small-space Gram exceeds
        ``lmax_gate`` (the f32-resolvable bound, see bam_fused.py) are
        detected in-kernel and REPLAYED on the XLA SVD path with the same
        draw, so stiff early iterations keep SVD-grade accuracy while
        steady-state throughput is the fused kernel's.  ``gu_gate`` bounds
        the second (reg-scaled) stiffness statistic the same way — at
        reg >~ gu_gate/26 every step replays; lower it for accuracy, raise
        it only with a measured map-error study (bam_fused.py).  Trajectories on the
        fused path draw eps per absolute step index (``fold_in(key, step)``)
        and are invariant to ``steps_per_call`` and chunk cadence.

        ``ns_profile``: "auto" (default) runs the MEASURED-FEEDBACK NS
        LADDER (bam_fused.BAM_NS_TIERS): every fused kernel exports the two
        gate statistics it already computes (gu_ub, lmax_ub), the fitter
        carries the pair measured at the last multiple-of-
        ``bam_fused.FEEDBACK_CADENCE`` absolute step (or at a stiff stop),
        and each step runs the most benign tier whose gates those MEASURED
        stats pass with margin.  Kernel blocks truncate at cadence
        boundaries, and both update events are grouping-invariant, so the
        trajectory-invariance contract above is preserved; a mis-predicted
        window costs at most one cadence of SVD replays, never a biased
        accept (each tier's own in-kernel gates still decide).  This
        replaces the round-3 reg-only predictor, which was blind to the
        D/target scaling of the lmax statistic and thrashed at D >= 512.
        "long" pins every fused step to the single (ns_iters, lmax_gate,
        gu_gate) profile (the pre-ladder behavior)."""
        self.D = D
        self.lp = lp
        self.lp_g = lp_g
        self.mesh = mesh
        self.data_axis = data_axis
        self.dtype = dtype or jnp.zeros(0).dtype
        # "auto" (default) routes each step by a cheap conditioning bound:
        # the ~70 us-cheaper Gram eigh while the f32/f64 spectrum near
        # l ~ 1 stays resolved, the kappa-accurate thin SVD on stiff steps
        # (which are an early-fit transient) — SVD-grade converged moments
        # at near-eigh steady-state cost.  "svd"/"eigh" force one branch.
        self.solver = solver
        self.use_pallas = use_pallas
        self.pallas_score = pallas_score
        self.steps_per_call = (steps_per_call if steps_per_call is not None
                               else (16 if D <= 128 else 8))
        self.lmax_gate = float(lmax_gate)
        self.gu_gate = float(gu_gate)
        self.ns_iters = tuple(ns_iters)
        if ns_profile not in ("auto", "long"):
            raise ValueError("ns_profile must be 'auto' or 'long'")
        self.ns_profile = ns_profile
        # Tests drive the fused path on CPU via pallas interpret mode
        # (plus monkeypatched on_tpu); not part of the public surface.
        self._interpret = False
        self._runners = RunnerCache()

    def _pallas_mode(self, batch_size: int):
        """None | "update" | "step" — which fused kernel this config uses."""
        if self.use_pallas is False:
            return None
        if self.dtype != jnp.float32 or not on_tpu():
            return None
        if self.mesh is not None:
            # Data mesh composes with the fused UPDATE kernel only (scores
            # data-parallel, rows all_gather, kernel replicated — mirrors
            # FactorGSM._make_step); the whole-step kernel would pull the
            # score on-chip and forfeit the parallelism.
            n = self.mesh.shape[self.data_axis]
            if batch_size % n != 0:
                return None
            if not bam_fused_supported(batch_size, self.D):
                return None
            if self.use_pallas == "auto" or self.use_pallas is True:
                return "update"
            return None
        param_shapes = (
            [tuple(p.shape) for p in self.pallas_score[1]]
            if self.pallas_score is not None else None)
        spc = self.steps_per_call if self.pallas_score is not None else 1
        if not bam_fused_supported(batch_size, self.D, steps_per_call=spc,
                                   param_shapes=param_shapes):
            return None
        if self.use_pallas == "auto" or self.use_pallas is True:
            return "step" if self.pallas_score is not None else "update"
        return None

    def _ns_tiers(self):
        """The NS ladder for this config: ((iters, gu_gate, lmax_gate), ...)
        from stiffest (the configured long profile) to most benign.
        Built-in benign tiers are pruned to those whose gates sit BELOW the
        configured ones, so tightening ``gu_gate``/``lmax_gate`` tightens
        the whole ladder.  Tier selection is by MEASURED feedback
        (bam_fused.ns_tier_from_stats on the carried state.ns_stats), which
        works at every D — the retired reg-only predictor
        (bam_fused.ns_tier_thresholds) mispredicted the D/target-scaled
        lmax statistic and thrashed at D >= 512 (-11% @512, -3.2x @1024 on
        v5e)."""
        tier0 = (self.ns_iters, self.gu_gate, self.lmax_gate)
        if self.ns_profile == "long":
            return (tier0,)
        lower = tuple(t for t in BAM_NS_TIERS[1:]
                      if t[1] <= self.gu_gate and t[2] <= self.lmax_gate)
        return (tier0, *lower)

    def _make_tiered_update(self, batch_size: int):
        """A drop-in for ``bam_eps_update_fused`` that lax.switches among
        the ladder's single-step kernels by the CARRIED measured stats
        (feedback ladder).  The selected tier's own in-kernel gates still
        decide ``stiff``.  Returns ``update(eps, vs, mean, f, reg,
        ns_stats) -> (mu, f, good, stiff, kernel_stats)``."""
        tiers = self._ns_tiers()
        interp = self._interpret

        def update(eps, vs, mean, f, reg, ns_stats):
            if len(tiers) == 1:
                it, gg, lm = tiers[0]
                return bam_eps_update_fused(eps, vs, mean, f, reg,
                                            iters=it, lmax_gate=lm,
                                            gu_gate=gg, interpret=interp)
            branches = [
                (lambda e, v, m, ff, r, it=it, gg=gg, lm=lm:
                 bam_eps_update_fused(e, v, m, ff, r, iters=it,
                                      lmax_gate=lm, gu_gate=gg,
                                      interpret=interp))
                for (it, gg, lm) in tiers]
            tj = ns_tier_from_stats(ns_stats[0], ns_stats[1], tiers)
            return jax.lax.switch(tj, branches, eps, vs, mean, f, reg)

        return update

    def _make_step(self, batch_size: int, regf, retries: int,
                   allow_pallas: bool = True):
        lp_g = self.lp_g
        d = self.D
        dtype = self.dtype
        solver = self.solver
        sharding = (data_sharding(self.mesh, self.data_axis)
                    if self.mesh is not None else None)
        mode = self._pallas_mode(batch_size) if allow_pallas else None

        def attempt(key, state):
            """One sample->score->XLA-update attempt with a fresh draw
            (the plain path, and the resample-retry body everywhere)."""
            with jax.default_matmul_precision("float32"):
                key, key_sample = jax.random.split(key)
                eps = jax.random.normal(key_sample, (batch_size, d), dtype)
                if sharding is not None:
                    eps = jax.lax.with_sharding_constraint(eps, sharding)
                samples = state.mean + eps @ state.factor.T
                # Pin the score to the state dtype: a user lp_g emitting f64
                # under global x64 would otherwise promote the whole carry.
                vs = lp_g(samples).astype(dtype)
                reg = jnp.asarray(regf(state.step), dtype)
                mean_new, f_new, good = bam_eps_update(
                    eps, vs, state.mean, state.factor, reg, solver=solver)
                return (key, mean_new.astype(dtype), f_new.astype(dtype),
                        good, state.ns_stats)

        def carried_stats(state, stiff, kstats):
            """Feedback-ladder carry rule (grouping-invariant, see
            bam_fused.FEEDBACK_CADENCE): adopt the kernel's measured stats
            when this step sits just before a cadence boundary, or
            immediately on a stiff flag (the stats are then large and the
            next window correctly starts stiffer)."""
            upd = ((state.step + 1) % FEEDBACK_CADENCE == 0) | stiff
            return jnp.where(upd, kstats.astype(jnp.float32),
                             state.ns_stats)

        if mode == "update" and self.mesh is not None:
            # Mesh-composed fused BaM step: per-shard scores, one all_gather
            # of the O(B*D) rows, replicated fused kernel + stiff-replay
            # cond (the shared FactorGSM pattern, parallel/sharded.py).
            from .parallel.sharded import make_gathered_update

            tiered_update = self._make_tiered_update(batch_size)

            def fused_then_replay(eps_full, vs_full, mean, f, reg,
                                  ns_stats):
                mu_p, f_p, good, stiff, kstats = tiered_update(
                    eps_full, vs_full, mean, f, reg, ns_stats)

                def svd_branch(_):
                    mu_s, f_s, good_s = bam_eps_update(
                        eps_full, vs_full, mean, f, reg, solver=solver)
                    return (mu_s.astype(jnp.float32),
                            f_s.astype(jnp.float32), good_s)

                mu_p, f_p, good = jax.lax.cond(
                    stiff, svd_branch, lambda _: (mu_p, f_p, good), None)
                return mu_p, f_p, good, stiff, kstats

            gathered_attempt = make_gathered_update(
                self.mesh, self.data_axis, lp_g, fused_then_replay,
                n_extra=2, n_out=5)

            def fused_attempt(key, state):
                key, key_sample = jax.random.split(key)
                eps = jax.random.normal(key_sample, (batch_size, d), dtype)
                reg = jnp.asarray(regf(state.step), jnp.float32)
                mu_p, f_p, good, stiff, kstats = gathered_attempt(
                    eps, state.mean, state.factor, reg, state.ns_stats)
                return (key, mu_p, f_p, good,
                        carried_stats(state, stiff, kstats))

            first_attempt = fused_attempt
        elif mode == "update":
            tiered_update = self._make_tiered_update(batch_size)

            def fused_attempt(key, state):
                """Fused-kernel attempt; stiff steps recompute through the
                XLA SVD path with the SAME eps (bit-identical semantics to
                the pure-XLA trajectory on those steps)."""
                with jax.default_matmul_precision("float32"):
                    key, key_sample = jax.random.split(key)
                    eps = jax.random.normal(key_sample, (batch_size, d),
                                            dtype)
                    samples = state.mean + eps @ state.factor.T
                    # The kernel is f32; pin the score dtype so the XLA
                    # replay branch (same inputs) has identical output types
                    # (user lp_g may emit f64 under global x64).
                    vs = lp_g(samples).astype(jnp.float32)
                    reg = jnp.asarray(regf(state.step), dtype)
                    mu_p, f_p, good, stiff, kstats = tiered_update(
                        eps, vs, state.mean, state.factor, reg,
                        state.ns_stats)

                    def svd_branch(_):
                        mu_s, f_s, good_s = bam_eps_update(
                            eps, vs, state.mean, state.factor, reg,
                            solver=solver)
                        return (mu_s.astype(jnp.float32),
                                f_s.astype(jnp.float32), good_s)

                    mu_p, f_p, good = jax.lax.cond(
                        stiff, svd_branch,
                        lambda _: (mu_p, f_p, good), None)
                    return (key, mu_p, f_p, good,
                            carried_stats(state, stiff, kstats))

            first_attempt = fused_attempt
        else:
            first_attempt = attempt

        def step(state: FactorVIState) -> FactorVIState:
            key, mean_new, f_new, good, ns_stats = first_attempt(state.key,
                                                                 state)

            if retries > 0:
                # Reference semantics: resample within the same iteration on
                # failure, up to ``retries`` times (``gsmvi/bam.py:188-206``).
                def cond(carry):
                    _, _, _, good, tries = carry
                    return jnp.logical_and(~good, tries < retries)

                def body(carry):
                    key, _, _, _, tries = carry
                    key, mean_new, f_new, good, _ = attempt(key, state)
                    return key, mean_new, f_new, good, tries + 1

                key, mean_new, f_new, good, _ = jax.lax.while_loop(
                    cond, body,
                    (key, mean_new, f_new, good, jnp.zeros((), jnp.int32)))

            g32 = good.astype(jnp.int32)
            mean = jnp.where(good, mean_new, state.mean)
            f = jnp.where(good, f_new, state.factor)
            return FactorVIState(mean, f, state.finv, key, state.step + 1,
                                 state.n_accepted + g32,
                                 state.n_rejected + (1 - g32),
                                 ns_stats)

        return step

    def _make_audit_hook(self, batch_size: int, regf, tol: float):
        """Build (and cache) the periodic fused-vs-SVD audit hook; no-op
        (with a one-time warning) when this config never runs the fused
        kernel."""
        import warnings

        from .utils.audit import make_audit_hook, make_bam_audit

        if self._pallas_mode(batch_size) is None:
            warnings.warn("audit_every set but the fused Pallas path is not "
                          "active for this config; no audits will run",
                          stacklevel=3)
            self.audit_log = []
            return None
        audit_fn = self._runners.get(
            ("audit", batch_size, self.ns_iters, self.ns_profile,
             self.lmax_gate, self.gu_gate, self._interpret),
            (regf, self.lp_g),
            lambda: make_bam_audit(self.lp_g, batch_size, self.D, regf,
                                   self._make_tiered_update(batch_size)))
        self.audit_log = []
        return make_audit_hook(audit_fn, self.audit_log, tol, "FactorBaM")

    def _make_fused_runner(self, batch_size: int, regf, retries: int,
                           interpret: bool = False):
        """Chunk runner on the whole-step multistep kernel (mode "step").

        Per while-iteration: draw the eps block for the next
        ``steps_per_call`` absolute step indices (``fold_in(key, step)`` —
        the trajectory is invariant to spc/chunk cadence and exactly
        reproducible at the XLA level), run the kernel, then — if it stopped
        on a stiff or (retries>0) rejected sub-step — REPLAY that one step
        through the XLA SVD path with the identical draw, plus the
        reference's resample-retry loop (``gsmvi/bam.py:188-206``)."""
        score_fn, params = self.pallas_score
        spc = self.steps_per_call
        d = self.D
        lp_g = self.lp_g
        solver = self.solver
        tiers = self._ns_tiers()
        multis = [make_fused_bam_multistep(
            score_fn, len(params), batch_size, d, spc, iters=it,
            lmax_gate=lm, gu_gate=gg,
            interpret=interpret or self._interpret)
            for (it, gg, lm) in tiers]
        stop_on_reject = 1 if retries > 0 else 0

        def run_multi_block(step0, ns_stats, regs, nmax, eps_block,
                            mean, f):
            """Run one kernel block on the FEEDBACK-selected NS tier
            (bam_fused.ns_tier_from_stats on the carried measured stats).
            The block truncates at the next feedback-cadence boundary so
            the boundary step's stats are always exported by some block —
            which keeps the trajectory invariant to spc/chunk grouping."""
            if len(multis) == 1:
                return multis[0](regs, nmax, stop_on_reject, eps_block,
                                 mean, f, *params)
            run_len = FEEDBACK_CADENCE - (step0 % FEEDBACK_CADENCE)
            nmax = jnp.minimum(nmax, run_len.astype(jnp.int32))
            branches = [(lambda r, n, e, m, ff, mu=mu: mu(
                r, n, stop_on_reject, e, m, ff, *params))
                for mu in multis]
            tj = ns_tier_from_stats(ns_stats[0], ns_stats[1], tiers)
            return jax.lax.switch(tj, branches, regs, nmax, eps_block,
                                  mean, f)

        @partial(jax.jit, static_argnums=1)
        def run_chunk(state, k):
            key = state.key
            step0 = state.step

            def eps_for(s):
                return jax.random.normal(jax.random.fold_in(key, s),
                                         (batch_size, d), jnp.float32)

            def body(state):
                steps = state.step + jnp.arange(spc, dtype=jnp.int32)
                regs = jax.vmap(
                    lambda s: jnp.asarray(regf(s), jnp.float32))(steps)
                eps_block = jax.vmap(eps_for)(steps)
                nmax = jnp.minimum(jnp.int32(spc),
                                   jnp.int32(k) - (state.step - step0))
                mu, f, n_done, n_acc, stopped, kstats = run_multi_block(
                    state.step, state.ns_stats, regs, nmax, eps_block,
                    state.mean, state.factor)
                end = state.step + n_done
                # Feedback carry: adopt the block's measured stats when it
                # ends exactly at a cadence boundary (its last consumed
                # step is then the boundary-1 step in EVERY spc/chunk
                # grouping) or on a stiff stop (also grouping-invariant).
                upd = (((end % FEEDBACK_CADENCE == 0) & (n_done > 0))
                       | (stopped == 1))
                ns_stats = jnp.where(upd, kstats, state.ns_stats)
                state = FactorVIState(
                    mu, f, state.finv, key, end,
                    state.n_accepted + n_acc,
                    state.n_rejected + (n_done - n_acc), ns_stats)

                def replay(s):
                    with jax.default_matmul_precision("float32"):
                        reg = jnp.asarray(regf(s.step), jnp.float32)

                        def svd_attempt(eps, s):
                            vs = lp_g(s.mean + eps @ s.factor.T)
                            mu_n, f_n, good = bam_eps_update(
                                eps, vs.astype(jnp.float32), s.mean,
                                s.factor, reg, solver=solver)
                            return (mu_n.astype(jnp.float32),
                                    f_n.astype(jnp.float32), good)

                        # First attempt reuses the kernel's own draw for
                        # this step (exact-parity replacement of the stiff
                        # result, not a resample).
                        mu_n, f_n, good = svd_attempt(eps_block[n_done], s)
                        if retries > 0:
                            # Retry stream: negative fold indices, disjoint
                            # from the per-step eps stream.
                            rkey = jax.random.fold_in(key, -s.step - 1)

                            def cond(c):
                                _, _, _, good, tries = c
                                return jnp.logical_and(~good,
                                                       tries < retries)

                            def rbody(c):
                                rkey, _, _, _, tries = c
                                rkey, ks = jax.random.split(rkey)
                                eps = jax.random.normal(
                                    ks, (batch_size, d), jnp.float32)
                                mu_n, f_n, good = svd_attempt(eps, s)
                                return rkey, mu_n, f_n, good, tries + 1

                            _, mu_n, f_n, good, _ = jax.lax.while_loop(
                                cond, rbody,
                                (rkey, mu_n, f_n, good,
                                 jnp.zeros((), jnp.int32)))
                        g32 = good.astype(jnp.int32)
                        return FactorVIState(
                            jnp.where(good, mu_n, s.mean),
                            jnp.where(good, f_n, s.factor),
                            s.finv, key, s.step + 1,
                            s.n_accepted + g32, s.n_rejected + (1 - g32),
                            s.ns_stats)

                return jax.lax.cond(stopped > 0, replay, lambda s: s, state)

            return jax.lax.while_loop(
                lambda s: s.step - step0 < k, body, state)

        return run_chunk

    def fit(self, key, regf, mean=None, cov=None, batch_size=2, niter=5000,
            nprint=10, verbose=True, check_goodness=True, monitor=None,
            retries=10, jitter=None, return_state=False, state=None,
            audit_every=0, audit_tol=1e-3):
        """Signature parity with ``BaM.fit`` (reference ``gsmvi/bam.py:140``);
        ``regf`` must be a pure function of the iteration index.  ``jitter``
        is accepted for surface parity but inert: the factor route's
        proposal is PD by construction (ops/bam_eps.py).

        ``audit_every`` — when > 0 and the fused Pallas path is active,
        periodically compare the (tiered) fused NS update against the exact
        XLA thin-SVD path on a fresh stream-disjoint draw from the live
        state (utils/audit.py); accepted non-stiff steps deviating beyond
        ``audit_tol`` warn.  Records land in ``self.audit_log``."""
        dtype = self.dtype
        if state is None:
            mean0 = (jnp.zeros(self.D, dtype) if mean is None
                     else jnp.asarray(mean, dtype))
            f0 = (jnp.eye(self.D, dtype=dtype) if cov is None
                  else safe_cholesky(jnp.asarray(cov, dtype)))
            zero = jnp.zeros((), jnp.int32)
            state = FactorVIState(mean0, f0, jnp.zeros((0, 0), dtype), key,
                                  zero, zero, zero)
        probe = jax.ShapeDtypeStruct((batch_size, self.D), dtype)
        if not is_traceable(self.lp_g, probe):
            raise TypeError("FactorBaM requires a jax-traceable lp_g; "
                            "use BaM for plain-numpy score functions")
        mode = self._pallas_mode(batch_size)
        # The key must cover EVERYTHING the compiled runner closes over:
        # hashable config inline, unhashable objects (regf, the pallas_score
        # pair) by pinned identity — a stale hit on a mutated fitter would
        # silently fit the wrong target (RunnerCache docstring).
        score_objs = ()
        if self.pallas_score is not None:
            score_objs = (self.pallas_score[0], *self.pallas_score[1])
        run_chunk = self._runners.get(
            (batch_size, retries, mode, self.steps_per_call, self.solver,
             self.lmax_gate, self.gu_gate, self.ns_iters, self.ns_profile,
             self._interpret),
            (regf, *score_objs),
            lambda: (self._make_fused_runner(batch_size, regf, retries)
                     if mode == "step" else
                     make_chunk_runner(
                         self._make_step(batch_size, regf, retries))))
        state_hook = None
        if audit_every:
            state_hook = self._make_audit_hook(batch_size, regf, audit_tol)
        state = run_fit_loop(
            None,  # cached run_chunk carries the body
            state,
            niter,
            monitor=monitor,
            monitor_params=lambda s: [s.mean, factor_to_cov(s.factor)],
            lp=self.lp,
            nprint=nprint,
            verbose=verbose,
            batch_size=batch_size,
            run_chunk=run_chunk,
            state_hook=state_hook,
            state_hook_every=audit_every,
        )
        if return_state:
            return state
        return state.mean, factor_to_cov(state.factor)

    def fit_batch(self, keys, regf, mean=None, cov=None, batch_size=2,
                  niter=5000, retries=10, return_state=False):
        """K independent FactorBaM replicas in one compiled program.

        Same contract as ``BaM.fit_batch``; ``regf`` must be a pure
        schedule.  Replica fits vmap the step; vmap-of-pallas_call has no
        batching rule, so the XLA path is forced (as FactorGSM.fit_batch).
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
            zero = jnp.zeros((), jnp.int32)
            return FactorVIState(m, safe_cholesky(c),
                                 jnp.zeros((0, 0), dtype), kk, zero, zero,
                                 zero)

        state = jax.vmap(init_one)(keys, means0, covs0)
        step = jax.vmap(self._make_step(batch_size, regf, retries,
                                        allow_pallas=False))

        @jax.jit
        def run(s):
            return jax.lax.scan(lambda c, _: (step(c), None), s, None,
                                length=niter + 1)[0]

        state = run(state)
        if return_state:
            return state
        return state.mean, jax.vmap(factor_to_cov)(state.factor)
