"""Benchmark: TPU-native fit throughput across the full fitter x D matrix.

Output contract (round-2 lesson: the driver records only a bounded TAIL of
stdout, and embedding the full matrix in the final line truncated it to
unparseable — BENCH_r02.json lost the round's headline number):

1. the full evidence matrix is written to ``BENCH_MATRIX.json`` next to this
   file AND printed as its own (early) stdout line;
2. the LAST stdout line is a SHORT one-line JSON — only
   {"metric", "value", "unit", "vs_baseline", "path", "baseline_iters_per_s"}
   — guaranteed to survive any tail window >= ~200 bytes.

The primary metric is GSM iters/s at D=256, B=32 (the BASELINE.json
north-star axis), measured on the fastest GSM path this build ships.  The
matrix carries the whole evidence grid the round-1 review asked for:
{gsm, gsm_fused, factor_gsm, bam, bam_fused, bam_lowrank, factor_bam, advi}
x D in {64, 256, 1024} with iters/s, score-evals/s/chip and final moment
errors, plus the ill-conditioned D=512 target.

The baseline is the reference's *structure* re-staged faithfully on this
machine (per SURVEY.md §6 the reference publishes no numbers): per-iteration
Python dispatch of a jitted update, host-side ``np.random.multivariate_
normal`` sampling, and a host ``np.linalg.cholesky`` goodness check per
iteration (``gsmvi/gsm.py:107-129``), timed as a median of 3 runs so the
ratio is a stable regression signal.

Compile-time strategy: a persistent compilation cache under .jax_cache/
(remote-tunnel compiles are minutes-slow and high-variance; cached reruns
are seconds).  A wall-clock budget skips remaining matrix cells gracefully
if the cache is cold, so the primary metric always lands.
"""

import json
import os
import time

import numpy as np

B = 32
PRIMARY_D = 256
# Iteration budgets sized for convergence: GSM's rank-B steps need O(D/B)
# x mixing iterations, so the large-D cells get more; ADVI converges much
# slower per iteration and gets its own (smaller at D=1024 where its step
# is ~40ms).  2048 is the documented fused-kernel VMEM ceiling: the class
# default self-gates onto the XLA eps route there (round-5 driver row).
NITER = {64: 60000, 256: 40000, 512: 20000, 1024: 16000, 2048: 24000}
# Dense-state BaM path (use_factor=False): reference-shaped state, slower.
NITER_BAM = {64: 16000, 256: 8000, 512: 2000, 1024: 3000}
# The BaM class default now delegates to the factor route (fused update
# kernel on TPU: 26.2k/23.1k/7.2k it/s) — windows sized to >=1 s there.
NITER_BAM_FACTOR = {64: 40000, 256: 30000, 512: 12000, 1024: 10000}
# bam_fused runs at 85k/65k/14k it/s (ladder, quiet machine): the shared
# NITER table gave it 0.3-0.5 s differential windows, which tunnel jitter
# underreads 3x (measured in the r3 driver-style run: 20.9k vs 58k @256
# for the same build at 100k iters).  >=1.5 s windows; the 1024 cell gets
# ~4 s (the round-3 driver artifact underread it 4.9x at a 1.1 s window
# with no host-side contention flag — device-side tunnel contention, which
# the dispatch sentinel cannot see; see _device_sentinel_s).
# Round-5 restructured rates (quiet box, corroborated): 77.8k/54.4k/45.6k/
# 14.9k at 64/256/512/1024 — windows >=1.5 s; the 1024 cell gets ~7 s (its
# round-3/round-5 driver runs read 2-4x low in shorter windows from
# device-side tunnel dips the sentinels cannot always catch).
NITER_BAM_FUSED = {64: 250_000, 256: 120_000, 512: 80_000, 1024: 100_000}
# ADVI's step is fast (measured 67 us raw at D=1024) but short fits are
# measurement-floor-bound on the tunneled device; budgets sized so the
# differential window is >~1 s of compute (cells with shorter windows
# read 2-3x low/high run-to-run from tunnel jitter).
NITER_ADVI = {64: 60000, 256: 40000, 512: 4000, 1024: 8000}
# The fused ADVI kernel runs ~1M/434k/42k it/s at 64/256/1024 (measured
# round 3): it needs million-scale budgets for a >=1 s window.
NITER_ADVI_FUSED = {64: 4_000_000, 256: 1_500_000, 512: 100_000,
                    1024: 300_000}
# Two-phase accuracy cell (fused bulk + annealed STL polish): sized so the
# final phase anneals long enough to land on the STL floor (the D=256
# recipe measured 0.0065 cov_err at this budget).  At D=1024 the fused STL
# kernel is VMEM-gated off, so the recipe is fused analytic bulk + XLA-STL
# polish (VERDICT r3 item #3); convergence there is sample-averaging-bound
# (measured: cov_err halves every ~2.8M iters at B=32 REGARDLESS of lr
# 1e-2..3e-2 or batch 32..128 at fixed total score evals), so the cell
# needs ~36M B=32-equivalent samples; the recipe runs the bulk at B=512
# where the fused kernel moves 3.83M samples/s (2.9x the B=32 rate — the
# per-iteration D^2 cost amortizes over the batch), landing the cell in
# ~5 min single-run — a budget the reference's host-loop ADVI cannot
# touch.  The value below is BULK ITERATIONS AT B=512 (2.25M iters x 512
# = 36.9M equiv samples + a 205k-iter B=32 XLA-STL polish); the 1024
# cell times ONE run (accuracy evidence; differential timing would
# triple a ~5 min cell).
NITER_TWOPHASE = {64: 900_000, 256: 4_500_000, 512: 1_500_000,
                  1024: 2_250_000}
NITER_BASE = 150
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "2700"))
# "0"/"false" must mean OFF: bool("0") is True, and an accidental smoke
# run records a corrupted primary metric (no cell converges at 50 iters).
SMOKE = os.environ.get("BENCH_SMOKE", "") not in ("", "0", "false",
                                                  "False")
_T0 = time.time()


def _remaining():
    return BUDGET_S - (time.time() - _T0)


def _setup_cache():
    import jax

    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


_SENTINEL = {"fn": None, "quiet_ms": None, "dev_fn": None,
             "dev_quiet_s": None}


def _dispatch_ms():
    """Host->device->host round-trip of a trivial jitted op, in ms (min of 3).

    On the tunneled device this is ~35 ms quiet; host contention (another
    process starving the dispatch thread — the round-2 failure mode that
    deflated BaM/ADVI cells 3-5x) inflates it well before it corrupts a
    differential timing, so it doubles as a cheap contention probe."""
    import jax
    import jax.numpy as jnp

    if _SENTINEL["fn"] is None:
        _SENTINEL["fn"] = jax.jit(lambda x: x + 1.0)
        np.asarray(_SENTINEL["fn"](jnp.zeros(())))  # compile outside timing
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(_SENTINEL["fn"](jnp.zeros(())))
        ts.append(time.perf_counter() - t0)
    return 1000.0 * min(ts)


def _device_sentinel_s():
    """Wall time of a fixed ~0.2 s DEVICE-side compute (jitted matmul loop),
    min of 2.  The dispatch sentinel above only sees HOST starvation; the
    round-3 driver run underread the bam_fused@1024 cell 4.9x with the
    dispatch sentinel green — device/tunnel-side contention (another user
    of the shared relay) inflates this probe instead."""
    import jax
    import jax.numpy as jnp

    if _SENTINEL["dev_fn"] is None:
        @jax.jit
        def f(x):
            return jax.lax.fori_loop(
                0, 4000, lambda i, a: a @ a * 0.999 + 0.001 * jnp.eye(
                    a.shape[0], dtype=a.dtype), x)

        _SENTINEL["dev_fn"] = f
        np.asarray(f(jnp.eye(256, dtype=jnp.float32)))  # compile untimed
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(_SENTINEL["dev_fn"](jnp.eye(256, dtype=jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _contended():
    """True when either sentinel reads well above its quiet-machine floor:
    host dispatch >2x (host starvation) or device compute >1.6x
    (device/tunnel contention)."""
    if _SENTINEL["quiet_ms"] is None:
        _SENTINEL["quiet_ms"] = _dispatch_ms()
    if _SENTINEL["dev_quiet_s"] is None:
        _SENTINEL["dev_quiet_s"] = _device_sentinel_s()
    host_hot = _dispatch_ms() > max(2.0 * _SENTINEL["quiet_ms"],
                                    _SENTINEL["quiet_ms"] + 15.0)
    dev_hot = _device_sentinel_s() > max(
        1.6 * _SENTINEL["dev_quiet_s"], _SENTINEL["dev_quiet_s"] + 0.1)
    return host_hot or dev_hot


def _crash_recover(e: Exception):
    """The tunneled TPU worker occasionally crashes on heavy programs
    ("UNAVAILABLE: TPU worker process crashed or restarted") and comes back
    by itself; without a pause every subsequent cell errors too (measured:
    the round-5 run-C batch sweep lost 3 cells to one crash).  Sleep long
    enough for the worker to reconnect before the next cell."""
    msg = str(e)
    if "UNAVAILABLE" in msg or "crashed" in msg or "restarted" in msg:
        time.sleep(75.0)


def _targets():
    import jax

    from gsmvi_tpu.models import dense_gaussian, ill_conditioned_gaussian

    ds = [64, 256] if SMOKE else [64, 256, 1024]
    t = {d: dense_gaussian(jax.random.PRNGKey(3), d) for d in ds}
    if not SMOKE:
        t["ill512"] = ill_conditioned_gaussian(jax.random.PRNGKey(5), 512,
                                               1e4)
        # Large-D ceiling row: the fused kernels self-gate off at D~2048
        # (VMEM); the class default runs the XLA eps route there.
        t[2048] = dense_gaussian(jax.random.PRNGKey(7), 2048)
    return t


def _errs(mean, cov, target):
    m = float(np.max(np.abs(np.asarray(mean) - np.asarray(target.mean))))
    scale = max(1.0, float(np.abs(np.asarray(target.cov)).max()))
    c = float(np.max(np.abs(np.asarray(cov) - np.asarray(target.cov)))) / scale
    return round(m, 5), round(c, 5)


def _time_fit(run, niter, target):
    """(iters/s, mean_err, cov_err) by DIFFERENTIAL timing.

    The tunneled device has ~35 ms of fixed dispatch+transfer latency per
    program invocation (measured; ``block_until_ready`` does not sync on
    this platform, so each timing ends with a host transfer).  Timing two
    different iteration counts and differencing cancels that fixed cost:
        it/s = (n2 - n1) / (t(n2) - t(n1)).
    """
    n1 = max(2, niter // 4)
    mean, cov = run(niter)     # warm/compile the long program
    np.asarray(mean)
    mean, cov = run(n1)        # warm/compile the short program
    np.asarray(mean)

    # Two timed attempts, best kept: noise (host hiccups, tunnel jitter)
    # only ever INFLATES wall time, so max-rate is the estimator closest to
    # truth (a one-off stall once deflated a cell 10x).  When the attempts
    # DISAGREE >1.35x, one of them stalled — keep timing (up to 2 extra
    # attempts) so a transient does not land as the cell's value.
    best, em, ec = 0.0, None, None
    rates = []
    for attempt in range(4):
        t0 = time.perf_counter()
        m1, c1 = run(n1)
        np.asarray(m1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        mean, cov = run(niter)
        np.asarray(mean)
        t2 = time.perf_counter() - t0
        em, ec = _errs(mean, cov, target)
        # Guard against timing noise making t2 <= t1 (both runs latency-
        # bound): cap the differential estimate at 2x the single-run rate,
        # which is itself a (latency-biased) lower bound.
        single = (niter + 1) / max(t2, 1e-9)
        if t2 - t1 <= 0:
            rate = single
        else:
            rate = min((niter - n1) / (t2 - t1), 2.0 * single)
        rates.append(rate)
        best = max(best, rate)
        # Stop once the best rate is CORROBORATED: the two largest attempts
        # agree within 1.35x (one high reading could itself be noise-free
        # while the others stalled — confirm it before trusting it).
        if len(rates) >= 2 and best <= 1.35 * sorted(rates)[-2]:
            break
    return best, em, ec


def bench_matrix(targets):
    import jax

    from gsmvi_tpu import (ADVI, BaM, FactorBaM, FactorGSM, GSM, Regularizers)

    results = {}

    def add(name, d, maker, accuracy_only=False):
        if _remaining() < (420 if accuracy_only else 120):
            results.setdefault(name, {})[str(d)] = None
            return
        t = targets[d] if d in targets else targets["ill512"]
        # bam_fused runs at GSM-like rates: it needs the GSM iteration
        # budget to keep its differential window >= ~1 s of compute.
        table = (NITER_ADVI_FUSED if name == "advi_fused"
                 else NITER_TWOPHASE if name == "advi_twophase"
                 else NITER_ADVI if name.startswith("advi")
                 else NITER_BAM_FUSED if name == "bam_fused"
                 else NITER_BAM_FACTOR if name in ("bam", "bam_lowrank")
                 else NITER_BAM if "bam" in name else NITER)
        niter = table[t.d] if not SMOKE else 50
        try:
            run = maker(t)
            flagged = _contended()
            if accuracy_only:
                # One full run, wall-timed: the headline of this cell is
                # the converged moments; its multi-minute budget makes
                # differential (3x) timing unaffordable, and the ~35 ms
                # tunnel latency is noise at this scale.
                t0 = time.perf_counter()
                mean, cov = run(niter)
                np.asarray(mean)
                wall = time.perf_counter() - t0
                em, ec = _errs(mean, cov, t)
                spi = getattr(run, "samples_per_iter", B)
                cell = {
                    "iters_per_s": round(niter / wall, 1),
                    "score_evals_per_s": round(niter / wall * spi, 1),
                    "mean_err": em, "cov_err": ec,
                    "converged": bool(ec < 0.05),
                    "wall_s": round(wall, 1),
                    "note": "single-run accuracy cell"
                            + (f" (bulk batch {spi})" if spi != B else ""),
                }
                if _contended():
                    cell["contended"] = True
                results.setdefault(name, {})[str(d)] = cell
                return
            ips, em, ec = _time_fit(run, niter, t)
            if flagged or _contended():
                # Contended window: one retry (rates only deflate under
                # contention, so keep the max), then flag if still hot.
                time.sleep(2.0)
                ips2, em, ec = _time_fit(run, niter, t)
                ips = max(ips, ips2)
                flagged = _contended()
            cell = {
                "iters_per_s": round(ips, 1),
                "score_evals_per_s": round(ips * B, 1),
                "mean_err": em, "cov_err": ec,
                # Machine-readable convergence flag (VERDICT r4 #5): a
                # script filtering regressions must not confuse a
                # deliberately-short throughput window with a convergence
                # regression.
                "converged": bool(ec < 0.05),
            }
            if flagged:
                cell["contended"] = True
            if name.startswith("advi") and name != "advi_twophase":
                # ELBO/Adam convergence on these stiff targets is method-
                # limited (the covariance scale must grow ~30x through
                # MC-noisy per-entry steps); a 30k-iter CPU run still sits
                # at cov_err ~0.87.  The reference's estimator is identical;
                # errs here measure the method, not this implementation —
                # see tests/test_fitters.py for ADVI recovery on scaled
                # targets.  These rows are THROUGHPUT cells: the converged
                # ADVI accuracy evidence is the advi_twophase row (and, for
                # STL, the docs/BENCHMARKS.md ledger — e.g. the stiff-256
                # plateau at 0.075 needs budgets this window does not
                # spend; an unconverged advi_stl cell here contradicts
                # nothing).
                cell["throughput_only"] = True
                cell["note"] = "optimizer-limited convergence; same as ref"
                if name == "advi_stl":
                    cell["note"] += ("; window sized for throughput — "
                                     "converged STL accuracy ledger: "
                                     "docs/BENCHMARKS.md")
            results.setdefault(name, {})[str(d)] = cell
        except Exception as e:  # record the failure, keep benching
            results.setdefault(name, {})[str(d)] = {"error": str(e)[:200]}
            _crash_recover(e)

    def gsm_run(t, **kw):
        g = GSM(D=t.d, lp=t.lp, lp_g=t.lp_g, **kw)
        return lambda n: g.fit(jax.random.PRNGKey(0), niter=n, batch_size=B,
                               verbose=False)

    def fgsm_run(t, **kw):
        g = FactorGSM(D=t.d, lp=t.lp, lp_g=t.lp_g, **kw)
        return lambda n: g.fit(jax.random.PRNGKey(0), niter=n, batch_size=B,
                               verbose=False)

    def bam_run(t, **kw):
        g = BaM(D=t.d, lp=t.lp, lp_g=t.lp_g, **kw)
        return lambda n: g.fit(jax.random.PRNGKey(0),
                               regf=Regularizers().linear(100.0), niter=n,
                               batch_size=B, verbose=False, retries=0)

    def fbam_run(t, **kw):
        g = FactorBaM(D=t.d, lp=t.lp, lp_g=t.lp_g, **kw)
        return lambda n: g.fit(jax.random.PRNGKey(0),
                               regf=Regularizers().linear(100.0), niter=n,
                               batch_size=B, verbose=False, retries=0)

    def advi_run(t):
        import optax

        g = ADVI(D=t.d, lp=t.lp)
        # return_losses=False: the loss-trace host transfer scales with n
        # and would NOT cancel in the differential timing.
        return lambda n: g.fit(jax.random.PRNGKey(0), optax.adam(1e-2),
                               niter=n, batch_size=B, verbose=False,
                               return_losses=False)[:2]

    def advi_fused_run(t):
        g = ADVI(D=t.d, lp=t.lp, pallas_score=t.pallas_score)
        return lambda n: g.fit_fused(jax.random.PRNGKey(0),
                                     learning_rate=1e-2, niter=n,
                                     batch_size=B, verbose=False)[:2]

    def advi_stl_run(t):
        import optax

        g = ADVI(D=t.d, lp=t.lp)
        return lambda n: g.fit(jax.random.PRNGKey(0), optax.adam(1e-2),
                               niter=n, batch_size=B, verbose=False,
                               return_losses=False, estimator="stl")[:2]

    def advi_twophase(t):
        """Accuracy evidence cell: fused analytic bulk (1/3 of the budget)
        + annealed fused-STL polish (2/9 at lr 3e-3, 4/9 at 1e-3) — the
        docs/BENCHMARKS.md 'ADVI accuracy recipe'.  Reported iters_per_s
        is total iterations over total wall; the headline is the converged
        moment errors, which land two orders below the single-phase ADVI
        plateau on the stiff D=256 target (cov_err 0.87 -> ~0.007)."""
        g = ADVI(D=t.d, lp=t.lp, pallas_score=t.pallas_score)

        if t.d > 512:
            # Fused STL is VMEM-gated off here: fused ANALYTIC bulk at
            # BATCH 512 + a short XLA-STL polish (VERDICT r3 item #3).
            # Measured (2026-08-19, D=1024): convergence is a pure
            # function of TOTAL SAMPLES — invariant to lr (1e-2/3e-2/1e-1
            # bit-for-bit indistinguishable errs) and to batch at equal
            # samples (B=32/128/512 trajectories overlay) — and the fused
            # kernel's per-iteration D^2 overhead amortizes with B, so
            # B=512 delivers 3.83M samples/s vs B=32's 1.33M: the same
            # accuracy lands 2.9x faster on the wall.  cov_err decays
            # geometrically ~0.68x per 4M B32-equiv samples past 12M
            # (0.228@12M, 0.082@24M, ~0.04@36M).  The run_fit_loop
            # program-length cap keeps every device program <= 1M steps
            # (axon worker watchdog).
            def run(n):
                st, _ = g.fit_fused(jax.random.PRNGKey(0),
                                    learning_rate=1e-2, niter=n,
                                    batch_size=512, verbose=False,
                                    return_state=True,
                                    max_steps_per_call=400_000)
                st, _ = g.fit_fused(jax.random.PRNGKey(2),
                                    learning_rate=1e-3,
                                    niter=max(2, n // 11),
                                    batch_size=B, verbose=False, state=st,
                                    return_state=True, estimator="stl")
                return st.loc, g.scales_to_cov(st.l if hasattr(st, "l")
                                               else st.scales)

            run.samples_per_iter = 512  # accuracy cell: honest evals/s
            return run

        def run(n):
            f = lambda frac: max(2, int(n * frac))
            st, _ = g.fit_fused(jax.random.PRNGKey(0), learning_rate=1e-2,
                                niter=f(1 / 3), batch_size=B, verbose=False,
                                return_state=True)
            st, _ = g.fit_fused(jax.random.PRNGKey(1), learning_rate=3e-3,
                                niter=f(2 / 9), batch_size=B, verbose=False,
                                state=st, return_state=True,
                                estimator="stl")
            st, _ = g.fit_fused(jax.random.PRNGKey(2), learning_rate=1e-3,
                                niter=f(4 / 9), batch_size=B, verbose=False,
                                state=st, return_state=True,
                                estimator="stl")
            # Off-TPU the legs fall back to fit() and return ADVIState
            # (scales), on-TPU the fused state carries l — both feed
            # scales_to_cov.
            return st.loc, g.scales_to_cov(st.l if hasattr(st, "l")
                                           else st.scales)

        return run

    # Uniform 64/256/512/1024 coverage for every family (VERDICT r4 #7) —
    # the 512 column runs the ill-conditioned (cond 1e4) target.
    ds = [64, 256] if SMOKE else [64, 256, 512, 1024]
    for d in ds:
        # "gsm" is the SHIPPED class default (use_factor="auto": the
        # factor-route delegation on TPU, VERDICT r4 #2); "gsm_dense" pins
        # the dense reference-equivalent trajectory (use_factor=False).
        add("gsm", d, lambda t: gsm_run(t))
        add("gsm_fused", d,
            lambda t: fgsm_run(t, pallas_score=t.pallas_score))
        add("factor_gsm", d, lambda t: fgsm_run(t, use_pallas=False))
        add("gsm_dense", d, lambda t: gsm_run(t, use_pallas=False,
                                              use_factor=False))
        add("bam", d, lambda t: bam_run(t))
        add("bam_lowrank", d, lambda t: bam_run(t, use_lowrank=True))
        add("bam_dense", d, lambda t: bam_run(t, use_factor=False))
        add("factor_bam", d, lambda t: fbam_run(t, use_pallas=False))
        add("bam_fused", d,
            lambda t: fbam_run(t, pallas_score=t.pallas_score))
        add("advi", d, lambda t: advi_run(t))
        add("advi_fused", d, lambda t: advi_fused_run(t))
        add("advi_stl", d, lambda t: advi_stl_run(t))
        if d in NITER_TWOPHASE:
            add("advi_twophase", d, lambda t: advi_twophase(t),
                accuracy_only=(d > 512))
    if not SMOKE:
        # Large-D ceiling row (VERDICT r4 #6): at D=2048 the fused kernels
        # self-gate off (measured 144.58 MB vmem vs the chip's 128 MB —
        # physical, docs/BENCHMARKS.md) and the class default runs the XLA
        # eps route; this cell pins that documented capability in the
        # driver artifact with converged moments.
        add("gsm", 2048, lambda t: gsm_run(t))
    return results


def fit_batch_evidence(targets):
    """Aggregate-throughput evidence: K replicas in one compiled program.

    Two routes per cell (VERDICT r4 #1): "fused" — the round-5 K-replica
    fused Pallas kernel (ops/pallas/batch_fused.py: replica axis = the
    Pallas grid, steps_per_call fused sub-steps per replica per grid step,
    fold_in eps so each replica matches the same-key single fused fit) —
    and "ns", the round-4 baseline (the NS small space traced as plain XLA,
    batched matmuls across K).  vmap-of-the-single-replica-kernel remains
    measured-slower than both (one re-dispatched grid cell per STEP per
    replica) and is not benched."""
    import jax

    from gsmvi_tpu import FactorGSM

    out = {}
    cells = ((64, 8, 20000), (64, 32, 20000), (256, 8, 8000), (256, 32, 4000))
    for d, k, niter in cells:
        if _remaining() < 180:
            break
        if d not in targets:
            continue
        if SMOKE:
            niter = 50
        t = targets[d]
        for solver in ("fused", "ns"):
            if _remaining() < 120:
                break
            try:
                g = FactorGSM(D=t.d, lp=t.lp, lp_g=t.lp_g,
                              pallas_score=(t.pallas_score
                                            if solver == "fused" else None))
                keys = jax.random.split(jax.random.PRNGKey(0), k)

                def run(n):
                    m, c = g.fit_batch(keys, batch_size=B, niter=n,
                                       small_solver=solver)
                    return m[0], c[0]

                ips, em, ec = _time_fit(run, niter, t)
                out[f"D{d}_K{k}_{solver}"] = {
                    "iters_per_s_per_replica": round(ips, 1),
                    "aggregate_iters_per_s": round(ips * k, 1),
                    "aggregate_score_evals_per_s": round(ips * k * B, 1),
                    "mean_err": em, "cov_err": ec,
                    "converged": bool(ec < 0.05),
                }
            except Exception as e:
                out[f"D{d}_K{k}_{solver}"] = {"error": str(e)[:200]}
                _crash_recover(e)
    return out


def batch_sweep(targets):
    """North-star samples/s frontier (VERDICT r4 #4): fused-kernel batch
    scaling.  The measured fused-ADVI step-cost model
    (~(17 + 0.23 B)(D/1024)^2 us) says BATCH is the score-evals/s lever;
    this section measures the same frontier for the GSM and BaM fused
    whole-step kernels at B in {32, 128, 512}, D in {256, 1024}.  Cells
    record whether the fused kernel was actually active — the VMEM gate is
    B-dependent (the (spc*B, D) eps block + ~16 (B, D) row tensors ride in
    VMEM), so large (B, D) corners legitimately fall back to the XLA eps
    path and are labeled as such."""
    import jax

    from gsmvi_tpu import FactorBaM, FactorGSM, Regularizers

    out = {}
    for d in (256, 1024):
        if d not in targets:
            continue
        t = targets[d]
        for b in (32, 128, 512):
            if _remaining() < 240:
                return out
            # Window sizing from the measured per-step cost shape
            # (~(a + c*B)(D/1024)^2): target >= ~1.5 s differential windows.
            est_us = (30.0 + 0.6 * b) * (d / 1024.0) ** 2 + 6.0
            niter = int(min(200_000, max(3000, 1.5e6 / est_us)))
            if SMOKE:
                niter = 50
            try:
                g = FactorGSM(D=t.d, lp=t.lp, lp_g=t.lp_g,
                              pallas_score=t.pallas_score)
                run = (lambda g: lambda n: g.fit(
                    jax.random.PRNGKey(0), niter=n, batch_size=b,
                    verbose=False))(g)
                ips, em, ec = _time_fit(run, niter, t)
                out[f"gsm_fused_D{d}_B{b}"] = {
                    "iters_per_s": round(ips, 1),
                    "score_evals_per_s": round(ips * b, 1),
                    "mean_err": em, "cov_err": ec,
                    "converged": bool(ec < 0.05),
                    "fused_active": g._pallas_mode(b) == "step",
                }
            except Exception as e:
                out[f"gsm_fused_D{d}_B{b}"] = {"error": str(e)[:200]}
                _crash_recover(e)
            if d != 256:
                continue  # BaM sweep at the primary D only (compile budget)
            if b > 128:
                # The fused BaM kernel is batch-capped at 128 (gate note in
                # ops/pallas/bam_fused.py) and the XLA SVD route at B=512
                # destabilizes the tunneled worker (run-C crash took out
                # the rest of the sweep) — record the cap instead.
                out[f"bam_fused_D{d}_B{b}"] = {
                    "skipped": "fused kernel batch-capped at B<=128; "
                               "large-B BaM runs the XLA SVD route "
                               "(~261 it/s measured at B=512, "
                               ".scratch/r5_probe7.json)"}
                continue
            try:
                gb = FactorBaM(D=t.d, lp=t.lp, lp_g=t.lp_g,
                               pallas_score=t.pallas_score)
                runb = (lambda gb: lambda n: gb.fit(
                    jax.random.PRNGKey(0), regf=Regularizers().linear(100.0),
                    niter=n, batch_size=b, verbose=False, retries=0))(gb)
                ips, em, ec = _time_fit(runb, max(niter // 2, 3000), t)
                out[f"bam_fused_D{d}_B{b}"] = {
                    "iters_per_s": round(ips, 1),
                    "score_evals_per_s": round(ips * b, 1),
                    "mean_err": em, "cov_err": ec,
                    "converged": bool(ec < 0.05),
                    "fused_active": gb._pallas_mode(b) == "step",
                }
            except Exception as e:
                out[f"bam_fused_D{d}_B{b}"] = {"error": str(e)[:200]}
                _crash_recover(e)
    return out


def audit_evidence(targets):
    """Run-time exactness bound for the fused headline cells: a short
    AUDITED fit (``fit(audit_every=...)``, utils/audit.py) recording the
    max fused-vs-exact relative moment error over accepted audited steps —
    evidence that the fused throughput numbers in the matrix are not buying
    silent Newton-Schulz bias.  The shipped NS profiles audit at ~1e-6
    (f32 working accuracy); anything near 1e-3 would warn."""
    import jax

    from gsmvi_tpu import FactorBaM, FactorGSM, Regularizers

    if _remaining() < 120:
        return None
    t = targets[PRIMARY_D]
    niter, every = (400, 100) if SMOKE else (4000, 1000)
    out = {}

    def summarize(log):
        valid = [r for r in log if r["valid"]]
        return {
            "n_audits": len(log),
            "n_valid": len(valid),
            "max_rel_err": (max(max(r["mean_err"], r["cov_err"])
                                for r in valid) if valid else None),
        }

    try:
        g = FactorGSM(D=t.d, lp=t.lp, lp_g=t.lp_g,
                      pallas_score=t.pallas_score)
        g.fit(jax.random.PRNGKey(0), niter=niter, batch_size=B,
              verbose=False, audit_every=every)
        out["gsm_fused"] = summarize(g.audit_log)
    except Exception as e:
        out["gsm_fused"] = {"error": str(e)[:200]}
    if _remaining() < 120:
        return out
    try:
        b = FactorBaM(D=t.d, lp=t.lp, lp_g=t.lp_g,
                      pallas_score=t.pallas_score)
        b.fit(jax.random.PRNGKey(0), regf=Regularizers().linear(100.0),
              niter=niter, batch_size=B, verbose=False, retries=0,
              audit_every=every)
        out["bam_fused"] = summarize(b.audit_log)
    except Exception as e:
        out["bam_fused"] = {"error": str(e)[:200]}
    return out


def time_reference_structure(t):
    """Reference loop shape: host sampling + per-iter dispatch + host check;
    median of 3 runs (the single-shot timing was load-noisy, VERDICT #7)."""
    import jax

    from gsmvi_tpu.ops.gsm import gsm_update

    d = t.d
    rates = []
    s = np.random.default_rng(0).normal(size=(B, d))
    jax.block_until_ready(
        gsm_update(s, np.asarray(t.lp_g(s)), np.zeros(d), np.eye(d)))
    nbase = 20 if SMOKE else NITER_BASE
    for rep in range(3):
        mean = np.zeros(d)
        cov = np.eye(d)
        key = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        for i in range(nbase + 1):
            key, key_sample = jax.random.split(key)
            np.random.seed(int(jax.random.randint(key_sample, (), 0,
                                                  2**31 - 1)))
            samples = np.random.multivariate_normal(mean=mean, cov=cov,
                                                    size=B)
            vs = t.lp_g(samples)
            mean_new, cov_new = gsm_update(samples, vs, mean, cov)
            mean_new, cov_new = np.asarray(mean_new), np.asarray(cov_new)
            try:
                good = not np.isnan(np.linalg.cholesky(cov_new)).any()
            except Exception:
                good = False
            if good:
                mean, cov = mean_new, cov_new
        rates.append((nbase + 1) / (time.perf_counter() - t0))
    return float(np.median(rates))


def main():
    _setup_cache()
    targets = _targets()

    matrix = bench_matrix(targets)
    base_ips = time_reference_structure(targets[PRIMARY_D])

    # Primary metric: best GSM-family path at D=256.
    candidates = []
    for name in ("gsm_fused", "gsm", "factor_gsm"):
        cell = matrix.get(name, {}).get(str(PRIMARY_D))
        if cell and "iters_per_s" in cell and cell["cov_err"] < 0.05:
            candidates.append((cell["iters_per_s"], name))
    best_ips, best_name = max(candidates) if candidates else (0.0, "none")

    # Full evidence grid: a file + its own stdout line, BEFORE the final
    # metric line (the driver's tail window truncated an embedded matrix in
    # round 2 — VERDICT.md weak #1).
    full = {"artifact": "bench_matrix",
            "baseline_iters_per_s": round(base_ips, 2),
            "sentinel_quiet_ms": (round(_SENTINEL["quiet_ms"], 1)
                                  if _SENTINEL["quiet_ms"] else None),
            "dev_sentinel_quiet_s": (round(_SENTINEL["dev_quiet_s"], 3)
                                     if _SENTINEL["dev_quiet_s"] else None),
            "audit": audit_evidence(targets),
            "fit_batch": fit_batch_evidence(targets),
            "batch_sweep": batch_sweep(targets),
            "matrix": matrix}
    matrix_path = os.environ.get("BENCH_MATRIX_PATH") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_MATRIX.json")
    try:
        with open(matrix_path, "w") as fh:
            json.dump(full, fh, indent=1)
    except OSError:
        pass
    print(json.dumps(full), flush=True)

    # LAST line: short, parse-safe under any bounded tail capture.
    print(json.dumps({
        "metric": f"gsm_iters_per_s_d{PRIMARY_D}_b{B}",
        "value": round(best_ips, 2),
        "unit": "iters/s",
        "vs_baseline": round(best_ips / base_ips, 2) if base_ips else None,
        "path": best_name,
        "baseline_iters_per_s": round(base_ips, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
