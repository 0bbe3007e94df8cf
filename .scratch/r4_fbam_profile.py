"""Ask #7 probe: where does the FactorBaM XLA step spend its time at small D?

Times, in-scan on the real chip with differential windows:
  (a) full factor eps step at newton_iters {20, 5} x solver {auto, eigh, svd}
  (b) isolated small-space pieces: NS chain alone, 33x33 eigh, thin SVD
  (c) dense full-rank BaM fitter vs FactorBaM XLA fitter (ties to bench)

All jitted functions take REAL ARGUMENTS (key/state) — a zero-arg closure
lets XLA constant-fold the entire scan at compile time (hangs the remote
compile service; learned the hard way).
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gsmvi_tpu.models import dense_gaussian
from gsmvi_tpu.ops.bam_eps import apply_bam_eps_step
from gsmvi_tpu.ops.gsm_factor import _update_corr

B = 32
N1, N2 = 300, 1500


def timed(go):
    """Differential in-scan timing: go(n, seed) runs n steps; us/step."""
    np.asarray(go(N1, 0))  # compile
    np.asarray(go(N2, 0))
    best = float("inf")
    for s in range(2):
        t0 = time.perf_counter()
        np.asarray(go(N1, s))
        t1 = time.perf_counter()
        np.asarray(go(N2, s))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (N2 - N1))
    return 1e6 * best


def factor_step_go(d, solver, ni, t):
    def step(carry, i):
        mean, f, key = carry
        key, k = jax.random.split(key)
        eps = jax.random.normal(k, (B, d), jnp.float32)
        x = mean + eps @ f.T
        vs = t.lp_g(x).astype(jnp.float32)
        reg = 100.0 / (1.0 + 0.01 * i.astype(jnp.float32))
        mean, f, good = apply_bam_eps_step(mean, f, eps, vs, reg,
                                           newton_iters=ni, solver=solver)
        return (mean, f, key), ()

    from functools import partial

    @partial(jax.jit, static_argnums=0)
    def run(n, seed):
        c0 = (jnp.zeros(d, jnp.float32), jnp.eye(d, dtype=jnp.float32),
              jax.random.PRNGKey(seed))
        c, _ = jax.lax.scan(step, c0, jnp.arange(n))
        return c[0]

    return run


def piece_go(d, which):
    def step(g, i):
        g = g + 1e-6 * i  # depend on the scan index: no loop-hoisting
        if which.startswith("ns"):
            cu, _ = _update_corr(g, int(which[2:]))
            g = 0.5 * (cu + cu.T) + jnp.eye(g.shape[0], dtype=g.dtype)
        elif which == "eigh":
            w, q = jnp.linalg.eigh(g)
            g = (q * jnp.maximum(w, 0.5)) @ q.T
        elif which == "svd":
            y = jnp.broadcast_to(g[:1], (d, g.shape[0])) + g[0, 0]
            u, s, _ = jnp.linalg.svd(y, full_matrices=False)
            g = (u.T @ u) * jnp.maximum(s, 0.5)[None, :]
            g = 0.5 * (g + g.T) + jnp.eye(g.shape[0], dtype=g.dtype)
        return g, ()

    from functools import partial

    @partial(jax.jit, static_argnums=0)
    def run(n, seed):
        g0 = jnp.eye(B + 1, dtype=jnp.float32) * (1.5 + 1e-3 * seed)
        g, _ = jax.lax.scan(step, g0, jnp.arange(n))
        return g

    return run


def fitter_go(d, t, cls_name):
    from gsmvi_tpu import BaM, FactorBaM, Regularizers
    regf = Regularizers().linear(100.0)
    if cls_name == "dense":
        g = BaM(D=d, lp=t.lp, lp_g=t.lp_g, use_factor=False)
    else:
        g = FactorBaM(D=d, lp=t.lp, lp_g=t.lp_g, use_pallas=False)

    def run(n, seed):
        m, c = g.fit(jax.random.PRNGKey(seed), regf=regf, niter=n,
                     batch_size=B, verbose=False, retries=0)
        return jnp.asarray(m)

    return run


for d in (64, 256):
    t = dense_gaussian(jax.random.PRNGKey(3), d)
    out = {"d": d}
    for solver in ("auto", "eigh", "svd"):
        for ni in ((20, 5) if solver == "auto" else (20,)):
            out[f"step_{solver}_ns{ni}_us"] = round(
                timed(factor_step_go(d, solver, ni, t)), 1)
            print(json.dumps(out), flush=True)
    for which in ("ns20", "ns5", "eigh", "svd"):
        out[f"piece_{which}_us"] = round(timed(piece_go(d, which)), 1)
        print(json.dumps(out), flush=True)
    for cls_name in ("dense", "factor"):
        out[f"fit_{cls_name}_us"] = round(timed(fitter_go(d, t, cls_name)),
                                          1)
        print(json.dumps(out), flush=True)
print("DONE", flush=True)
