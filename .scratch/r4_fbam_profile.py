"""Ask #7 probe: where does the FactorBaM XLA step spend its time at small D?

Times, in-scan on the real chip with differential windows:
  (a) full factor eps step at newton_iters in {20, 10, 5} x solver
      {auto, eigh, svd}  (synthetic-but-real lp_g = dense gaussian score)
  (b) the isolated small-space pieces: the NS chain (_update_corr) alone,
      a 33x33 eigh alone, a thin (D,33) SVD alone
  (c) the dense full-rank BaM fitter and the FactorBaM XLA fitter
      (ties the decomposition to the bench cells)
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


def timed(fn, *args):
    """Differential in-scan timing: fn(n) runs n steps; returns us/step."""
    np.asarray(fn(*args, 200))  # warm both shapes
    np.asarray(fn(*args, 1000))
    t0 = time.perf_counter()
    np.asarray(fn(*args, 200))
    t1 = time.perf_counter()
    np.asarray(fn(*args, 1000))
    t2 = time.perf_counter()
    return 1e6 * ((t2 - t1) - (t1 - t0)) / 800.0


def factor_step_run(d, solver, ni, t):
    def step(carry, i):
        mean, f, key = carry
        key, k = jax.random.split(key)
        eps = jax.random.normal(k, (B, d), jnp.float32)
        x = mean + eps @ f.T
        vs = t.lp_g(x).astype(jnp.float32)
        reg = 100.0 / (1.0 + 0.01 * i.astype(jnp.float32))
        mean, f, good = apply_bam_eps_step(mean, f, eps, vs, reg,
                                           newton_iters=ni, solver=solver)
        return (mean, f, key), good

    def run(n):
        c0 = (jnp.zeros(d, jnp.float32), jnp.eye(d, dtype=jnp.float32),
              jax.random.PRNGKey(0))
        c, _ = jax.lax.scan(step, c0, jnp.arange(n))
        return c[0]

    runs = {}

    def go(n):
        if n not in runs:
            runs[n] = jax.jit(lambda: run(n)).lower().compile()
        return runs[n]()

    return go


def piece_run(d, which):
    """Scan over just one small-space piece, feeding the output back so XLA
    cannot dead-code it."""
    def step(carry, i):
        g = carry
        if which == "ns20":
            cu, _ = _update_corr(g, 20)
            g = 0.5 * (cu + cu.T) + jnp.eye(g.shape[0], dtype=g.dtype)
        elif which == "ns5":
            cu, _ = _update_corr(g, 5)
            g = 0.5 * (cu + cu.T) + jnp.eye(g.shape[0], dtype=g.dtype)
        elif which == "eigh":
            w, q = jnp.linalg.eigh(g)
            g = (q * jnp.maximum(w, 0.5)) @ q.T
        elif which == "svd":
            # thin SVD of a (D, B+1) panel rebuilt from g each step
            y = jnp.ones((d, g.shape[0]), jnp.float32) @ g
            u, s, _ = jnp.linalg.svd(y, full_matrices=False)
            g = (u.T @ u) * jnp.maximum(s, 0.5)[None, :]
            g = 0.5 * (g + g.T) + jnp.eye(g.shape[0], dtype=g.dtype)
        return g, ()

    def run(n):
        g0 = jnp.eye(B + 1, dtype=jnp.float32) * 1.5
        g, _ = jax.lax.scan(step, g0, jnp.arange(n))
        return g

    runs = {}

    def go(n):
        if n not in runs:
            runs[n] = jax.jit(lambda: run(n)).lower().compile()
        return runs[n]()

    return go


def fitter_run(d, t, cls_name):
    from gsmvi_tpu import BaM, FactorBaM, Regularizers
    regf = Regularizers().linear(100.0)
    if cls_name == "dense":
        g = BaM(D=d, lp=t.lp, lp_g=t.lp_g, use_factor=False)
    else:
        g = FactorBaM(D=d, lp=t.lp, lp_g=t.lp_g, use_pallas=False)

    def go(n):
        m, c = g.fit(jax.random.PRNGKey(0), regf=regf, niter=n,
                     batch_size=B, verbose=False, retries=0)
        return np.asarray(m)

    return go


for d in (64, 256):
    t = dense_gaussian(jax.random.PRNGKey(3), d)
    out = {"d": d}
    for solver in ("auto", "eigh", "svd"):
        for ni in (20, 5):
            us = timed(factor_step_run(d, solver, ni, t))
            out[f"step_{solver}_ns{ni}_us"] = round(us, 1)
            print(json.dumps(out), flush=True)
    for which in ("ns20", "ns5", "eigh", "svd"):
        out[f"piece_{which}_us"] = round(timed(piece_run(d, which)), 1)
        print(json.dumps(out), flush=True)
    for cls_name in ("dense", "factor"):
        fn = fitter_run(d, t, cls_name)
        np.asarray(fn(200)); np.asarray(fn(1000))
        t0 = time.perf_counter(); fn(200)
        t1 = time.perf_counter(); fn(1000)
        t2 = time.perf_counter()
        us = 1e6 * ((t2 - t1) - (t1 - t0)) / 800.0
        out[f"fit_{cls_name}_us"] = round(us, 1)
        print(json.dumps(out), flush=True)
print("DONE", flush=True)
