"""Round-5 probe 4 (TPU): precision ablation of the batched NS-XLA step.

Probe 3 showed the K=8 batched step is 70% big-matmul time at HIGHEST
(6-pass bf16 emulation).  HIGH = 3-pass, DEFAULT = 1-pass.  Measure
throughput AND converged accuracy per precision — the small space stays
pinned HIGHEST inside _eps_smallspace_ns either way.
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gsmvi_tpu.ops.pallas.fused_step import gsm_eps_update_ns_xla

B, D, K = 32, 256, 8
OUT = {}
key = jax.random.PRNGKey(0)
eps = jax.random.normal(key, (B, D), jnp.float32)
vs = -0.3 * eps

NK = 4000
for label, prec in (("highest", jax.lax.Precision.HIGHEST),
                    ("high", jax.lax.Precision.HIGH),
                    ("default", jax.lax.Precision.DEFAULT)):
    muk = jnp.zeros((K, D), jnp.float32)
    fk = jnp.broadcast_to(jnp.eye(D, dtype=jnp.float32), (K, D, D))

    def body(carry, _):
        m, ff = carry
        m2, f2, _ = jax.vmap(
            lambda mm, fff: gsm_eps_update_ns_xla(eps, vs, mm, fff,
                                                  big_prec=prec))(m, ff)
        f2 = 0.5 * f2 + 0.5 * jnp.eye(D, dtype=jnp.float32)[None]
        return (m2 * 0.5, f2), None

    def run(m, ff):
        return jax.lax.scan(body, (m, ff), None, length=NK)[0]

    r = jax.jit(run)(muk, fk)
    np.asarray(r[1])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        r = jax.jit(run)(muk, fk)
        np.asarray(r[1])
        best = min(best, time.perf_counter() - t0)
    us = best / (NK * K) * 1e6
    OUT[f"step_us_{label}"] = round(us, 3)
    print(f"{label}: {us:.2f} us/replica-step -> agg {1e6/us*1:.0f}",
          flush=True)

# Convergence at each precision: full fit_batch through the fitter.
from gsmvi_tpu import FactorGSM
from gsmvi_tpu.models import dense_gaussian

t = dense_gaussian(jax.random.PRNGKey(3), D)
cs = float(np.abs(np.asarray(t.cov)).max())
for label in ("highest", "high", "bf16"):
    try:
        g = FactorGSM(D=D, lp=t.lp, lp_g=t.lp_g, pallas_precision=label)
        keys = jax.random.split(jax.random.PRNGKey(1), K)
        means, covs = g.fit_batch(keys, batch_size=B, niter=20000,
                                  small_solver="ns")
        errs = [float(np.max(np.abs(np.asarray(covs[i]) -
                                    np.asarray(t.cov))) / cs)
                for i in range(K)]
        merr = [float(np.max(np.abs(np.asarray(means[i]) -
                                    np.asarray(t.mean)))) for i in range(K)]
        OUT[f"cov_err_{label}"] = [round(e, 5) for e in errs]
        OUT[f"mean_err_{label}"] = [round(e, 5) for e in merr]
        print(label, "cov_err", max(errs), "mean_err", max(merr), flush=True)
    except Exception as e:
        OUT[f"cov_err_{label}"] = str(e)[:200]
        print("FAIL", label, e, flush=True)

with open("/root/repo/.scratch/r5_probe4.json", "w") as fh:
    json.dump(OUT, fh, indent=1)
print(json.dumps(OUT), flush=True)
