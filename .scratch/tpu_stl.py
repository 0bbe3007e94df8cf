"""STL throughput on TPU + two-phase accuracy demo at D=256."""
import json, time
import numpy as np
import jax, jax.numpy as jnp, optax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from bench import _time_fit, _errs
from gsmvi_tpu import ADVI
from gsmvi_tpu.models import dense_gaussian

B = 32
NITER = {64: 100000, 256: 60000, 1024: 10000}
print("devices:", jax.devices(), flush=True)

# 1) STL throughput
for d in (64, 256, 1024):
    t = dense_gaussian(jax.random.PRNGKey(3), d)
    g = ADVI(D=t.d, lp=t.lp)
    run = lambda n: g.fit(jax.random.PRNGKey(0), optax.adam(1e-2), niter=n,
                          batch_size=B, verbose=False, return_losses=False,
                          estimator="stl")[:2]
    t0 = time.time()
    ips, em, ec = _time_fit(run, NITER[d], t)
    print(json.dumps({"cell": "advi_stl", "D": d, "iters_per_s": round(ips, 1),
                      "mean_err": em, "cov_err": ec,
                      "wall_s": round(time.time() - t0, 1)}), flush=True)

# 2) Two-phase: fused bulk (1.5M iters) then STL polish (300k @ 1e-3)
d = 256
t = dense_gaussian(jax.random.PRNGKey(3), d)
g = ADVI(D=t.d, lp=t.lp, pallas_score=t.pallas_score)
t0 = time.time()
mean_b, cov_b, _ = g.fit_fused(jax.random.PRNGKey(0), learning_rate=1e-2,
                               niter=1_500_000, batch_size=B, verbose=False)
em, ec = _errs(mean_b, cov_b, t)
print(json.dumps({"phase": "bulk_fused", "iters": 1500000, "mean_err": em,
                  "cov_err": ec, "wall_s": round(time.time() - t0, 1)}),
      flush=True)
g2 = ADVI(D=t.d, lp=t.lp)
t0 = time.time()
mean_p, cov_p, _ = g2.fit(jax.random.PRNGKey(1), optax.adam(1e-3),
                          mean=mean_b, cov=cov_b, niter=300_000,
                          batch_size=B, verbose=False, return_losses=False,
                          estimator="stl")
em, ec = _errs(mean_p, cov_p, t)
print(json.dumps({"phase": "stl_polish", "iters": 300000, "lr": 1e-3,
                  "mean_err": em, "cov_err": ec,
                  "wall_s": round(time.time() - t0, 1)}), flush=True)
