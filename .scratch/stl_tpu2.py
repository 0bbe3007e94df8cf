"""Post-clamp: D=1024 STL, and polish-lr grid at D=256."""
import json, time
import numpy as np
import jax, jax.numpy as jnp, optax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from bench import _time_fit, _errs
from gsmvi_tpu import ADVI
from gsmvi_tpu.models import dense_gaussian

B = 32
print("devices:", jax.devices(), flush=True)

# 1) D=1024 STL now survives
d = 1024
t = dense_gaussian(jax.random.PRNGKey(3), d)
g = ADVI(D=d, lp=t.lp)
run = lambda n: g.fit(jax.random.PRNGKey(0), optax.adam(1e-2), niter=n,
                      batch_size=B, verbose=False, return_losses=False,
                      estimator="stl")[:2]
t0 = time.time()
ips, em, ec = _time_fit(run, 10000, t)
print(json.dumps({"cell": "advi_stl", "D": d, "iters_per_s": round(ips, 1),
                  "mean_err": em, "cov_err": ec,
                  "wall_s": round(time.time() - t0, 1)}), flush=True)

# 2) D=256 two-phase with polish-lr grid
d = 256
t = dense_gaussian(jax.random.PRNGKey(3), d)
g = ADVI(D=t.d, lp=t.lp, pallas_score=t.pallas_score)
mean_b, cov_b, _ = g.fit_fused(jax.random.PRNGKey(0), learning_rate=1e-2,
                               niter=1_500_000, batch_size=B, verbose=False)
em, ec = _errs(mean_b, cov_b, t)
print(json.dumps({"phase": "bulk_fused", "mean_err": em, "cov_err": ec}),
      flush=True)
for lr in (1e-2, 3e-3):
    g2 = ADVI(D=t.d, lp=t.lp)
    t0 = time.time()
    mean_p, cov_p, _ = g2.fit(jax.random.PRNGKey(1), optax.adam(lr),
                              mean=mean_b, cov=cov_b, niter=300_000,
                              batch_size=B, verbose=False,
                              return_losses=False, estimator="stl")
    em, ec = _errs(mean_p, cov_p, t)
    print(json.dumps({"phase": "stl_polish", "lr": lr, "iters": 300000,
                      "mean_err": em, "cov_err": ec,
                      "wall_s": round(time.time() - t0, 1)}), flush=True)
