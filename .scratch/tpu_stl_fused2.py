"""Fused STL: polish-regime throughput at D=256 + optimum pinning on chip."""
import json, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from bench import _time_fit, _errs
from gsmvi_tpu import ADVI
from gsmvi_tpu.models import dense_gaussian

B = 32
print("devices:", jax.devices(), flush=True)

# Polish regime: warm start AT the bench target's optimum, lr 1e-3 — the
# tracked inverse follows and no replays fire.  This is the regime the
# kernel exists for.
d = 256
t = dense_gaussian(jax.random.PRNGKey(3), d)
g = ADVI(D=d, lp=t.lp, pallas_score=t.pallas_score)
mean0 = jnp.asarray(t.mean)
cov0 = jnp.asarray(t.cov)
run = lambda n: g.fit_fused(jax.random.PRNGKey(0), learning_rate=1e-3,
                            niter=n, batch_size=B, verbose=False,
                            mean=mean0, cov=cov0, estimator="stl")[:2]
t0 = time.time()
ips, em, ec = _time_fit(run, 300_000, t)
print(json.dumps({"cell": "advi_stl_fused_polish", "D": d,
                  "iters_per_s": round(ips, 1), "mean_err": em,
                  "cov_err": ec, "wall_s": round(time.time() - t0, 1)}),
      flush=True)

# Optimum pinning at D=64, on-chip Mosaic kernel.
d = 64
t = dense_gaussian(jax.random.PRNGKey(3), d)
for est in ("analytic", "stl"):
    g = ADVI(D=d, lp=t.lp, pallas_score=t.pallas_score)
    mean, cov, _ = g.fit_fused(jax.random.PRNGKey(2), learning_rate=5e-3,
                               niter=100_000, batch_size=B, verbose=False,
                               mean=jnp.asarray(t.mean),
                               cov=jnp.asarray(t.cov), estimator=est)
    em, ec = _errs(mean, cov, t)
    print(json.dumps({"pin_test": est, "D": d, "mean_err": em,
                      "cov_err": ec}), flush=True)
