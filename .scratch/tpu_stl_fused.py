"""Fused STL kernel: throughput + optimum-pinning on hardware."""
import json, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from bench import _time_fit, _errs
from gsmvi_tpu import ADVI
from gsmvi_tpu.models import dense_gaussian

B = 32
NITER = {64: 1_000_000, 256: 300_000, 1024: 30_000}
print("devices:", jax.devices(), flush=True)
for d in (64, 256, 1024):
    t = dense_gaussian(jax.random.PRNGKey(3), d)
    g = ADVI(D=t.d, lp=t.lp, pallas_score=t.pallas_score)
    print(f"D={d} stl_fused_supported={g._fused_supported(B, 'stl')}",
          flush=True)
    run = lambda n: g.fit_fused(jax.random.PRNGKey(0), learning_rate=1e-2,
                                niter=n, batch_size=B, verbose=False,
                                estimator="stl")[:2]
    t0 = time.time()
    ips, em, ec = _time_fit(run, NITER[d], t)
    print(json.dumps({"cell": "advi_stl_fused", "D": d,
                      "iters_per_s": round(ips, 1), "mean_err": em,
                      "cov_err": ec,
                      "wall_s": round(time.time() - t0, 1)}), flush=True)

# optimum pinning on chip at D=64: STL holds the floor the analytic
# estimator diffuses away from.
d = 64
t = dense_gaussian(jax.random.PRNGKey(3), d)
for est in ("analytic", "stl"):
    g = ADVI(D=d, lp=t.lp, pallas_score=t.pallas_score)
    mean, cov, _ = g.fit_fused(jax.random.PRNGKey(2), learning_rate=5e-3,
                               niter=100_000, batch_size=B, verbose=False,
                               mean=jnp.asarray(t.mean),
                               cov=jnp.asarray(t.cov), estimator=est)
    em, ec = _errs(mean, cov, t)
    print(json.dumps({"pin_test": est, "mean_err": em, "cov_err": ec}),
          flush=True)
