"""Fused ADVI hardware re-measurement with >=1s differential windows."""
import json, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from bench import _time_fit
from gsmvi_tpu import ADVI
from gsmvi_tpu.models import dense_gaussian

B = 32
NITER = {64: 4_000_000, 256: 1_500_000, 1024: 300_000}
print("devices:", jax.devices(), flush=True)
for d in (64, 256, 1024):
    t = dense_gaussian(jax.random.PRNGKey(3), d)
    g = ADVI(D=t.d, lp=t.lp, pallas_score=t.pallas_score)
    run = lambda n: g.fit_fused(jax.random.PRNGKey(0), learning_rate=1e-2,
                                niter=n, batch_size=B, verbose=False)[:2]
    t0 = time.time()
    ips, em, ec = _time_fit(run, NITER[d], t)
    print(json.dumps({"cell": "advi_fused", "D": d,
                      "iters_per_s": round(ips, 1), "mean_err": em,
                      "cov_err": ec,
                      "wall_s": round(time.time() - t0, 1)}), flush=True)
