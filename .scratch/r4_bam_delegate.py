import time, json
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from gsmvi_tpu import BaM, Regularizers
from gsmvi_tpu.models import dense_gaussian

t = dense_gaussian(jax.random.PRNGKey(3), 256)
g = BaM(D=256, lp=t.lp, lp_g=t.lp_g)
regf = Regularizers().linear(100.0)
run = lambda n: g.fit(jax.random.PRNGKey(0), regf=regf, niter=n,
                      batch_size=32, verbose=False, retries=0)
m, c = run(30000); np.asarray(m)
m, c = run(7500); np.asarray(m)
t0 = time.perf_counter(); m1, _ = run(7500); np.asarray(m1); t1 = time.perf_counter()-t0
t0 = time.perf_counter(); m, c = run(30000); np.asarray(m); t2 = time.perf_counter()-t0
em = float(np.max(np.abs(np.asarray(m) - np.asarray(t.mean))))
ec = float(np.max(np.abs(np.asarray(c) - np.asarray(t.cov)))) / float(np.abs(np.asarray(t.cov)).max())
print(json.dumps({"cell": "bam_delegated", "D": 256,
                  "iters_per_s": round(22500 / max(t2 - t1, 1e-9), 1),
                  "mean_err": round(em, 5), "cov_err": round(ec, 5),
                  "route": g._factor_route(True)}), flush=True)
