import os, time, json
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from gsmvi_tpu import FactorBaM, Regularizers
from gsmvi_tpu.models import dense_gaussian

D, B = 1024, 32
t = dense_gaussian(jax.random.PRNGKey(3), D)
regf = Regularizers().linear(100.0)

def errs(mean, cov):
    m = float(np.max(np.abs(np.asarray(mean) - np.asarray(t.mean))))
    sc = max(1.0, float(np.abs(np.asarray(t.cov)).max()))
    c = float(np.max(np.abs(np.asarray(cov) - np.asarray(t.cov)))) / sc
    return round(m, 5), round(c, 5)

def time_fit(g, niter, n1):
    run = lambda n: g.fit(jax.random.PRNGKey(0), regf=regf, niter=n,
                          batch_size=B, verbose=False, retries=0)
    t0 = time.time(); m, c = run(niter); np.asarray(m)
    print("  warm long %.1fs" % (time.time()-t0), flush=True)
    t0 = time.time(); m, c = run(n1); np.asarray(m)
    print("  warm short %.1fs" % (time.time()-t0), flush=True)
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter(); m1, c1 = run(n1); np.asarray(m1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); m, c = run(niter); np.asarray(m)
        t2 = time.perf_counter() - t0
        r = (niter - n1) / max(t2 - t1, 1e-9)
        print("  t1=%.2fs t2=%.2fs rate=%.0f" % (t1, t2, r), flush=True)
        best = max(best, r)
    em, ec = errs(m, c)
    return best, em, ec

for prof in ("auto", "long"):
    print("=== ns_profile =", prof, flush=True)
    g = FactorBaM(D=D, lp=t.lp, lp_g=t.lp_g, pallas_score=t.pallas_score,
                  ns_profile=prof)
    ips, em, ec = time_fit(g, 20000, 5000)
    print(json.dumps({"profile": prof, "iters_per_s": round(ips,1),
                      "mean_err": em, "cov_err": ec}), flush=True)
