import json, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from bench import _time_fit
from gsmvi_tpu import FactorBaM, Regularizers
from gsmvi_tpu.models import dense_gaussian

B, d = 32, 512
t = dense_gaussian(jax.random.PRNGKey(3), d)
for profile in ("auto", "long"):
    g = FactorBaM(D=d, lp=t.lp, lp_g=t.lp_g, pallas_score=t.pallas_score,
                  ns_profile=profile)
    run = lambda n: g.fit(jax.random.PRNGKey(0),
                          regf=Regularizers().linear(100.0), niter=n,
                          batch_size=B, verbose=False, retries=0)
    t0 = time.time()
    ips, em, ec = _time_fit(run, 60000, t)
    print(json.dumps({"profile": profile, "D": d,
                      "iters_per_s": round(ips, 1), "mean_err": em,
                      "cov_err": ec,
                      "wall_s": round(time.time() - t0, 1)}), flush=True)
