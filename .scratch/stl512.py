import json, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from bench import _time_fit
from gsmvi_tpu import ADVI
from gsmvi_tpu.models import dense_gaussian
import optax

B, d = 32, 512
t = dense_gaussian(jax.random.PRNGKey(3), d)
# polish regime: warm start at optimum, lr 1e-3
for mode in ("fused", "xla"):
    g = ADVI(D=d, lp=t.lp,
             pallas_score=t.pallas_score if mode == "fused" else None)
    if mode == "fused":
        run = lambda n: g.fit_fused(jax.random.PRNGKey(0),
                                    learning_rate=1e-3, niter=n,
                                    batch_size=B, verbose=False,
                                    mean=jnp.asarray(t.mean),
                                    cov=jnp.asarray(t.cov),
                                    estimator="stl")[:2]
    else:
        run = lambda n: g.fit(jax.random.PRNGKey(0), optax.adam(1e-3),
                              niter=n, batch_size=B, verbose=False,
                              mean=jnp.asarray(t.mean),
                              cov=jnp.asarray(t.cov),
                              return_losses=False, estimator="stl")[:2]
    t0 = time.time()
    ips, em, ec = _time_fit(run, 60000, t)
    print(json.dumps({"mode": mode, "D": d, "iters_per_s": round(ips, 1),
                      "mean_err": em, "cov_err": ec,
                      "wall_s": round(time.time() - t0, 1)}), flush=True)
