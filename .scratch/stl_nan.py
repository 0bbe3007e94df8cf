import numpy as np, jax, jax.numpy as jnp, optax, json
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from gsmvi_tpu import ADVI
from gsmvi_tpu.models import dense_gaussian

d, B = 1024, 32
t = dense_gaussian(jax.random.PRNGKey(3), d)
g = ADVI(D=d, lp=t.lp)
st, losses = g.fit(jax.random.PRNGKey(0), optax.adam(1e-2), niter=4000,
                   batch_size=B, verbose=False, estimator="stl",
                   return_state=True)
losses = np.asarray(losses)
bad = np.where(~np.isfinite(losses))[0]
print("first bad loss idx:", bad[0] if len(bad) else None,
      "of", len(losses), flush=True)
l = np.asarray(g.scales_to_tril(st.scales))
print("diag min/max:", np.nanmin(np.abs(np.diag(l))),
      np.nanmax(np.abs(np.diag(l))), "n_nan:", np.isnan(l).sum(), flush=True)
print("loss head:", losses[:5], "around bad:",
      losses[max(0, (bad[0]-3 if len(bad) else 0)):(bad[0]+3 if len(bad) else 5)], flush=True)
