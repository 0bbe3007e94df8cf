import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from gsmvi_tpu import FactorBaM, Regularizers
from gsmvi_tpu.models import dense_gaussian
t = dense_gaussian(jax.random.PRNGKey(3), 1024)
g = FactorBaM(D=1024, lp=t.lp, lp_g=t.lp_g, pallas_score=t.pallas_score)
run = lambda n: g.fit(jax.random.PRNGKey(0), regf=Regularizers().linear(100.0),
                      niter=n, batch_size=32, verbose=False, retries=0,
                      return_state=True)
t0=time.time(); st = run(20000); np.asarray(st.mean)
print("long", time.time()-t0, "acc", int(st.n_accepted), flush=True)
t0=time.time(); np.asarray(run(5000).mean); t1=time.time()-t0
t0=time.time(); st = run(20000); np.asarray(st.mean); t2=time.time()-t0
print("it/s", 15000/(t2-t1), flush=True)
cov = np.asarray(st.factor @ st.factor.T)
print("mean_err", float(np.abs(np.asarray(st.mean)-np.asarray(t.mean)).max()),
      "cov_err", float(np.abs(cov-np.asarray(t.cov)).max()/np.abs(np.asarray(t.cov)).max()), flush=True)
