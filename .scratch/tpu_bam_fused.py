"""TPU validation: fused BaM at the bench config (D=256, B=32, linear(100))."""
import os, time, json
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gsmvi_tpu import FactorBaM, Regularizers
from gsmvi_tpu.models import dense_gaussian
from gsmvi_tpu.ops.bam_eps import bam_eps_update
from gsmvi_tpu.ops.pallas.bam_fused import bam_eps_update_fused

print("devices:", jax.devices(), flush=True)

# --- 1. hardware kernel agreement vs XLA SVD path (benign inputs) ---------
rng = np.random.default_rng(0)
B, D = 32, 256
e = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
f0 = jnp.asarray((np.eye(D) + 0.05*rng.normal(size=(D, D))).astype(np.float32))
mu0 = jnp.asarray(rng.normal(size=D).astype(np.float32))
x = mu0 + e @ f0.T
v = -(x - 0.5)
t0 = time.time()
m_k, f_k, good_k, stiff_k = bam_eps_update_fused(e, v, mu0, f0, 1.0)
m_k = np.asarray(m_k); f_k = np.asarray(f_k)
print(f"kernel compile+run: {time.time()-t0:.1f}s good={bool(good_k)} stiff={bool(stiff_k)}", flush=True)
m_x, f_x, good_x = bam_eps_update(e, v, mu0, f0, 1.0, solver="svd")
S_k = f_k @ f_k.T; S_x = np.asarray(f_x @ f_x.T)
print("agreement: mean", float(np.max(np.abs(m_k - np.asarray(m_x)))),
      " S", float(np.max(np.abs(S_k - S_x))/max(1.0, np.abs(S_x).max())), flush=True)

# --- 2. e2e fused fit at the bench config ---------------------------------
t = dense_gaussian(jax.random.PRNGKey(3), D)
NITER = 8000

def timed_fit(g, niter, tag):
    run = lambda n: g.fit(jax.random.PRNGKey(0), regf=Regularizers().linear(100.0),
                          niter=n, batch_size=B, verbose=False, retries=0,
                          return_state=True)
    n1 = niter // 4
    t0=time.time(); st = run(niter); np.asarray(st.mean)
    print(f"[{tag}] long compile+run: {time.time()-t0:.1f}s "
          f"acc={int(st.n_accepted)} rej={int(st.n_rejected)}", flush=True)
    t0=time.time(); s1 = run(n1); np.asarray(s1.mean)
    print(f"[{tag}] short compile+run: {time.time()-t0:.1f}s", flush=True)
    best = 0.0
    for _ in range(2):
        t0=time.perf_counter(); s1 = run(n1); np.asarray(s1.mean); t1=time.perf_counter()-t0
        t0=time.perf_counter(); st = run(niter); np.asarray(st.mean); t2=time.perf_counter()-t0
        if t2 > t1:
            best = max(best, (niter-n1)/(t2-t1))
    cov = np.asarray(st.factor @ st.factor.T)
    me = float(np.max(np.abs(np.asarray(st.mean) - np.asarray(t.mean))))
    ce = float(np.max(np.abs(cov - np.asarray(t.cov)))/max(1.0, np.abs(np.asarray(t.cov)).max()))
    print(f"[{tag}] it/s={best:.0f} mean_err={me:.2e} cov_err={ce:.2e} "
          f"acc={int(st.n_accepted)} rej={int(st.n_rejected)}", flush=True)
    return best, me, ce

g = FactorBaM(D=D, lp=t.lp, lp_g=t.lp_g, pallas_score=t.pallas_score,
              steps_per_call=8)
print("mode:", g._pallas_mode(B), flush=True)
timed_fit(g, NITER, "fused spc=8")
