"""Does vmap-of-pallas_call (fused GSM update kernel) lower on real TPU?

If yes, fit_batch can keep the fused kernel instead of forcing XLA
(VERDICT r3 item #4's vmapped-Pallas note / weak #7).
Measures: vmapped fused step vs vmapped XLA eps step, K replicas.
"""
import time, json
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from gsmvi_tpu import FactorGSM
from gsmvi_tpu.gsm_factor import FactorVIState
from gsmvi_tpu.distributions import safe_cholesky
from gsmvi_tpu.ops.gsm_factor import factor_to_cov
from gsmvi_tpu.models import dense_gaussian

B = 32


def init_batch(g, keys, d):
    k = keys.shape[0]
    dtype = g.dtype

    def init_one(kk):
        f0 = jnp.eye(d, dtype=dtype)
        finv0 = jnp.zeros((0, 0), dtype)
        zero = jnp.zeros((), jnp.int32)
        return FactorVIState(jnp.zeros(d, dtype), f0, finv0, kk,
                             zero, zero, zero)

    return jax.vmap(init_one)(keys)


def run_cell(d, K, niter, n1, allow_pallas):
    t = dense_gaussian(jax.random.PRNGKey(3), d)
    g = FactorGSM(D=d, lp=t.lp, lp_g=t.lp_g)
    keys = jax.random.split(jax.random.PRNGKey(0), K)
    step = jax.vmap(g._make_step(B, allow_pallas=allow_pallas))

    def run(s, n):
        return jax.lax.scan(lambda c, _: (step(c), None), s, None,
                            length=n)[0]

    runj = jax.jit(run, static_argnums=1)
    s0 = init_batch(g, keys, d)

    def timed(n):
        t0 = time.perf_counter()
        s = runj(s0, n)
        np.asarray(s.mean)
        return s, time.perf_counter() - t0

    s, _ = timed(niter)   # warm
    _ = timed(n1)
    best = 0.0
    for _ in range(2):
        _, t1 = timed(n1)
        s, t2 = timed(niter)
        best = max(best, (niter - n1) / max(t2 - t1, 1e-9))
    m = np.asarray(s.mean)
    em = float(np.max(np.abs(m - np.asarray(t.mean)[None, :])))
    covs = np.asarray(jax.vmap(factor_to_cov)(s.factor))
    ec = float(np.max(np.abs(covs - np.asarray(t.cov)[None])) /
               max(np.max(np.abs(np.asarray(t.cov))), 1e-9))
    agg = best * K
    print(json.dumps({"cell": "fit_batch_step", "D": d, "K": K,
                      "pallas": bool(allow_pallas),
                      "iters_per_s_per_replica": round(best, 1),
                      "aggregate_iters_per_s": round(agg, 1),
                      "mean_err_max": round(em, 5),
                      "cov_err_max": round(ec, 5)}), flush=True)


# correctness smoke first: one vmapped fused update call vs per-replica loop
from gsmvi_tpu.ops.pallas.fused_step import gsm_eps_update_fused
rng = np.random.default_rng(0)
K, d = 4, 64
eps = jnp.asarray(rng.normal(size=(K, B, d)), jnp.float32)
vs = jnp.asarray(rng.normal(size=(K, B, d)) * 0.1, jnp.float32)
mu = jnp.asarray(rng.normal(size=(K, d)), jnp.float32)
f = jnp.broadcast_to(jnp.eye(d, dtype=jnp.float32), (K, d, d))
fn = lambda e, v, m, ff: gsm_eps_update_fused(e, v, m, ff)
try:
    out = jax.vmap(fn)(eps, vs, mu, f)
    mu_b = np.asarray(out[0])
    ref = [fn(eps[i], vs[i], mu[i], f[i]) for i in range(K)]
    errs = [float(np.max(np.abs(np.asarray(ref[i][0]) - mu_b[i])))
            for i in range(K)]
    errf = [float(np.max(np.abs(np.asarray(ref[i][1]) - np.asarray(out[1][i]))))
            for i in range(K)]
    print(json.dumps({"vmap_lowering": "ok", "mu_err": max(errs),
                      "f_err": max(errf)}), flush=True)
except Exception as e:
    print(json.dumps({"vmap_lowering": "FAILED",
                      "err": f"{type(e).__name__}: {e}"[:300]}), flush=True)
    raise SystemExit(1)

for d, K, niter, n1 in ((64, 8, 20000, 5000), (64, 32, 20000, 5000),
                        (256, 8, 8000, 2000)):
    run_cell(d, K, niter, n1, allow_pallas=True)
print("DONE", flush=True)
