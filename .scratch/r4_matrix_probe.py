import time, json
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from gsmvi_tpu import FactorBaM, BaM, Regularizers
from gsmvi_tpu.models import dense_gaussian

B = 32
regf = Regularizers().linear(100.0)

def time_fit(g, niter, n1, t, **fitkw):
    run = lambda n: g.fit(jax.random.PRNGKey(0), regf=regf, niter=n,
                          batch_size=B, verbose=False, retries=0, **fitkw)
    m, c = run(niter); np.asarray(m)
    m, c = run(n1); np.asarray(m)
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter(); m1, _ = run(n1); np.asarray(m1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); m, c = run(niter); np.asarray(m)
        t2 = time.perf_counter() - t0
        best = max(best, (niter - n1) / max(t2 - t1, 1e-9))
    em = float(np.max(np.abs(np.asarray(m) - np.asarray(t.mean))))
    sc = max(1.0, float(np.abs(np.asarray(t.cov)).max()))
    ec = float(np.max(np.abs(np.asarray(c) - np.asarray(t.cov)))) / sc
    return round(best, 1), round(em, 5), round(ec, 5)

NI = {64: 150_000, 256: 100_000, 512: 50_000}
targets = {d: dense_gaussian(jax.random.PRNGKey(3), d) for d in (64, 256, 512, 1024)}

# 1) ladder-vs-long table at 64/256/512 (1024 already measured)
for d in (64, 256, 512):
    t = targets[d]
    for prof in ("auto", "long"):
        g = FactorBaM(D=d, lp=t.lp, lp_g=t.lp_g, pallas_score=t.pallas_score,
                      ns_profile=prof)
        ips, em, ec = time_fit(g, NI[d], NI[d] // 4, t)
        print(json.dumps({"cell": "bam_fused", "D": d, "profile": prof,
                          "iters_per_s": ips, "mean_err": em, "cov_err": ec}),
              flush=True)

# 2) update-only fused FactorBaM (no pallas_score) at 64/256/1024
NI2 = {64: 60_000, 256: 40_000, 1024: 20_000}
for d in (64, 256, 1024):
    t = targets[d]
    g = FactorBaM(D=d, lp=t.lp, lp_g=t.lp_g)  # use_pallas="auto", update mode
    ips, em, ec = time_fit(g, NI2[d], NI2[d] // 4, t)
    print(json.dumps({"cell": "factor_bam_fused_update", "D": d,
                      "iters_per_s": ips, "mean_err": em, "cov_err": ec}),
          flush=True)

# 3) dense BaM at 512 for the delegation crossover
t = targets[512]
g = BaM(D=512, lp=t.lp, lp_g=t.lp_g)
ips, em, ec = time_fit(g, 6000, 1500, t)
print(json.dumps({"cell": "bam_dense", "D": 512, "iters_per_s": ips,
                  "mean_err": em, "cov_err": ec}), flush=True)
# XLA factor route at 512
g = FactorBaM(D=512, lp=t.lp, lp_g=t.lp_g, use_pallas=False)
ips, em, ec = time_fit(g, 6000, 1500, t)
print(json.dumps({"cell": "factor_bam_xla", "D": 512, "iters_per_s": ips,
                  "mean_err": em, "cov_err": ec}), flush=True)
print("DONE", flush=True)
