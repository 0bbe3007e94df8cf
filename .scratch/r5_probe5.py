"""Round-5 probe 5 (TPU): restructured eps core (shared ef, fat update,
row-space fw1xi) — single fused fit, batched NS-XLA, K-grid fused batch."""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gsmvi_tpu import FactorGSM
from gsmvi_tpu.models import dense_gaussian

B = 32
OUT = {}


def time_fit(run, n, label):
    n1 = max(2, n // 4)
    t0 = time.perf_counter()
    r = run(n)
    np.asarray(r[0])
    print(f"{label}: warm long {time.perf_counter()-t0:.1f}s", flush=True)
    r = run(n1)
    np.asarray(r[0])
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        r = run(n1)
        np.asarray(r[0])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        r = run(n)
        np.asarray(r[0])
        t2 = time.perf_counter() - t0
        if t2 - t1 > 0:
            best = max(best, (n - n1) / (t2 - t1))
    print(f"{label}: {best:.1f} it/s", flush=True)
    return best


# single fused fits (restructured)
for d, niter in ((256, 120_000), (64, 150_000), (1024, 30_000)):
    t = dense_gaussian(jax.random.PRNGKey(3), d)
    g = FactorGSM(D=d, lp=t.lp, lp_g=t.lp_g, pallas_score=t.pallas_score)
    run = lambda n: g.fit(jax.random.PRNGKey(0), niter=n, batch_size=B,
                          verbose=False)
    ips = time_fit(run, niter, f"gsm_fused_r5@{d}")
    OUT[f"gsm_fused_r5_{d}"] = round(ips, 1)
    # converged errors at the full budget
    mean, cov = run(niter)
    cs = float(np.abs(np.asarray(t.cov)).max())
    OUT[f"gsm_fused_r5_{d}_cov_err"] = round(
        float(np.max(np.abs(np.asarray(cov) - np.asarray(t.cov))) / cs), 5)
    print(d, "cov_err", OUT[f"gsm_fused_r5_{d}_cov_err"], flush=True)

# batched replicas: ns (restructured) and fused grid kernel
for d, k, niter in ((256, 8, 10000), (256, 32, 5000), (64, 32, 16000)):
    t = dense_gaussian(jax.random.PRNGKey(3), d)
    for solver in ("ns", "fused"):
        g = FactorGSM(D=d, lp=t.lp, lp_g=t.lp_g,
                      pallas_score=t.pallas_score if solver == "fused"
                      else None)
        keys = jax.random.split(jax.random.PRNGKey(0), k)
        run = lambda n: g.fit_batch(keys, batch_size=B, niter=n,
                                    small_solver=solver)
        try:
            ips = time_fit(run, niter, f"batch_{solver}@D{d}K{k}")
            OUT[f"batch_{solver}_D{d}_K{k}"] = {
                "per_replica": round(ips, 1), "aggregate": round(ips * k, 1)}
        except Exception as e:
            OUT[f"batch_{solver}_D{d}_K{k}"] = {"error": str(e)[:200]}
            print("FAIL", solver, d, k, e, flush=True)

# converged accuracy through the restructured batched ns route
t = dense_gaussian(jax.random.PRNGKey(3), 256)
g = FactorGSM(D=256, lp=t.lp, lp_g=t.lp_g)
keys = jax.random.split(jax.random.PRNGKey(1), 8)
means, covs = g.fit_batch(keys, batch_size=B, niter=20000)
cs = float(np.abs(np.asarray(t.cov)).max())
errs = [float(np.max(np.abs(np.asarray(covs[i]) - np.asarray(t.cov))) / cs)
        for i in range(8)]
OUT["batch_ns_cov_err_D256_K8"] = [round(e, 5) for e in errs]
print("batch ns cov errs:", max(errs), flush=True)

with open("/root/repo/.scratch/r5_probe5.json", "w") as fh:
    json.dump(OUT, fh, indent=1)
print(json.dumps(OUT), flush=True)
