"""Round-5 probe 1 (TPU): fold_in gsm_fused throughput + batch_fused kernel.

1. Single fused GSM fit @ D in {64, 256}: the fold_in external-eps port must
   stay within ~5% of the round-4 hardware numbers (81.7k @256 driver /
   83-84k ledger; 94-98k @64).
2. fit_batch D=256 K=8 and D=64 K=8/32: "fused" (new K-grid kernel) vs "ns"
   (NS-XLA baseline, ledger 144k/226k aggregate).
3. Quick trajectory sanity: batched replica 0 == single fused fit (hardware
   Mosaic, tolerance — HW fori_loop vs XLA replay rounding).
"""
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


# ---- 1. single fused fits ------------------------------------------------
for d, niter in ((256, 100_000), (64, 150_000)):
    t = dense_gaussian(jax.random.PRNGKey(3), d)
    g = FactorGSM(D=d, lp=t.lp, lp_g=t.lp_g, pallas_score=t.pallas_score)
    run = lambda n: g.fit(jax.random.PRNGKey(0), niter=n, batch_size=B,
                          verbose=False)
    OUT[f"gsm_fused_foldin_{d}"] = time_fit(run, niter, f"gsm_fused@{d}")

# ---- 2. fit_batch fused vs ns --------------------------------------------
for d, k, niter in ((256, 8, 8000), (64, 8, 20000), (64, 32, 10000),
                    (256, 32, 3000)):
    t = dense_gaussian(jax.random.PRNGKey(3), d)
    g = FactorGSM(D=d, lp=t.lp, lp_g=t.lp_g, pallas_score=t.pallas_score)
    keys = jax.random.split(jax.random.PRNGKey(0), k)
    for solver in ("fused", "ns"):
        run = lambda n: g.fit_batch(keys, batch_size=B, niter=n,
                                    small_solver=solver)
        try:
            ips = time_fit(run, niter, f"fit_batch_{solver}@D{d}K{k}")
            OUT[f"fit_batch_{solver}_D{d}_K{k}"] = {
                "per_replica": round(ips, 1),
                "aggregate": round(ips * k, 1)}
        except Exception as e:
            OUT[f"fit_batch_{solver}_D{d}_K{k}"] = {"error": str(e)[:300]}
            print(f"FAIL {solver} D{d} K{k}: {e}", flush=True)

# ---- 3. trajectory sanity on hardware ------------------------------------
d, k = 64, 4
t = dense_gaussian(jax.random.PRNGKey(3), d)
g = FactorGSM(D=d, lp=t.lp, lp_g=t.lp_g, pallas_score=t.pallas_score)
keys = jax.random.split(jax.random.PRNGKey(7), k)
st = g.fit_batch(keys, batch_size=B, niter=101, return_state=True,
                 small_solver="fused")
s0 = g.fit(keys[0], batch_size=B, niter=101, verbose=False,
           return_state=True)
dm = float(np.max(np.abs(np.asarray(st.mean[0]) - np.asarray(s0.mean))))
df = float(np.max(np.abs(np.asarray(st.factor[0]) - np.asarray(s0.factor))))
OUT["traj_batch_vs_single_max_abs"] = {"mean": dm, "factor": df}
print("traj diff:", dm, df, flush=True)

with open("/root/repo/.scratch/r5_probe1.json", "w") as fh:
    json.dump(OUT, fh, indent=1)
print(json.dumps(OUT), flush=True)
