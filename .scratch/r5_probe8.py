"""Round-5 probe 8 (TPU, quiet): settle the bam_fused numbers with
bench.py's own corroborated/capped differential estimator, long windows."""
import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, "/root/repo")
import bench
from gsmvi_tpu import FactorBaM, FactorGSM, Regularizers
from gsmvi_tpu.models import dense_gaussian

OUT = {}
for d, niter in ((64, 400_000), (256, 200_000), (512, 120_000),
                 (1024, 60_000)):
    t = dense_gaussian(jax.random.PRNGKey(3), d)
    g = FactorBaM(D=d, lp=t.lp, lp_g=t.lp_g, pallas_score=t.pallas_score)
    run = lambda n: g.fit(jax.random.PRNGKey(0),
                          regf=Regularizers().linear(100.0), niter=n,
                          batch_size=32, verbose=False, retries=0)
    t0 = time.time()
    ips, em, ec = bench._time_fit(run, niter, t)
    OUT[f"bam_fused_{d}"] = {"iters_per_s": round(ips, 1), "cov_err": ec,
                             "wall": round(time.time() - t0, 1)}
    print(d, OUT[f"bam_fused_{d}"], flush=True)

for d, niter in ((256, 200_000), (1024, 60_000)):
    t = dense_gaussian(jax.random.PRNGKey(3), d)
    g = FactorGSM(D=d, lp=t.lp, lp_g=t.lp_g, pallas_score=t.pallas_score)
    run = lambda n: g.fit(jax.random.PRNGKey(0), niter=n, batch_size=32,
                          verbose=False)
    ips, em, ec = bench._time_fit(run, niter, t)
    OUT[f"gsm_fused_{d}"] = {"iters_per_s": round(ips, 1), "cov_err": ec}
    print(d, OUT[f"gsm_fused_{d}"], flush=True)

with open("/root/repo/.scratch/r5_probe8.json", "w") as fh:
    json.dump(OUT, fh, indent=1)
print(json.dumps(OUT), flush=True)
