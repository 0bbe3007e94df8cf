"""Can the fused GSM update kernel run at D=2048 with a raised VMEM cap?"""
import json, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import gsmvi_tpu.ops.pallas.fused_step as fs
print("current limit MB:", fs._VMEM_LIMIT_BYTES / 2**20, flush=True)

for mb in (112, 120):
    fs._VMEM_LIMIT_BYTES = mb * 1024 * 1024
    b, d = 32, 2048
    rng = np.random.default_rng(0)
    f = (0.05 * rng.normal(size=(d, d)) + np.eye(d)).astype(np.float32)
    mu = rng.normal(size=d).astype(np.float32)
    eps = rng.normal(size=(b, d)).astype(np.float32)
    v = (-0.3 * rng.normal(size=(b, d))).astype(np.float32)
    try:
        t0 = time.time()
        m_p, f_p, good = fs.gsm_eps_update_fused(
            jnp.asarray(eps), jnp.asarray(v), jnp.asarray(mu),
            jnp.asarray(f))
        m_p = np.asarray(m_p)
        print(json.dumps({"limit_mb": mb, "ok": True,
                          "good": bool(good),
                          "compile_s": round(time.time() - t0, 1)}),
              flush=True)
        # agreement vs XLA eps path
        from gsmvi_tpu.ops.gsm_eps import apply_eps_step
        m_x, f_x, good_x = apply_eps_step(jnp.asarray(mu), jnp.asarray(f),
                                          jnp.asarray(eps), jnp.asarray(v),
                                          jitter=1e-6)
        dm = float(np.max(np.abs(m_p - np.asarray(m_x))))
        s_p = f_p @ f_p.T
        s_x = np.asarray(f_x @ f_x.T)
        ds = float(np.max(np.abs(np.asarray(s_p) - s_x))) / max(
            1.0, float(np.abs(s_x).max()))
        print(json.dumps({"limit_mb": mb, "mean_agree": dm,
                          "cov_agree": ds}), flush=True)
        break
    except Exception as e:
        print(json.dumps({"limit_mb": mb, "ok": False,
                          "err": str(e)[:300]}), flush=True)
