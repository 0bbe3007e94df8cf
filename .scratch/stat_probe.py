"""Measure the fused-BaM gate statistics (gu_ub, lmax_ub) along a REAL
fit trajectory on the bench target, CPU/XLA path (fast compiles).

Purpose: size the headroom for a measured-feedback NS ladder at D>=512 —
if the steady-state lmax_ub sits under the benign tier gates (1500/120/12)
the reg-only cutoff (auto=long for D>256) is leaving throughput on the
table; if it sits above ~1500 the cutoff is optimal and we drop the idea.
"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import sys
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
from gsmvi_tpu import FactorBaM, Regularizers
from gsmvi_tpu.models import dense_gaussian, ill_conditioned_gaussian
from gsmvi_tpu.ops.pallas.bam_fused import _spd_norm_ub

B = 32


def stats_from_state(e, v, mu, f, reg):
    b = e.shape[0]
    reg = jnp.float32(reg)
    r1 = reg / (1.0 + reg)
    epsbar = jnp.mean(e, axis=0, keepdims=True)
    gbar = jnp.mean(v, axis=0, keepdims=True)
    ed = e - epsbar
    gd = v - gbar
    sru = jnp.sqrt(reg / b)
    om_t = jnp.concatenate([sru * ed, -jnp.sqrt(r1) * epsbar], axis=0)
    fu_t = jnp.concatenate([sru * gd, jnp.sqrt(r1) * gbar], axis=0)
    k = b + 1
    eye_k = jnp.eye(k, dtype=jnp.float32)
    gu = om_t @ om_t.T
    gu = 0.5 * (gu + gu.T)
    gu_ub = _spd_norm_ub(gu)
    # exact small-space pieces (eigh fine on CPU)
    w, q = jnp.linalg.eigh(eye_k + gu)
    s_u = (q * jnp.sqrt(jnp.maximum(w, 0.0))) @ q.T
    cu = jnp.linalg.inv(eye_k + s_u)
    q_t = fu_t @ f
    omq = om_t @ q_t.T
    y_t = q_t + (cu @ omq).T @ om_t
    g = y_t @ y_t.T
    g = 0.5 * (g + g.T)
    lmax_ub = _spd_norm_ub(g)
    return gu_ub, lmax_ub


def probe(d, target, niter=3000, sample_every=50):
    fb = FactorBaM(D=d, lp=target.lp, lp_g=target.lp_g, use_pallas=False)
    regf = Regularizers().linear(100.0)
    key = jax.random.PRNGKey(0)
    # run the fit in chunks, probing the live state between chunks
    rows = []
    mean = None
    cov = None
    state = None
    # use the public fit() with niter slices, resuming from returned moments
    # is lossy for factor state; instead drive the internal step directly.
    step = fb._make_step(B, regf, retries=10, allow_pallas=False)
    from gsmvi_tpu.gsm_factor import FactorVIState
    f0 = jnp.eye(d, dtype=jnp.float32)
    st = FactorVIState(jnp.zeros(d, jnp.float32), f0, f0,
                       key, jnp.zeros((), jnp.int32),
                       jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    stepj = jax.jit(step)
    stat_key = jax.random.PRNGKey(1234)
    for i in range(niter):
        if i % sample_every == 0:
            # fresh draw from the live state, like the kernel sees
            stat_key, ks = jax.random.split(stat_key)
            e = jax.random.normal(ks, (B, d), jnp.float32)
            samples = st.mean + e @ st.factor.T
            v = target.lp_g(samples).astype(jnp.float32)
            reg = float(regf(st.step))
            gu_ub, lmax_ub = jax.jit(stats_from_state)(e, v, st.mean,
                                                       st.factor, reg)
            rows.append((i, reg, float(gu_ub), float(lmax_ub)))
        st = stepj(st)
    return rows


if __name__ == "__main__":
    for d in (256, 512, 1024):
        t = dense_gaussian(jax.random.PRNGKey(3), d)
        rows = probe(d, t, niter=int(sys.argv[1]) if len(sys.argv) > 1
                     else 2000)
        print(f"== D={d} dense_gaussian ==")
        for (i, reg, gu, lm) in rows:
            print(f"  step {i:5d} reg {reg:9.3g} gu_ub {gu:12.4g} "
                  f"lmax_ub {lm:12.4g}")
