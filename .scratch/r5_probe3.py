"""Round-5 probe 3 (TPU): where does the NS eps step's time go?

Decomposition by NS-sweep ablation (timing-only; zero-sweep chains are
numerically wrong but structurally identical), single replica and K=8
batched, D=256 B=32.  Plus: cost of a BATCHED (N, B, B) phase-1 chain —
the candidate hoisted precompute (phase 1 of _eps_smallspace_ns depends
only on eps, which is known in advance on the fold_in stream).
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from gsmvi_tpu.ops.pallas.fused_step import gsm_eps_update_ns_xla

B, D = 32, 256
OUT = {}
key = jax.random.PRNGKey(0)
eps = jax.random.normal(key, (B, D), jnp.float32)
vs = -0.3 * eps
mu = jnp.zeros(D, jnp.float32)
f = jnp.eye(D, dtype=jnp.float32)


def timeit(fn, args, n, label, k_mult=1):
    r = jax.jit(fn)(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        r = jax.jit(fn)(*args)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        best = min(best, time.perf_counter() - t0)
    us = best / n * 1e6
    OUT[label] = round(us, 3)
    print(f"{label}: {us:.2f} us/step", flush=True)


N = 20000


def make_scan(iters, k=None):
    def body(carry, _):
        m, ff = carry
        if k is None:
            m2, f2, _ = gsm_eps_update_ns_xla(eps, vs, m, ff, iters=iters)
        else:
            m2, f2, _ = jax.vmap(
                lambda mm, fff: gsm_eps_update_ns_xla(eps, vs, mm, fff,
                                                      iters=iters))(m, ff)[:3]
        # keep the carry bounded: decay toward identity
        if k is None:
            f2 = 0.5 * f2 + 0.5 * jnp.eye(D, dtype=jnp.float32)
        else:
            f2 = 0.5 * f2 + 0.5 * jnp.eye(D, dtype=jnp.float32)[None]
        return (m2 * 0.5, f2), None

    def run(m, ff):
        return jax.lax.scan(body, (m, ff), None, length=N)[0]

    return run


for label, iters in (("full_54674", (5, 4, 6, 7, 4)),
                     ("nophase1_00074", (0, 0, 0, 7, 4)),
                     ("nophase2_54600", (5, 4, 6, 0, 0)),
                     ("nosmall_00000", (0, 0, 0, 0, 0))):
    timeit(make_scan(iters), (mu, f), N, f"single_{label}")

K = 8
muk = jnp.zeros((K, D), jnp.float32)
fk = jnp.broadcast_to(jnp.eye(D, dtype=jnp.float32), (K, D, D))
NK = 4000
for label, iters in (("full_54674", (5, 4, 6, 7, 4)),
                     ("nophase1_00074", (0, 0, 0, 7, 4)),
                     ("nophase2_54600", (5, 4, 6, 0, 0)),
                     ("nosmall_00000", (0, 0, 0, 0, 0))):
    def body(carry, _):
        m, ff = carry
        m2, f2, _ = jax.vmap(
            lambda mm, fff: gsm_eps_update_ns_xla(eps, vs, mm, fff,
                                                  iters=iters))(m, ff)
        f2 = 0.5 * f2 + 0.5 * jnp.eye(D, dtype=jnp.float32)[None]
        return (m2 * 0.5, f2), None

    def run(m, ff):
        return jax.lax.scan(body, (m, ff), None, length=NK)[0]

    timeit(run, (muk, fk), NK * K, f"batchK8_{label}_per_replica_step")

# ---- batched phase-1 chain cost (the hoisting candidate) -----------------
from gsmvi_tpu.ops.pallas.fused_step import _newton_inv, _ns_sqrt

NB = 2048
gus = jax.random.normal(jax.random.PRNGKey(1), (NB, B, B), jnp.float32)
gus = 0.1 * jnp.einsum("nij,nkj->nik", gus, gus) / B


def phase1_batched(g):
    eye = jnp.eye(B, dtype=jnp.float32)

    def one(gu):
        s1 = _ns_sqrt(eye + gu, 5)
        s1 = 0.5 * (s1 + s1.T)
        cu = _newton_inv(eye + s1, 4)
        cui = _newton_inv(eye + s1 + gu, 6)
        return cu, cui

    return jax.vmap(one)(g)


timeit(phase1_batched, (gus,), NB, "phase1_batched_per_item")

# block-diagonal packing: 4 items per (128,128)
P = 4
NB2 = NB // P


def blockdiag(g):
    z = jnp.zeros((NB2, P * B, P * B), jnp.float32)
    for i in range(P):
        z = z.at[:, i * B:(i + 1) * B, i * B:(i + 1) * B].set(
            g[i::P][:NB2])
    eye = jnp.eye(P * B, dtype=jnp.float32)

    def one(gu):
        s1 = _ns_sqrt(eye + gu, 5)
        s1 = 0.5 * (s1 + s1.T)
        cu = _newton_inv(eye + s1, 4)
        cui = _newton_inv(eye + s1 + gu, 6)
        return cu, cui

    return jax.vmap(one)(z)


timeit(blockdiag, (gus,), NB, "phase1_blockdiag4_per_item")

with open("/root/repo/.scratch/r5_probe3.json", "w") as fh:
    json.dump(OUT, fh, indent=1)
print(json.dumps(OUT), flush=True)
