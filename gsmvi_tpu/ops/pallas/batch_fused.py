"""K-replica batched fused GSM whole-step Pallas kernel (``fit_batch``).

``fit_batch`` is the repo's aggregate-utilization lever: K independent
replica fits in one compiled program (random restarts, seed sweeps —
reference math per replica: ``gsmvi/gsm.py:31-58``).  Through round 4 the
batched step was forced onto plain XLA (``gsm_eps_update_ns_xla``) because
vmap-of-pallas_call either has no batching rule (SMEM scalars) or lowers to
one serialized grid cell per STEP per replica, re-dispatching every scan
iteration (measured slower than the batched XLA step).

This kernel instead makes the REPLICA axis the Pallas ``grid``: the stacked
states live in HBM as ``(K, 1, D)`` means and ``(K, D, D)`` factors, each
grid step streams one replica's blocks into VMEM (Mosaic double-buffers the
HBM<->VMEM DMAs across grid steps, overlapping replica k+1's loads with
replica k's compute), advances it ``steps_per_call`` fused sub-steps
entirely in VMEM, and writes it back — so ONE kernel dispatch covers
``K * steps_per_call`` replica-steps.  eps arrives externally per replica
per ABSOLUTE step (``normal(fold_in(replica_key, step))``), which makes
every replica's trajectory bit-identical to the same-key single fused fit
(tests/test_fit_batch.py, verified bit-exact on v5e hardware) and the
whole thing interpret-testable.

MEASURED CEILING (v5e, round 5 — .scratch/r5_probe{2,3,4,5}.json,
docs/BENCHMARKS.md round-5 fit_batch section): grid cells run on the
chip's ONE TensorCore, so replica compute serializes and the aggregate
saturates at ~the single-fit fused rate (86-97k it/s at every (D, K)
probed at D=256/64) — below the batched NS-XLA step (143k/176k @ D=256
K=8/32, 241k @ D=64 K=32), whose K-batched matmuls share op overhead
across replicas.  The two routes hit DIFFERENT hardware walls: Pallas
keeps F in VMEM but serializes the MXU; XLA batches the MXU but streams
the (K, D, D) factor from HBM every op (precision ablation: HIGHEST ->
HIGH is -4%, so MXU passes are nearly free — the step is op/memory-bound,
not FLOP-bound).  Neither wall moves without more cores or more VMEM.
``fit_batch`` therefore defaults to the NS-XLA route and offers this
kernel as ``small_solver="fused"`` — the trajectory-exact, audit-friendly
batched option.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .fused_step import (_HAS_PLTPU, _HI, NS_ITERS_DEFAULT, _compiler_params,
                         _eps_smallspace_ns)

if _HAS_PLTPU:
    from jax.experimental.pallas import tpu as pltpu
else:  # pragma: no cover
    pltpu = None


def make_fused_eps_batch_multistep(score_fn, n_params: int, batch: int,
                                   d: int, k: int, steps_per_call: int,
                                   iters=NS_ITERS_DEFAULT, big_prec=None,
                                   interpret: bool = False):
    """Build the K-replica multistep kernel.

    Returns ``step(nmax, eps_blocks, means, factors, *params) ->
    (means, factors, n_accepted)`` advancing EVERY replica by the first
    ``nmax`` (<= steps_per_call) sub-steps of its eps block:

    - ``eps_blocks``: (K, spc*B, D) — replica i's sub-step j draw in rows
      [j*B, (j+1)*B); the caller derives them per absolute step.
    - ``means``: (K, D); ``factors``: (K, D, D); ``n_accepted``: (K,) i32.
    - ``params`` are shared by all replicas (the common target).
    """
    if not _HAS_PLTPU and not interpret:
        raise RuntimeError("fused batch multistep requires TPU pallas")
    bp = _HI if big_prec is None else big_prec
    spc = steps_per_call

    def kernel(nmax_ref, eps_ref, mu_ref, f_ref, *rest):
        params = [p[:] for p in rest[:n_params]]
        mu_out, f_out, acc_out = rest[n_params:]
        nmax = nmax_ref[0]

        def body(j, carry):
            mu, f, acc = carry
            active = j < nmax
            e = eps_ref[pl.ds(j * batch, batch), :]
            ef = jax.lax.dot_general(e, f, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=bp)
            x = mu + ef
            v = score_fn(x, *params)
            vf = jnp.dot(v, f, preferred_element_type=jnp.float32,
                         precision=bp)
            mu_new, f_new, good = _eps_smallspace_ns(
                e, v, vf, mu, f, batch=batch, iters=iters, big_prec=bp,
                ef_t=ef)
            accept = active & good
            mu = jnp.where(accept, mu_new, mu)
            f = jnp.where(accept, f_new, f)
            return (mu, f, acc + accept.astype(jnp.int32))

        mu, f, acc = jax.lax.fori_loop(
            0, spc, body,
            (mu_ref[:], f_ref[:], jnp.zeros((), jnp.int32)))
        mu_out[:] = mu
        f_out[:] = f
        # Vector-shaped store: Mosaic rejects scalar stores to VMEM refs
        # (the non-grid kernels put this counter in SMEM, which blocked
        # grid outputs don't support).
        acc_out[:] = jnp.full((1, 1), acc, jnp.int32)

    smem = (dict(memory_space=pltpu.SMEM) if _HAS_PLTPU else {})
    vmem = (dict(memory_space=pltpu.VMEM) if _HAS_PLTPU else {})

    @jax.jit
    def step(nmax, eps_blocks, means, factors, *params):
        nmax = jnp.asarray(nmax, jnp.int32).reshape(1)
        eps_blocks = eps_blocks.astype(jnp.float32).reshape(
            k, spc * batch, d)
        means3 = means.astype(jnp.float32).reshape(k, 1, d)
        factors = factors.astype(jnp.float32)
        mu_new, f_new, acc = pl.pallas_call(
            kernel,
            grid=(k,),
            out_shape=(
                jax.ShapeDtypeStruct((k, 1, d), jnp.float32),
                jax.ShapeDtypeStruct((k, d, d), jnp.float32),
                jax.ShapeDtypeStruct((k, 1, 1), jnp.int32),
            ),
            in_specs=[
                pl.BlockSpec(**smem),
                pl.BlockSpec((None, spc * batch, d), lambda i: (i, 0, 0),
                             **vmem),
                pl.BlockSpec((None, 1, d), lambda i: (i, 0, 0), **vmem),
                pl.BlockSpec((None, d, d), lambda i: (i, 0, 0), **vmem),
            ] + [pl.BlockSpec(**vmem)] * n_params,
            out_specs=(
                pl.BlockSpec((None, 1, d), lambda i: (i, 0, 0), **vmem),
                pl.BlockSpec((None, d, d), lambda i: (i, 0, 0), **vmem),
                pl.BlockSpec((None, 1, 1), lambda i: (i, 0, 0), **vmem),
            ),
            interpret=interpret,
            **({"compiler_params": _compiler_params(interpret)}
               if _compiler_params(interpret) else {}),
        )(nmax, eps_blocks, means3, factors,
          *[p.astype(jnp.float32) for p in params])
        return mu_new.reshape(k, d), f_new, acc.reshape(k)

    return step
