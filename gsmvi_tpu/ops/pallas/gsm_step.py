"""Fused GSM update as a single Pallas kernel.

The jnp path (ops/gsm.py) lowers to ~6 XLA ops that each round-trip the
(B, D) row tensors and D x D covariance through HBM: the T = V S0 matmul, the
rowwise scalar block, two Gram matmuls, and the add/symmetrize epilogue.  This
kernel keeps everything in VMEM: one HBM read of (samples, vs, mu0, S0), one
HBM write of (mu, S).  For the small/medium D where GSM runs (D <= ~1024) the
whole working set fits in VMEM, so the kernel is one program (no grid) and the
MXU does the three matmuls back-to-back.

Numerics match ops/gsm.py: f32 accumulation, explicit symmetrization.
Shapes must satisfy the VMEM budget; ``pallas_supported`` gates usage and the
fitters fall back to the jnp path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu import fails on some non-TPU builds; gate it.
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

# VMEM budget: inputs (B,D)*2, intermediates ~5*(B,D), S0 + S_out + ds.
_VMEM_LIMIT_BYTES = 14 * 1024 * 1024


def pallas_supported(b: int, d: int, itemsize: int = 4) -> bool:
    """True if the fused single-program kernel fits comfortably in VMEM."""
    if not _HAS_PLTPU:
        return False
    rows = 7 * b * d * itemsize
    mats = 3 * d * d * itemsize
    return rows + mats < _VMEM_LIMIT_BYTES


def _gsm_kernel(samples_ref, vs_ref, mu0_ref, s0_ref, mu_ref, s_ref, *,
                batch: int):
    x = samples_ref[:]                       # (B, D)
    v = vs_ref[:]                            # (B, D)
    mu0 = mu0_ref[:]                         # (1, D)
    s0 = s0_ref[:]                           # (D, D)

    a = mu0 - x
    t = jnp.dot(v, s0, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    vsv = jnp.sum(v * t, axis=1, keepdims=True)
    mv = jnp.sum(a * v, axis=1, keepdims=True)
    rho = 0.5 * (jnp.sqrt(1.0 + 4.0 * (vsv + mv * mv)) - 1.0)
    eps0 = t - a
    w = jnp.sum(v * eps0, axis=1, keepdims=True)
    dmu_b = (eps0 - a * (w / (1.0 + rho + mv))) / (1.0 + rho)
    bm = a + dmu_b

    mu_ref[:] = mu0 + jnp.sum(dmu_b, axis=0, keepdims=True) / batch

    contract = (((0,), (0,)), ((), ()))      # a^T a without explicit transpose
    gram_a = jax.lax.dot_general(a, a, contract,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
    gram_b = jax.lax.dot_general(bm, bm, contract,
                                 preferred_element_type=jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
    ds = (gram_a - gram_b) / batch
    s_ref[:] = s0 + 0.5 * (ds + ds.T)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gsm_update_fused(samples, vs, mu0, S0, interpret: bool = False):
    """Pallas drop-in for ``ops.gsm.gsm_update``: returns (mu, S).

    f32 only (TPU-native dtype); callers with f64 state should use the jnp
    path.  ``interpret=True`` runs the kernel in interpreter mode (CI on CPU).
    """
    b, d = samples.shape
    dtype = jnp.float32
    samples = samples.astype(dtype)
    vs = vs.astype(dtype)
    mu0_2d = mu0.astype(dtype).reshape(1, d)
    S0 = S0.astype(dtype)

    kernel = functools.partial(_gsm_kernel, batch=b)
    specs = dict(memory_space=pltpu.VMEM) if _HAS_PLTPU else {}
    mu, s = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, d), dtype),
            jax.ShapeDtypeStruct((d, d), dtype),
        ),
        in_specs=[pl.BlockSpec(**specs)] * 4,
        out_specs=(pl.BlockSpec(**specs), pl.BlockSpec(**specs)),
        interpret=interpret,
    )(samples, vs, mu0_2d, S0)
    return mu[0], s
