"""Hardware validation: runs on a REAL TPU only (``TESTS_ON_TPU=1``).

The CPU suite covers the Pallas kernels in interpret mode; these tests pin
the actual Mosaic-compiled kernels against the XLA paths on hardware
(VERDICT round-1 item #1: agreement asserted on the real TPU at least once).

Run:  TESTS_ON_TPU=1 python -m pytest tests/test_tpu_hardware.py -q
(under the axon tunnel: keep PYTHONPATH so the TPU backend resolves).
Skipped automatically in the CPU CI (conftest forces the cpu platform there).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsmvi_tpu.driver import on_tpu

pytestmark = pytest.mark.skipif(not on_tpu(), reason="needs a real TPU")


@pytest.fixture(scope="module")
def rng32():
    return np.random.default_rng(0)


def test_fused_update_matches_jnp_on_tpu(rng32):
    from gsmvi_tpu.ops.gsm_eps import apply_eps_step
    from gsmvi_tpu.ops.pallas.fused_step import gsm_eps_update_fused

    b, d = 32, 256
    f = (0.3 * rng32.normal(size=(d, d)) + np.eye(d)).astype(np.float32)
    mu = rng32.normal(size=d).astype(np.float32)
    eps = rng32.normal(size=(b, d)).astype(np.float32)
    v = (0.3 * rng32.normal(size=(b, d))).astype(np.float32)
    m_j, f_j, good_j = apply_eps_step(jnp.asarray(mu), jnp.asarray(f),
                                      jnp.asarray(eps), jnp.asarray(v),
                                      jitter=1e-6)
    m_p, f_p, good_p = gsm_eps_update_fused(jnp.asarray(eps), jnp.asarray(v),
                                            jnp.asarray(mu), jnp.asarray(f))
    assert bool(good_j) and bool(good_p)
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_j), atol=1e-5)
    s_p = np.asarray(f_p) @ np.asarray(f_p).T
    s_j = np.asarray(f_j) @ np.asarray(f_j).T
    scale = max(1.0, float(np.abs(s_j).max()))
    np.testing.assert_allclose(s_p, s_j, atol=1e-5 * scale)


def test_inkernel_prng_moments():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import gsmvi_tpu.ops.pallas.fused_step as fs

    b, d = 32, 256

    def kern(seed_ref, eps_ref):
        pltpu.prng_seed(seed_ref[0])
        eps_ref[:] = fs._boxmuller((b, d))

    @jax.jit
    def gen(seed):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(seed.reshape(1))

    e1 = np.asarray(gen(jnp.int32(1)))
    e2 = np.asarray(gen(jnp.int32(2)))
    assert np.isfinite(e1).all()
    assert abs(e1.mean()) < 0.05 and abs(e1.std() - 1.0) < 0.05
    assert not np.allclose(e1, e2)  # distinct seeds -> distinct streams


def test_fused_whole_step_fit_converges_on_tpu():
    from gsmvi_tpu import FactorGSM
    from gsmvi_tpu.models import dense_gaussian

    d = 256
    t = dense_gaussian(jax.random.PRNGKey(3), d)
    fg = FactorGSM(D=d, lp=t.lp, lp_g=t.lp_g, pallas_score=t.pallas_score)
    st = fg.fit(jax.random.PRNGKey(0), niter=2000, batch_size=32,
                verbose=False, return_state=True)
    assert int(np.asarray(st.n_accepted)) == 2001
    np.testing.assert_allclose(np.asarray(st.mean), np.asarray(t.mean),
                               atol=0.02)
    cerr = float(np.abs(np.asarray(st.cov) - np.asarray(t.cov)).max())
    assert cerr / max(1.0, float(np.abs(np.asarray(t.cov)).max())) < 0.02


def test_inkernel_chol_matches_numpy(rng32):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import gsmvi_tpu.ops.pallas.fused_step as fs

    k = 64
    m = rng32.normal(size=(k, k)).astype(np.float32)
    a = m @ m.T + k * np.eye(k, dtype=np.float32)

    def kern(a_ref, l_ref, piv_ref, w_s):
        w_s[:] = a_ref[:]
        piv_ref[0, 0] = fs._cholt_inplace(w_s, l_ref, k)

    @jax.jit
    def chol(a):
        return pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((k, k), jnp.float32),
                       jax.ShapeDtypeStruct((1, 1), jnp.float32)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            scratch_shapes=[pltpu.VMEM((k, k), jnp.float32)],
        )(a)

    lt, piv = chol(jnp.asarray(a))
    assert float(np.asarray(piv)[0, 0]) > 0
    np.testing.assert_allclose(np.asarray(lt).T, np.linalg.cholesky(a),
                               atol=1e-4 * float(np.abs(a).max()))


def test_fused_update_matches_jnp_on_tpu_d1024(rng32):
    """The raised scoped-VMEM cap (CompilerParams) must admit the D=1024
    kernel that the 16 MB Mosaic default rejected; pin it against XLA."""
    from gsmvi_tpu.ops.gsm_eps import apply_eps_step
    from gsmvi_tpu.ops.pallas.fused_step import (fused_supported,
                                                 gsm_eps_update_fused)

    b, d = 32, 1024
    assert fused_supported(b, d)
    f = (0.1 * rng32.normal(size=(d, d)) + np.eye(d)).astype(np.float32)
    mu = rng32.normal(size=d).astype(np.float32)
    eps = rng32.normal(size=(b, d)).astype(np.float32)
    v = (0.3 * rng32.normal(size=(b, d))).astype(np.float32)
    m_j, f_j, good_j = apply_eps_step(jnp.asarray(mu), jnp.asarray(f),
                                      jnp.asarray(eps), jnp.asarray(v),
                                      jitter=1e-6)
    m_p, f_p, good_p = gsm_eps_update_fused(jnp.asarray(eps), jnp.asarray(v),
                                            jnp.asarray(mu), jnp.asarray(f))
    assert bool(good_j) and bool(good_p)
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_j), atol=1e-4)
    s_p = np.asarray(f_p) @ np.asarray(f_p).T
    s_j = np.asarray(f_j) @ np.asarray(f_j).T
    scale = max(1.0, float(np.abs(s_j).max()))
    np.testing.assert_allclose(s_p, s_j, atol=1e-4 * scale)


def test_fused_zoo_scores_run_on_hardware():
    """The non-Gaussian in-kernel scores (student-t here as representative —
    matmul + row reduction + rational elementwise) must Mosaic-compile and
    converge through the one-kernel fused fit on a real chip."""
    from gsmvi_tpu import FactorGSM
    from gsmvi_tpu.models import student_t

    d, b = 256, 32
    t = student_t(jax.random.PRNGKey(2), d, df=6.0)
    fg = FactorGSM(D=d, lp=t.lp, lp_g=t.lp_g, pallas_score=t.pallas_score)
    assert fg._pallas_mode(b) == "step"
    mean, cov = fg.fit(jax.random.PRNGKey(0), niter=3000, batch_size=b,
                       verbose=False)
    m = np.asarray(mean)
    assert np.all(np.isfinite(m))
    assert np.all(np.linalg.eigvalsh(np.asarray(cov)) > 0)
    np.testing.assert_allclose(m, np.asarray(t.mean), atol=0.05)


def test_bam_fused_update_matches_xla_svd_on_tpu():
    """VERDICT r2 item #2 acceptance: the Mosaic-compiled fused BaM update
    agrees with the XLA bam_eps SVD path on hardware (benign conditioning;
    stiff steps are gate-flagged and replayed, tested below).

    Own deterministic rng: the shared module fixture made the data depend
    on run ORDER (other tests consume draws first), silently changing what
    this test measured.  The XLA oracle must run under
    default_matmul_precision("float32") exactly as the fitter invokes it —
    unpinned, the TPU's default bf16 matmul passes put a ~4e-3 relative
    error on the ORACLE side (measured; chain-length-independent), which
    this test once mis-read as kernel error.  Pinned, kernel-vs-SVD
    agreement is ~2e-6 of scale on this seed."""
    from gsmvi_tpu.ops.bam_eps import bam_eps_update
    from gsmvi_tpu.ops.pallas.bam_fused import bam_eps_update_fused

    rng = np.random.default_rng(12345)
    b, d = 32, 256
    f = (0.05 * rng.normal(size=(d, d)) + np.eye(d)).astype(np.float32)
    mu = rng.normal(size=d).astype(np.float32)
    eps = rng.normal(size=(b, d)).astype(np.float32)
    x = mu + eps @ f.T
    v = (-(x - 0.5)).astype(np.float32)
    reg = 1.0
    with jax.default_matmul_precision("float32"):
        m_x, f_x, good_x = bam_eps_update(jnp.asarray(eps), jnp.asarray(v),
                                          jnp.asarray(mu), jnp.asarray(f),
                                          reg, solver="svd")
        s_x = np.asarray(f_x @ f_x.T)
    m_p, f_p, good_p, stiff, *_ = bam_eps_update_fused(
        jnp.asarray(eps), jnp.asarray(v), jnp.asarray(mu), jnp.asarray(f),
        reg)
    assert bool(good_x) and bool(good_p) and not bool(stiff)
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_x), atol=1e-4)
    s_p = np.asarray(f_p) @ np.asarray(f_p).T
    scale = max(1.0, float(np.abs(s_x).max()))
    np.testing.assert_allclose(s_p, s_x, atol=1e-5 * scale)


def test_advi_fused_kernel_matches_interpret_on_tpu(rng32):
    """The Mosaic-compiled fused ADVI multistep kernel agrees with the
    interpret-mode run (the CPU-CI oracle — itself pinned against an
    autodiff+optax oracle in test_advi_fused.py) on identical inputs:
    the eps block is external, so the two runs differ only by Mosaic vs
    XLA matmul scheduling.  Tolerance 1e-4 (not 1e-5): Adam's
    1/(sqrt(v)+eps) step amplifies product-rounding differences on
    early low-second-moment entries (measured max 5.3e-5 over 8 steps
    on state of magnitude ~40, i.e. ~1e-6 relative)."""
    from gsmvi_tpu.models import dense_gaussian
    from gsmvi_tpu.ops.pallas.advi_fused import make_fused_advi_multistep

    b, d, spc = 32, 256, 8
    t = dense_gaussian(jax.random.PRNGKey(3), d)
    score_fn, sparams = t.pallas_score
    loc0 = jnp.asarray(rng32.normal(size=d), jnp.float32)
    l0 = jnp.tril(jnp.eye(d, dtype=jnp.float32) + 0.05 * jnp.asarray(
        rng32.normal(size=(d, d)), jnp.float32))
    eps = jnp.asarray(rng32.normal(size=(spc * b, d)), jnp.float32)
    lrs = jnp.full((spc,), 1e-2, jnp.float32)
    t_idx = jnp.arange(1, spc + 1, dtype=jnp.float32)
    bc1s = 1.0 / (1.0 - 0.9 ** t_idx)
    bc2s = 1.0 / (1.0 - 0.999 ** t_idx)
    z = jnp.zeros(d, jnp.float32)
    zm = jnp.zeros((d, d), jnp.float32)
    args = (lrs, bc1s, bc2s, spc, eps, loc0, l0, z, z, zm, zm, *sparams)
    hw = make_fused_advi_multistep(score_fn, len(sparams), b, d, spc)(*args)
    it = make_fused_advi_multistep(score_fn, len(sparams), b, d, spc,
                                   interpret=True)(*args)
    for a_hw, a_it in zip(hw, it):
        np.testing.assert_allclose(np.asarray(a_hw), np.asarray(a_it),
                                   atol=1e-4, rtol=1e-5)


def test_advi_stl_fused_kernel_matches_interpret_on_tpu(rng32):
    """Mosaic vs interpret agreement for the fused STL kernel (tracked
    inverse included).  Tolerance as the analytic-kernel test: Adam
    amplifies matmul rounding on early low-second-moment entries."""
    from gsmvi_tpu.models import dense_gaussian
    from gsmvi_tpu.ops.pallas.advi_fused import \
        make_fused_advi_stl_multistep

    b, d, spc = 32, 256, 8
    t = dense_gaussian(jax.random.PRNGKey(3), d)
    score_fn, sparams = t.pallas_score
    loc0 = jnp.asarray(rng32.normal(size=d), jnp.float32)
    l0 = jnp.tril(jnp.eye(d, dtype=jnp.float32) + 0.05 * jnp.asarray(
        rng32.normal(size=(d, d)), jnp.float32))
    ainv0 = jax.scipy.linalg.solve_triangular(
        l0, jnp.eye(d, dtype=jnp.float32), lower=True).astype(jnp.float32)
    eps = jnp.asarray(rng32.normal(size=(spc * b, d)), jnp.float32)
    lrs = jnp.full((spc,), 1e-2, jnp.float32)
    t_idx = jnp.arange(1, spc + 1, dtype=jnp.float32)
    bc1s = 1.0 / (1.0 - 0.9 ** t_idx)
    bc2s = 1.0 / (1.0 - 0.999 ** t_idx)
    z = jnp.zeros(d, jnp.float32)
    zm = jnp.zeros((d, d), jnp.float32)
    args = (lrs, bc1s, bc2s, spc, eps, loc0, l0, ainv0, z, z, zm, zm,
            *sparams)
    hw = make_fused_advi_stl_multistep(score_fn, len(sparams), b, d,
                                       spc)(*args)
    it = make_fused_advi_stl_multistep(score_fn, len(sparams), b, d, spc,
                                       interpret=True)(*args)
    assert int(hw[7]) == int(it[7]) and int(hw[8]) == int(it[8])
    for a_hw, a_it in zip(hw[:7], it[:7]):
        np.testing.assert_allclose(np.asarray(a_hw), np.asarray(a_it),
                                   atol=1e-4, rtol=1e-4)


def test_advi_fused_fit_converges_on_tpu():
    """End-to-end fit_fused on hardware recovers a benign target's moments
    (the real Mosaic kernel, multistep loop, fold_in eps stream)."""
    from gsmvi_tpu import ADVI
    from gsmvi_tpu.models import dense_gaussian

    d = 64
    t = dense_gaussian(jax.random.PRNGKey(7), d, scale=0.3)
    g = ADVI(D=d, lp=t.lp, pallas_score=t.pallas_score)
    assert g._fused_supported(32)
    mean, cov, _ = g.fit_fused(jax.random.PRNGKey(0), learning_rate=3e-2,
                               niter=6000, batch_size=32, verbose=False)
    scale = max(1.0, float(np.abs(np.asarray(t.cov)).max()))
    assert np.abs(np.asarray(mean) - np.asarray(t.mean)).max() < 0.1 * scale
    assert np.abs(np.asarray(cov) - np.asarray(t.cov)).max() < 0.15 * scale


def test_bam_fused_whole_step_fit_converges_on_tpu():
    """Fused multistep BaM (with stiff replay) recovers the bench target's
    moments at D=256 — the stiff early phase must not bias the fit."""
    from gsmvi_tpu import FactorBaM, Regularizers
    from gsmvi_tpu.models import dense_gaussian

    d = 256
    t = dense_gaussian(jax.random.PRNGKey(3), d)
    g = FactorBaM(D=d, lp=t.lp, lp_g=t.lp_g, pallas_score=t.pallas_score,
                  steps_per_call=8)
    assert g._pallas_mode(32) == "step"
    state = g.fit(jax.random.PRNGKey(0), regf=Regularizers().linear(100.0),
                  niter=8000, batch_size=32, verbose=False, retries=0,
                  return_state=True)
    assert int(state.step) == 8001
    me = float(np.max(np.abs(np.asarray(state.mean) - np.asarray(t.mean))))
    cov = np.asarray(state.factor @ state.factor.T)
    ce = float(np.max(np.abs(cov - np.asarray(t.cov)))
               / max(1.0, float(np.abs(np.asarray(t.cov)).max())))
    assert me < 1e-2, me
    assert ce < 1e-2, ce


def test_mesh1_fused_update_matches_unmeshed_on_tpu():
    """VERDICT r3 item #6: the mesh-composed fused update path
    (parallel/sharded.make_gathered_update — per-shard scores, all_gather,
    replicated Pallas kernel + stiff-replay cond) had only ever run in
    interpret mode.  A 1-device mesh on the real chip exercises the same
    composition with real Mosaic lowering; its trajectory must match the
    unmeshed fused-update trajectory."""
    from jax.sharding import Mesh

    from gsmvi_tpu import FactorBaM, FactorGSM, Regularizers
    from gsmvi_tpu.models import dense_gaussian

    d, b, niter = 256, 32, 400
    t = dense_gaussian(jax.random.PRNGKey(3), d)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))

    # FactorGSM: meshed vs unmeshed fused update.
    outs = []
    for m in (mesh, None):
        g = FactorGSM(D=d, lp=t.lp, lp_g=t.lp_g, mesh=m)
        assert g._pallas_mode(b) == "update"
        st = g.fit(jax.random.PRNGKey(0), niter=niter, batch_size=b,
                   verbose=False, return_state=True)
        outs.append((np.asarray(st.mean), np.asarray(st.factor),
                     int(st.n_accepted)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-5)
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-5)
    assert outs[0][2] == outs[1][2]

    # FactorBaM: meshed vs unmeshed fused update (+ feedback ladder carry).
    outs = []
    for m in (mesh, None):
        g = FactorBaM(D=d, lp=t.lp, lp_g=t.lp_g, mesh=m)
        assert g._pallas_mode(b) == "update"
        st = g.fit(jax.random.PRNGKey(0), regf=Regularizers().linear(100.0),
                   niter=niter, batch_size=b, verbose=False, retries=0,
                   return_state=True)
        outs.append((np.asarray(st.mean), np.asarray(st.factor),
                     int(st.n_accepted)))
    scale = max(1.0, float(np.abs(outs[1][1]).max()))
    np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-5)
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-5 * scale)
    assert outs[0][2] == outs[1][2]
