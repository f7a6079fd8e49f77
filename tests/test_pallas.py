"""Pallas fused-smoother tests (interpret mode on the CPU mesh).

Real-hardware numbers are covered by bench.py; here the kernel's strip
decomposition, trapezoidal halos, double buffering, masking, and sweep
chunking are validated bit-for-bit against the oracle on shapes that
exercise every code path (single strip, multi-strip, clamped last strip,
steps above the fusion cap).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_poisson_solver_tpu.ops import layout, stencils
from multigrid_poisson_solver_tpu.ops import pallas_kernels as pk


def _fused(u, f, n, h, steps, omega=1.0):
    return pk.fused_jacobi_padded(layout.pad_grid(u), layout.pad_grid(f),
                                  n, h, steps, omega=omega, interpret=True)


def _num_strips(n: int) -> int:
    """Strip count the kernel will use for grid size n (mirrors the kernel's
    own geometry so the test KNOWS which pipeline paths it exercises)."""
    rp, cp = layout.padded_shape(n)
    strip = min(pk._strip_rows(cp, 4), rp)
    if strip >= rp:
        return 1
    return -(-rp // (strip - 2 * pk.HALO))


@pytest.mark.parametrize("n,steps,min_strips", [
    (33, 2, 1),        # single strip, whole grid in VMEM
    (257, 3, 1),       # single strip at larger n
    (1030, 8, 2),      # multi-strip pipeline, max fused sweeps
    (900, 5, 2),       # exactly two strips, clamped second strip
    (2049, 11, 3),     # ≥3 strips; sweeps above the cap -> chunked 8 + 3
])
def test_fused_jacobi_matches_oracle(rng, n, steps, min_strips, monkeypatch):
    # pin the original 13 MiB budget so these sizes keep exercising the
    # multi-strip pipeline (the production default is larger; geometry guard
    # below fails loudly if the cases degrade to trivial single-strip runs)
    monkeypatch.setattr(pk, "_VMEM_BUDGET_BYTES", 13 * 1024 * 1024)
    assert _num_strips(n) >= min_strips

    u = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    h = 1.0 / (n - 1)
    got = _fused(u, f, n, h, steps)
    want = u
    for _ in range(steps):
        want = stencils.jacobi_sweep(want, f, h)
    np.testing.assert_allclose(
        np.asarray(layout.unpad_grid(got, n)), np.asarray(want),
        rtol=0, atol=1e-6)
    # layout invariant: pad cells stay zero
    pad = np.asarray(got).copy()
    pad[:n, :n] = 0
    assert not pad.any()


def test_fused_jacobi_damped(rng):
    n, steps = 129, 4
    u = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    h = 1.0 / (n - 1)
    got = _fused(u, f, n, h, steps, omega=0.8)
    want = u
    for _ in range(steps):
        want = stencils.jacobi_sweep(want, f, h, omega=0.8)
    np.testing.assert_allclose(
        np.asarray(layout.unpad_grid(got, n)), np.asarray(want),
        rtol=0, atol=1e-6)


def test_fused_jacobi_boundary_frozen(rng):
    n = 257
    u = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    h = 1.0 / (n - 1)
    got = layout.unpad_grid(_fused(u, f, n, h, 5), n)
    for sl in (np.s_[0, :], np.s_[-1, :], np.s_[:, 0], np.s_[:, -1]):
        np.testing.assert_array_equal(np.asarray(got[sl]), np.asarray(u[sl]))


@pytest.mark.parametrize("n", [64, 257, 1030])
@pytest.mark.parametrize("negate", [False, True])
def test_residual_pallas_matches_oracle(rng, n, negate):
    u = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    h = 1.0 / (n - 1)
    up, fp = layout.pad_grid(u), layout.pad_grid(f)
    got = pk.residual_pallas(up, fp, n, h, negate=negate, interpret=True)
    want = stencils.residual(u, f, h)
    if negate:
        want = -want
    # tolerance: naive fp32 residual evaluations differ between association
    # orders by ~eps·|u|·k/h² (the documented cancellation noise)
    atol = 8 * 1.2e-7 * float(jnp.abs(u).max()) / (h * h)
    np.testing.assert_allclose(np.asarray(layout.unpad_grid(got, n)),
                               np.asarray(want), rtol=0, atol=atol)
    pad = np.asarray(got).copy()
    pad[:n, :n] = 0
    assert not pad.any()


@pytest.mark.parametrize("n,steps", [
    (257, 1),      # the trigger-mode call shape (single strip)
    (257, 3),      # typical fixed-step want_err
    (1030, 7),     # multi-strip, cpu/clean cap
    (1030, 8),     # gpu metric at the full fusion cap
    (2049, 11),    # chunked: plain-fused prefix + error-emitting tail
])
@pytest.mark.parametrize("compat", [True, False, "gpu"])
def test_fused_error_matches_separate_metric(rng, n, steps, compat):
    """The in-kernel fused error reduction (ker_Smoothing_GPU's fusion,
    MG_solver_GPU.cu:640-661) must agree with smoothing after-the-fact
    metrics for all three reference metrics."""
    from multigrid_poisson_solver_tpu.ops import padded as P

    if compat != "gpu" and steps == 8:
        steps = 7          # cpu/clean fused cap is 7 per pass
    u = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    h = 1.0 / (n - 1)
    up, fp = layout.pad_grid(u), layout.pad_grid(f)
    got_u, got_err = pk.fused_jacobi_err_padded(
        up, fp, n, h, steps, omega=0.8, compat=compat, interpret=True)
    want_u = pk.fused_jacobi_padded(up, fp, n, h, steps, omega=0.8,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(got_u), np.asarray(want_u))
    if compat == "gpu":
        prev = pk.fused_jacobi_padded(up, fp, n, h, steps - 1, omega=0.8,
                                      interpret=True)
        want_err = P.gpu_smoothing_error_p(want_u, prev, h, n)
    else:
        want_err = P.smoothing_error_p(want_u, fp, h, n, compat=compat)
    assert float(got_err) == pytest.approx(float(want_err), rel=2e-5)


def test_fused_error_from_zero(rng):
    """from_zero + fused error: the closed-form first sweep feeds the metric
    correctly (gpu: Δ from the implicit zero iterate; cpu: extra sweep)."""
    from multigrid_poisson_solver_tpu.ops import padded as P

    n, h = 257, 1.0 / 256
    f = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    fp = layout.pad_grid(f)
    z = jnp.zeros_like(fp)
    for compat, steps in [("gpu", 1), ("gpu", 3), (True, 1), (True, 3)]:
        got_u, got_err = pk.fused_jacobi_err_padded(
            z, fp, n, h, steps, compat=compat, from_zero=True,
            interpret=True)
        want_u = pk.fused_jacobi_padded(z, fp, n, h, steps, from_zero=True,
                                        interpret=True)
        np.testing.assert_array_equal(np.asarray(got_u), np.asarray(want_u))
        if compat == "gpu":
            prev = (z if steps == 1 else
                    pk.fused_jacobi_padded(z, fp, n, h, steps - 1,
                                           from_zero=True, interpret=True))
            want_err = P.gpu_smoothing_error_p(want_u, prev, h, n)
        else:
            want_err = P.smoothing_error_p(want_u, fp, h, n, compat=True)
        assert float(got_err) == pytest.approx(float(want_err), rel=2e-5), \
            (compat, steps)


@pytest.mark.parametrize("n,steps", [(129, 3), (257, 1), (1031, 6)])
@pytest.mark.parametrize("restriction", ["sampling", "full_weighting"])
@pytest.mark.parametrize("from_zero", [False, True])
def test_fused_descend_matches_separate_ops(rng, n, steps, restriction,
                                            from_zero):
    """One-kernel descend leg (sweeps + residual + restriction) vs the
    separate oracle ops on a 2:1-aligned hierarchy."""
    from multigrid_poisson_solver_tpu.ops import padded as P

    if restriction == "full_weighting" and steps > 6:
        steps = 6
    m = (n + 1) // 2
    h = 1.0 / (n - 1)
    u0 = (jnp.zeros((n, n), jnp.float32) if from_zero
          else jnp.asarray(rng.standard_normal((n, n)), jnp.float32))
    f = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    up, fp = layout.pad_grid(u0), layout.pad_grid(f)

    got_u, dwide, err = pk.fused_descend_padded(
        up, fp, n, h, steps, omega=0.8, restriction=restriction,
        want_err=True, from_zero=from_zero, interpret=True)
    got_fc = P.restrict_lanes_p(dwide, n, m, layout.padded_shape(m))

    want_u = pk.fused_jacobi_padded(up, fp, n, h, steps, omega=0.8,
                                    from_zero=from_zero, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_u), np.asarray(want_u))

    d = P.residual_p(want_u, fp, h, n)
    if restriction == "full_weighting":
        want_fc = P.full_weighting_restrict_p(-d, n, m, layout.padded_shape(m))
    else:
        want_fc = P.zoom_take_p(-d, n, m, layout.padded_shape(m),
                                zero_boundary=True)
    # residual via the Δ-trick and a different combine order: fp32 op-order
    # differences only
    atol = 2e-6 * float(jnp.abs(d).max() + 1)
    np.testing.assert_allclose(np.asarray(got_fc), np.asarray(want_fc),
                               rtol=0, atol=atol)

    want_err = P.smoothing_error_p(want_u, fp, h, n, compat=True)
    assert float(err) == pytest.approx(float(want_err), rel=1e-4)


@pytest.mark.parametrize("n,steps", [(129, 3), (257, 1), (1031, 8)])
@pytest.mark.parametrize("want_err", [False, True])
def test_fused_ascend_matches_separate_ops(rng, n, steps, want_err):
    """One-kernel ascend leg (prolong + add + post-sweeps) vs the separate
    padded ops on a 2:1-aligned hierarchy."""
    from multigrid_poisson_solver_tpu.ops import padded as P

    if want_err and steps > 7:
        steps = 7
    m = (n + 1) // 2
    h = 1.0 / (n - 1)
    uf = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    uc = jnp.asarray(rng.standard_normal((m, m)), jnp.float32)
    uc = uc.at[0, :].set(0).at[-1, :].set(0).at[:, 0].set(0).at[:, -1].set(0)
    f = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    ufp, fp = layout.pad_grid(uf), layout.pad_grid(f)
    ucp = layout.pad_grid(uc)
    rp, cp = ufp.shape

    cwide = P.prolong_lanes_p(ucp, m, n, (rp // 2 + 8, cp))
    got_u, err = pk.fused_ascend_padded(ufp, fp, cwide, n, h, steps,
                                        omega=0.8, want_err=want_err,
                                        interpret=True)

    corr = P.zoom_take_p(ucp, m, n, (rp, cp))
    want_u = P.add_correction_p(ufp, corr, n)
    want_u = pk.fused_jacobi_padded(want_u, fp, n, h, steps, omega=0.8,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u),
                               rtol=0, atol=1e-6)
    if want_err:
        want_err_v = P.smoothing_error_p(want_u, fp, h, n, compat=True)
        assert float(err) == pytest.approx(float(want_err_v), rel=1e-4)
    else:
        assert err is None


def test_fused_descend_in_compiled_engine():
    """Compiled engine with kernels='pallas' on an aligned (coarsen=3)
    schedule routes descends through the fused kernel and matches the XLA
    engine."""
    import multigrid_poisson_solver_tpu as mg
    from multigrid_poisson_solver_tpu.compiled import compile_program

    program = mg.v_cycle(129, n_min=8, steps=3, coarse_option=0, coarsen=3)
    outs = {}
    for kern in ("pallas", "xla"):
        cc = compile_program(program, mg.REFERENCE_PROBLEM,
                             mg.SolverConfig(omega=0.8, kernels=kern),
                             donate=False)
        u, f = cc.init()
        u1, err = cc(u, f)
        outs[kern] = (np.asarray(cc.unpad(u1)), float(err))
    np.testing.assert_allclose(outs["pallas"][0], outs["xla"][0],
                               rtol=1e-4, atol=1e-6)
    assert outs["pallas"][1] == pytest.approx(outs["xla"][1], rel=1e-3)


def test_zero_steps_is_identity(rng):
    n = 65
    u = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    up = layout.pad_grid(u)
    out = pk.fused_jacobi_padded(up, up, n, 1.0 / (n - 1), 0, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(up))


@pytest.mark.parametrize("compat", [True, False, "gpu"])
def test_per_sweep_errs_match_sequential(rng, compat):
    """fused_jacobi_errs_padded (trigger batching): iterates bit-match the
    plain fused kernel; every per-iterate error matches the sequential
    single-sweep fused_jacobi_err_padded chain."""
    n, h = 257, 1.0 / 256
    u = layout.pad_grid(jnp.asarray(rng.standard_normal((n, n)), jnp.float32))
    f = layout.pad_grid(jnp.asarray(rng.standard_normal((n, n)), jnp.float32))
    k = pk.errs_sweep_cap(compat)
    got_u, errs = pk.fused_jacobi_errs_padded(u, f, n, h, k, omega=0.9,
                                              compat=compat, interpret=True)
    want_u = pk.fused_jacobi_padded(u, f, n, h, k, omega=0.9, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_u), np.asarray(want_u))
    v = u
    for s in range(k):
        v, e = pk.fused_jacobi_err_padded(v, f, n, h, 1, omega=0.9,
                                          compat=compat, interpret=True)
        assert float(errs[s]) == pytest.approx(float(e), rel=3e-6), s


def test_multiword_residual_kernels_match_xla_forms(rng):
    """residual_tw_pallas / residual_df_pallas vs the refine XLA forms.

    Regression guard: the strip kernel's out-DMA once referenced an
    undefined ext_c (NameError) — CPU tests never traced it because refine
    only dispatches to Pallas on TPU."""
    from multigrid_poisson_solver_tpu.refine import residual_df_p, residual_tw_p

    n, h = 257, 1.0 / 256
    rp_cp = layout.padded_shape(n)
    mk = lambda: layout.pad_grid(
        jnp.asarray(rng.standard_normal((n, n)) * 1e-3, jnp.float32))
    u0, u1, u2, f = mk(), mk(), mk(), mk()
    got = pk.residual_tw_pallas(u0, u1, u2, f, n, h, interpret=True)
    want = residual_tw_p(u0, u1, u2, f, h, n)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    got = pk.residual_df_pallas(u0, u1, f, n, h, interpret=True)
    want = residual_df_p(u0, u1, f, h, n)
    # df: the kernel gives the second word the full dd-EFT treatment (more
    # accurate than the XLA form — documented in its docstring)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6 * float(jnp.abs(want).max()))


@pytest.mark.slow
def test_fused_ascend_panelized_matches_separate_ops(rng, monkeypatch):
    """The 2-D (lane-panel) ascend geometry engages at cp >= 4096 (n=4097
    here -> 3 panels x 128-lane halos): must still bit-match the separate
    ops, including the fused error's two-axis ownership selection."""
    from multigrid_poisson_solver_tpu.ops import padded as P

    n, steps = 4097, 3
    m = (n + 1) // 2
    h = 1.0 / (n - 1)
    uf = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    uc = jnp.asarray(rng.standard_normal((m, m)), jnp.float32)
    uc = uc.at[0, :].set(0).at[-1, :].set(0).at[:, 0].set(0).at[:, -1].set(0)
    f = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    ufp, fp = layout.pad_grid(uf), layout.pad_grid(f)
    ucp = layout.pad_grid(uc)
    rp, cp = ufp.shape
    monkeypatch.setattr(pk, "_VMEM_BUDGET_BYTES", 13 * 1024 * 1024)
    assert pk._ascend_geometry(rp, cp, 0, 4)[4] > 1   # panels actually on

    cwide = P.prolong_lanes_p(ucp, m, n, (rp // 2 + 8, cp))
    got_u, err = pk.fused_ascend_padded(ufp, fp, cwide, n, h, steps,
                                        omega=0.8, want_err=True,
                                        interpret=True)
    corr = P.zoom_take_p(ucp, m, n, (rp, cp))
    want_u = P.add_correction_p(ufp, corr, n)
    want_u = pk.fused_jacobi_padded(want_u, fp, n, h, steps, omega=0.8,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(got_u), np.asarray(want_u))
    want_err = P.smoothing_error_p(want_u, fp, h, n, compat=True)
    assert float(err) == pytest.approx(float(want_err), rel=1e-4)


@pytest.mark.slow
def test_fused_descend_panelized_matches_separate_ops(rng):
    """Lane-panel descend geometry (n=4097 -> 5x1920-lane panels at 8193-
    class widths; here whatever the optimizer picks) matches the separate
    ops to fp32 eps (the in-kernel extra-sweep residual reassociates)."""
    from multigrid_poisson_solver_tpu.ops import padded as P

    n, steps = 4097, 3
    m = (n + 1) // 2
    h = 1.0 / (n - 1)
    u = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    up, fp = layout.pad_grid(u), layout.pad_grid(f)
    got_u, dwide, err = pk.fused_descend_padded(
        up, fp, n, h, steps, omega=0.8, restriction="sampling", compat=True,
        want_err=True, interpret=True)
    want_u = pk.fused_jacobi_padded(up, fp, n, h, steps, omega=0.8,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(got_u), np.asarray(want_u))
    d = P.residual_p(want_u, fp, h, n)
    mshape = layout.padded_shape(m)
    want_fc = P.zoom_take_p(-d, n, m, mshape, zero_boundary=True)
    got_fc = P.restrict_lanes_p(dwide, n, m, mshape)
    scale = float(jnp.abs(want_fc).max())
    assert float(jnp.abs(got_fc - want_fc).max()) < 3e-7 * scale
    want_err = P.smoothing_error_p(want_u, fp, h, n, compat=True)
    assert float(err) == pytest.approx(float(want_err), rel=1e-4)
