"""3-D Pallas brick-streaming kernels vs the models.poisson3d oracle.

All cases run in interpret mode on CPU (conftest forces the cpu platform);
the TPU hardware validation lives in BASELINE.md. The small-budget cases
monkeypatch the VMEM budget so brick decomposition (num_zb, num_rb > 1) is
exercised at n=33 instead of n≥129.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_poisson_solver_tpu.models import poisson3d as p3
from multigrid_poisson_solver_tpu.ops import pallas3d as p3k

OMEGA3 = 6.0 / 7.0


def _mk(n, seed=0):
    rng = np.random.default_rng(seed)
    u = np.zeros((n, n, n), np.float32)
    u[1:-1, 1:-1, 1:-1] = rng.standard_normal((n - 2,) * 3).astype(np.float32)
    f = rng.standard_normal((n,) * 3).astype(np.float32)
    return jnp.asarray(u), jnp.asarray(f)


def _sweeps(u, f, h, k):
    for _ in range(k):
        u = p3.jacobi_sweep3(u, f, h, omega=OMEGA3)
    return u


def test_brick_geometry_invariants():
    for n in (33, 129, 513):
        nz, rp, cp = p3k.padded_shape3(n)
        assert rp % 16 == 0 and cp % 128 == 0 and nz == n
        for z_halo, nb in ((8, 5.0), (1, 6.0)):
            zs, rs, oz, orow = p3k._brick_geometry(nz, rp, cp, 4, z_halo, nb)
            assert rs % 8 == 0 and orow % 8 == 0
            assert 1 <= oz <= zs <= nz and orow <= rs <= rp
            if zs < nz:
                assert oz == zs - 2 * z_halo
            if rs < rp:
                assert orow == rs - 16


def test_residual3_matches_oracle():
    n, h = 33, 1.0 / 32
    u, f = _mk(n)
    up, fp = p3k.pad_grid3(u), p3k.pad_grid3(f)
    got = p3k.unpad_grid3(
        p3k.residual3_pallas(up, fp, n, h, interpret=True), n)
    want = p3.residual3(u, f, h)
    scale = float(jnp.abs(want).max())
    assert float(jnp.abs(got - want).max()) < 1e-6 * scale
    gotn = p3k.unpad_grid3(
        p3k.residual3_pallas(up, fp, n, h, negate=True, interpret=True), n)
    assert float(jnp.abs(gotn + want).max()) < 1e-6 * scale


@pytest.mark.parametrize("steps", [1, 2, 8])
def test_fused_jacobi3_matches_oracle(steps):
    n, h = 33, 1.0 / 32
    u, f = _mk(n, seed=steps)
    got = p3k.unpad_grid3(
        p3k.fused_jacobi3_padded(p3k.pad_grid3(u), p3k.pad_grid3(f), n, h,
                                 steps, interpret=True), n)
    want = _sweeps(u, f, h, steps)
    assert float(jnp.abs(got - want).max()) < 1e-5


@pytest.mark.parametrize("steps", [1, 3])
def test_fused_jacobi3_from_zero(steps):
    n, h = 33, 1.0 / 32
    _, f = _mk(n, seed=10 + steps)
    got = p3k.unpad_grid3(
        p3k.fused_jacobi3_padded(jnp.zeros(p3k.padded_shape3(n), f.dtype),
                                 p3k.pad_grid3(f), n, h, steps,
                                 from_zero=True, interpret=True), n)
    want = _sweeps(jnp.zeros((n, n, n), f.dtype), f, h, steps)
    assert float(jnp.abs(got - want).max()) < 1e-5


def test_multi_brick_decomposition(monkeypatch):
    """A small VMEM budget forces num_zb > 1 AND num_rb > 1 at n=33."""
    monkeypatch.setattr(p3k, "_VMEM_BUDGET_3D_BYTES", 600_000)
    n, h = 33, 1.0 / 32
    nz, rp, cp = p3k.padded_shape3(n)
    zs, rs, oz, orow = p3k._brick_geometry(nz, rp, cp, 4, z_halo=2)
    assert zs < nz and rs < rp  # the point of this test

    u, f = _mk(n, seed=7)
    got = p3k.unpad_grid3(
        p3k.fused_jacobi3_padded(p3k.pad_grid3(u), p3k.pad_grid3(f), n, h, 2,
                                 interpret=True), n)
    want = _sweeps(u, f, h, 2)
    assert float(jnp.abs(got - want).max()) < 1e-5

    got = p3k.unpad_grid3(
        p3k.residual3_pallas(p3k.pad_grid3(u), p3k.pad_grid3(f), n, h,
                             interpret=True), n)
    want = p3.residual3(u, f, h)
    assert (float(jnp.abs(got - want).max())
            < 1e-6 * float(jnp.abs(want).max()))


def test_v_cycle3_pallas_matches_xla():
    """kernels="pallas" routes finest-level smoothing + residual through the
    brick kernels; the cycle must match the XLA path to fp32 roundoff."""
    n, h = 65, 1.0 / 64
    u, f = _mk(n, seed=3)
    a = p3.v_cycle3(u, f, h, pre=2, post=2, coarse_sweeps=10)
    b = p3.v_cycle3(u, f, h, pre=2, post=2, coarse_sweeps=10,
                    kernels="pallas")
    assert float(jnp.abs(a - b).max()) < 1e-5 * float(jnp.abs(a).max() + 1)


def test_bf16_traces():
    n, h = 33, 1.0 / 32
    u = jnp.zeros(p3k.padded_shape3(n), jnp.bfloat16)
    f = jnp.ones(p3k.padded_shape3(n), jnp.bfloat16)
    outs = [p3k.fused_jacobi3_padded(u, f, n, h, 2, interpret=True),
            p3k.residual3_pallas(u, f, n, h, interpret=True)]
    for o in outs:
        assert o.dtype == jnp.bfloat16


# ---------------------------------------------------------------------------
# fused descend leg
# ---------------------------------------------------------------------------

from multigrid_poisson_solver_tpu.ops import padded3 as pd3


def _descend_oracle(u, f, h, steps, mode, from_zero=False):
    n = u.shape[0]
    m = (n + 1) // 2
    u0 = jnp.zeros_like(u) if from_zero else u
    uk = _sweeps(u0, f, h, steps)
    r = p3.residual3(uk, f, h)
    fc = pd3.restrict3_p(p3k.pad_grid3(-r), n, m, mode=mode)
    err = jnp.sum(jnp.abs(r[1:-1, 1:-1, 1:-1]))
    return uk, fc, err


@pytest.mark.parametrize("mode", ["full_weighting", "sampling"])
@pytest.mark.parametrize("steps,from_zero", [(1, False), (3, False),
                                             (2, True)])
def test_fused_descend3_matches_oracle(mode, steps, from_zero):
    n, h = 33, 1.0 / 32
    m = (n + 1) // 2
    u, f = _mk(n, seed=20 + steps)
    up = (jnp.zeros(p3k.padded_shape3(n), f.dtype) if from_zero
          else p3k.pad_grid3(u))
    uo, dw, err = p3k.fused_descend3_padded(
        up, p3k.pad_grid3(f), n, h, steps, omega=OMEGA3,
        from_zero=from_zero, restriction=mode, interpret=True)
    fc = pd3.restrict3_lanes_p(dw, n, m)
    want_u, want_fc, want_err = _descend_oracle(u, f, h, steps, mode,
                                                from_zero)
    assert float(jnp.abs(p3k.unpad_grid3(uo, n) - want_u).max()) < 1e-5
    scale = float(jnp.abs(want_fc).max()) + 1e-30
    assert float(jnp.abs(fc - want_fc).max()) < 2e-6 * scale
    assert abs(float(err[0, 0]) - float(want_err)) < 1e-5 * float(want_err)


@pytest.mark.parametrize("mode", ["full_weighting", "sampling"])
def test_fused_descend3_multi_brick(monkeypatch, mode):
    monkeypatch.setattr(p3k, "_VMEM_BUDGET_3D_LEGS_BYTES", 1_600_000)
    n, h = 33, 1.0 / 32
    m = (n + 1) // 2
    nz, rp, cp = p3k.padded_shape3(n)
    zs, rs, oz, orow = p3k._brick_geometry(nz, rp, cp, 4, z_halo=4,
                                           num_bufs=6.6, orow_mult=16,
                                           oz_even=True,
                                           budget=p3k._VMEM_BUDGET_3D_LEGS_BYTES)
    assert zs < nz and rs < rp and oz % 2 == 0 and orow % 16 == 0

    u, f = _mk(n, seed=31)
    uo, dw, err = p3k.fused_descend3_padded(
        p3k.pad_grid3(u), p3k.pad_grid3(f), n, h, 2, omega=OMEGA3,
        restriction=mode, interpret=True)
    fc = pd3.restrict3_lanes_p(dw, n, m)
    want_u, want_fc, want_err = _descend_oracle(u, f, h, 2, mode)
    assert float(jnp.abs(p3k.unpad_grid3(uo, n) - want_u).max()) < 1e-5
    scale = float(jnp.abs(want_fc).max()) + 1e-30
    assert float(jnp.abs(fc - want_fc).max()) < 2e-6 * scale
    assert abs(float(err[0, 0]) - float(want_err)) < 1e-5 * float(want_err)


# ---------------------------------------------------------------------------
# fused ascend leg
# ---------------------------------------------------------------------------

def _ascend_oracle(u, f, c, h, steps):
    n = u.shape[0]
    e = p3.prolong3(c, n)
    mask = jnp.zeros((n,) * 3, bool).at[1:-1, 1:-1, 1:-1].set(True)
    u = u + jnp.where(mask, e, jnp.zeros_like(e))
    return _sweeps(u, f, h, steps)


@pytest.mark.parametrize("steps", [1, 2, 3])
def test_fused_ascend3_matches_oracle(steps):
    n, h = 33, 1.0 / 32
    m = (n + 1) // 2
    u, f = _mk(n, seed=40 + steps)
    rng = np.random.default_rng(50 + steps)
    c = np.zeros((m,) * 3, np.float32)
    c[1:-1, 1:-1, 1:-1] = rng.standard_normal((m - 2,) * 3).astype(np.float32)
    c = jnp.asarray(c)
    cpad = jnp.pad(c, [(0, s - m) for s in p3k.padded_shape3(m)])
    cw = pd3.prolong3_lanes_p(cpad, n, m)
    got = p3k.unpad_grid3(
        p3k.fused_ascend3_padded(p3k.pad_grid3(u), p3k.pad_grid3(f), cw,
                                 n, h, steps, omega=OMEGA3, interpret=True),
        n)
    want = _ascend_oracle(u, f, c, h, steps)
    assert float(jnp.abs(got - want).max()) < 1e-5


def test_fused_ascend3_multi_brick(monkeypatch):
    monkeypatch.setattr(p3k, "_VMEM_BUDGET_3D_LEGS_BYTES", 1_500_000)
    n, h = 65, 1.0 / 64
    m = (n + 1) // 2
    nz, rp, cp = p3k.padded_shape3(n)
    zs, rs, oz, orow = p3k._brick_geometry(nz, rp, cp, 4, z_halo=2,
                                           num_bufs=6.6, orow_mult=16,
                                           r_halo=16, zs_even=True,
                                           budget=p3k._VMEM_BUDGET_3D_LEGS_BYTES)
    assert zs < nz and rs < rp and zs % 2 == 0 and orow % 16 == 0

    u, f = _mk(n, seed=61)
    rng = np.random.default_rng(62)
    c = np.zeros((m,) * 3, np.float32)
    c[1:-1, 1:-1, 1:-1] = rng.standard_normal((m - 2,) * 3).astype(np.float32)
    c = jnp.asarray(c)
    cpad = jnp.pad(c, [(0, s - m) for s in p3k.padded_shape3(m)])
    cw = pd3.prolong3_lanes_p(cpad, n, m)
    got = p3k.unpad_grid3(
        p3k.fused_ascend3_padded(p3k.pad_grid3(u), p3k.pad_grid3(f), cw,
                                 n, h, 2, omega=OMEGA3, interpret=True), n)
    want = _ascend_oracle(u, f, c, h, 2)
    assert float(jnp.abs(got - want).max()) < 1e-5


@pytest.mark.parametrize("mode", ["clean", "gpu"])
def test_fused_err_multi_brick_ownership(monkeypatch, mode):
    """The err reduction's exact-ownership masks across MULTIPLE (z, row)
    bricks: at CI sizes the default budget yields one brick, so force a
    tiny budget and check the partials still match the oracle (an
    off-by-one in the owned windows would drop/double-count cells only in
    the multi-brick regime — silent on CI, wrong at 513³ on hardware)."""
    monkeypatch.setattr(p3k, "_VMEM_BUDGET_3D_BYTES", 1536 * 1024)
    n, steps = 65, 3
    h = 1.0 / (n - 1)
    nz, rp, cp = p3k.padded_shape3(n)
    zs, rs, oz, orow = p3k._brick_geometry(nz, rp, cp, 4,
                                           z_halo=steps + 1, num_bufs=6.0)
    assert zs < nz and rs < rp, "budget did not force multi-brick"

    prob = p3.REFERENCE_PROBLEM_3D
    f = (prob.source_grid(n) + prob.boundary_grid(n)).astype(jnp.float32)
    u = (prob.boundary_grid(n) + 0.01 * f).astype(jnp.float32)
    up, fp = p3k.pad_grid3(u), p3k.pad_grid3(f)

    got_u, raw = p3k.fused_jacobi3_padded(up, fp, n, h, steps, omega=6 / 7,
                                          interpret=True, err_mode=mode)
    want_u, want_err = p3.smooth3(u, f, h, steps=steps, omega=6 / 7,
                                  compat=mode if mode == "gpu" else "clean")
    np.testing.assert_allclose(np.asarray(p3k.unpad_grid3(got_u, n)),
                               np.asarray(want_u), rtol=0, atol=5e-6)
    # tolerance: f32 partials accumulate in a different order across bricks
    # (~sqrt(N)·eps reassociation); a dropped/doubled plane or row would be
    # a ~1e-2-relative error, decades above this bound
    assert float(raw) / n ** 3 == pytest.approx(float(want_err), rel=5e-5)

    # per-sweep variant across the same multi-brick geometry
    got_u2, errs = p3k.fused_jacobi3_errs_padded(up, fp, n, h, steps,
                                                 omega=6 / 7, compat=mode,
                                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(got_u2), np.asarray(
        p3k.fused_jacobi3_padded(up, fp, n, h, steps, omega=6 / 7,
                                 interpret=True)))
    v = up
    for s in range(steps):
        v, rw = p3k.fused_jacobi3_padded(v, fp, n, h, 1, omega=6 / 7,
                                         interpret=True, err_mode=mode)
        assert float(errs[s]) == pytest.approx(float(rw) / n ** 3,
                                               rel=5e-5), s


@pytest.mark.parametrize("mode", ["full_weighting", "sampling"])
def test_fused_descend3_from_zero_multi_brick(monkeypatch, mode):
    """Regression: the from_zero closed-form sweep must write u₁ at brick
    CUT planes/rows too (it is neighbor-free, exact there); freezing cuts
    at u₀ = 0 is one ring staler and put the restricted coarse RHS off by
    ~1e-2 rel at multi-z-brick geometries (single-brick CI never saw it)."""
    monkeypatch.setattr(p3k, "_VMEM_BUDGET_3D_LEGS_BYTES", 1_600_000)
    n, h = 33, 1.0 / 32
    m = (n + 1) // 2
    nz, rp, cp = p3k.padded_shape3(n)
    zs, _, _, _ = p3k._brick_geometry(nz, rp, cp, 4, z_halo=4,
                                      num_bufs=6.6, orow_mult=16,
                                      oz_even=True,
                                      budget=p3k._VMEM_BUDGET_3D_LEGS_BYTES)
    assert zs < nz, "budget did not force multiple z bricks"

    _, f = _mk(n, seed=33)
    uo, dw, err = p3k.fused_descend3_padded(
        jnp.zeros(p3k.padded_shape3(n), f.dtype), p3k.pad_grid3(f), n, h, 3,
        omega=OMEGA3, from_zero=True, restriction=mode, interpret=True)
    fc = pd3.restrict3_lanes_p(dw, n, m)
    want_u, want_fc, want_err = _descend_oracle(
        jnp.zeros((n,) * 3, f.dtype), f, h, 3, mode, from_zero=True)
    assert float(jnp.abs(p3k.unpad_grid3(uo, n) - want_u).max()) < 1e-5
    scale = float(jnp.abs(want_fc).max()) + 1e-30
    assert float(jnp.abs(fc - want_fc).max()) < 2e-6 * scale
    assert abs(float(err[0, 0]) - float(want_err)) < 1e-5 * float(want_err)


@pytest.mark.parametrize("err_mode", [None, "clean"])
def test_fused_jacobi3_residual_multi_brick(monkeypatch, err_mode):
    """Single-device multi-brick coverage for fused_jacobi3_residual_padded
    (the sharded tests only exercise ext_z > 0, err_mode=None)."""
    monkeypatch.setattr(p3k, "_VMEM_BUDGET_3D_BYTES", 1536 * 1024)
    n, steps = 65, 3
    h = 1.0 / (n - 1)
    u, f = _mk(n, seed=40)
    up, fp = p3k.pad_grid3(u), p3k.pad_grid3(f)
    want_u = p3k.fused_jacobi3_padded(up, fp, n, h, steps, omega=OMEGA3,
                                      interpret=True)
    want_r = p3k.residual3_pallas(want_u, fp, n, h, negate=True,
                                  interpret=True)
    out = p3k.fused_jacobi3_residual_padded(up, fp, n, h, steps,
                                            omega=OMEGA3, negate=True,
                                            interpret=True,
                                            err_mode=err_mode)
    got_u, got_r = out[0], out[1]
    np.testing.assert_array_equal(np.asarray(got_u), np.asarray(want_u))
    scale = float(jnp.abs(want_r).max())
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               rtol=0, atol=5e-7 * scale)
    if err_mode == "clean":
        from multigrid_poisson_solver_tpu.models.poisson3d import (
            smoothing_error3)
        want_e = float(smoothing_error3(p3k.unpad_grid3(want_u, n), f, h))
        assert float(out[2]) / n ** 3 == pytest.approx(want_e, rel=5e-5)

    # from_zero variant through the same multi-brick geometry
    z = jnp.zeros_like(up)
    wz_u = p3k.fused_jacobi3_padded(z, fp, n, h, steps, from_zero=True,
                                    omega=OMEGA3, interpret=True)
    wz_r = p3k.residual3_pallas(wz_u, fp, n, h, negate=True, interpret=True)
    gz = p3k.fused_jacobi3_residual_padded(z, fp, n, h, steps, omega=OMEGA3,
                                           from_zero=True, negate=True,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(gz[0]), np.asarray(wz_u))
    scale = float(jnp.abs(wz_r).max())
    np.testing.assert_allclose(np.asarray(gz[1]), np.asarray(wz_r),
                               rtol=0, atol=5e-7 * scale)


@pytest.mark.parametrize("compat", ["clean", "gpu"])
def test_trigger3_vmem_bitmatches_per_pass_loop(compat):
    """fused_trigger3_vmem: the whole 3-D |Δerr| > trigger loop in one
    kernel — iterates BIT-match the per-pass fused trigger loop, same stop
    point."""
    n, h = 33, 1.0 / 32
    rng = np.random.default_rng(3)
    u = p3k.pad_grid3(jnp.asarray(rng.random((n, n, n)), jnp.float32))
    f = p3k.pad_grid3(jnp.asarray(rng.random((n, n, n)), jnp.float32))
    gu, ge = p3k.fused_trigger3_vmem(u, f, n, h, 0.02, 6 / 7, compat, 500,
                                     interpret=True)
    v, raw = p3k.fused_jacobi3_padded(u, f, n, h, 1, omega=6 / 7,
                                      err_mode=compat, interpret=True)
    err = float(raw) / n ** 3
    prev, k, slope = err, 1, 1e9
    while slope > 0.02 and k < 500:
        v, raw = p3k.fused_jacobi3_padded(v, f, n, h, 1, omega=6 / 7,
                                          err_mode=compat, interpret=True)
        err = float(raw) / n ** 3
        slope = abs(err - prev)
        prev = err
        k += 1
    np.testing.assert_array_equal(np.asarray(gu), np.asarray(v))
    assert float(ge) == pytest.approx(err, rel=1e-5)


def test_compiled3_trigger_routes_through_vmem_kernel():
    """compiled3 trigger levels that fit VMEM use the in-kernel loop and
    match the per-pass engine."""
    import unittest.mock as mock

    import multigrid_poisson_solver_tpu as mg
    from multigrid_poisson_solver_tpu.compiled3 import compile_program3
    from multigrid_poisson_solver_tpu.models import poisson3d as p3

    program = mg.v_cycle(33, n_min=8, steps=-1, coarse_option=0)
    cfg = mg.SolverConfig(omega=6 / 7, kernels="pallas",
                          collect_node_stats=False)
    cc = compile_program3(program, p3.REFERENCE_PROBLEM_3D, cfg,
                          donate=False)
    u, f = cc.init()
    u1, _ = cc(u, f)
    with mock.patch.object(p3k, "trigger3_fits", lambda *a, **k: False), \
            mock.patch.object(p3k, "trigger3_stream_fits",
                              lambda *a, **k: False):
        # disable BOTH whole-loop kernels so the reference run really is
        # the per-pass path (round 4 added the streamed tier)
        cc2 = compile_program3(program, p3.REFERENCE_PROBLEM_3D, cfg,
                               donate=False)
        u2, _ = cc2(u, f)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))


def _per_pass_trigger3(u, f, n, h, trig, omega, compat, cap):
    prev = None
    k = 0
    while True:
        u, raw = p3k.fused_jacobi3_padded(u, f, n, h, 1, omega=omega,
                                         interpret=True, err_mode=compat)
        err = float(raw) / n ** 3
        k += 1
        if prev is not None and abs(err - prev) <= trig:
            break
        if k >= cap:
            break
        prev = err
    return u, err, k


@pytest.mark.parametrize("compat", ["clean", "gpu"])
def test_trigger3_stream_matches_per_pass(compat):
    """The u-resident / f-streamed 3-D trigger (the 257³ class) replays the
    per-pass loop: same sweep counts, iterate to fp32-contraction tolerance
    (CPU-interpret XLA makes chunk-dependent FMA choices; hardware pins
    bit-identity — examples/exp_trigger3_stream_tpu.py)."""
    n = 33
    nz, rp, cp = p3k.padded_shape3(n)
    rng = np.random.default_rng(4)
    u = jnp.zeros((nz, rp, cp), jnp.float32).at[:n, :n, :n].set(
        jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32))
    f = jnp.zeros((nz, rp, cp), jnp.float32).at[:n, :n, :n].set(
        jnp.asarray(10 * rng.standard_normal((n, n, n)), jnp.float32))
    h = 1.0 / (n - 1)
    assert p3k.trigger3_stream_fits(n)
    got, err = p3k.fused_trigger3_stream(u, f, n, h, 5.0, 6 / 7, compat, 60,
                                        interpret=True)
    want, werr, k = _per_pass_trigger3(u, f, n, h, 5.0, 6 / 7, compat, 60)
    assert k < 60
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)
    assert abs(float(err) - werr) <= 1e-5 * abs(werr)


def test_compiled3_trigger_routes_through_stream_kernel(monkeypatch):
    """compiled3 picks the streamed kernel for trigger levels past the
    in-VMEM bound and matches the per-pass fallback engine."""
    import jax as _jax

    import multigrid_poisson_solver_tpu as mg
    from multigrid_poisson_solver_tpu import compiled3 as C3

    # the padded fast path (and with it the whole-loop trigger kernels)
    # engages at n >= 65; cap the sweeps so the CPU-interpret loop is cheap
    program = mg.v_cycle(65, n_min=8, steps=-1, coarse_option=0, coarsen=3)
    cfg = mg.SolverConfig(omega=6 / 7, kernels="pallas",
                          collect_node_stats=False, max_trigger_sweeps=20)

    def run():
        cc = C3.compile_program3(program, p3.REFERENCE_PROBLEM_3D, cfg,
                                 donate=False)
        u, f = cc.init()
        u, err = cc(u, f)
        return np.asarray(u), float(err)

    base_u, base_err = run()           # in-VMEM kernel path (33 fits)
    monkeypatch.setattr(p3k, "trigger3_fits", lambda n, **kw: False)
    calls = []
    orig = p3k.fused_trigger3_stream

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(p3k, "fused_trigger3_stream", spy)
    _jax.clear_caches()
    got_u, got_err = run()
    assert calls, "3-D stream kernel was not routed"
    np.testing.assert_allclose(got_u, base_u, rtol=0, atol=1e-6)
    assert abs(got_err - base_err) <= 1e-3 * abs(base_err) + 1e-12
