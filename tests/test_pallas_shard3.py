"""Sharded 3-D Pallas: the fused brick kernels under a z-plane decomposition
must match the unsharded kernels on owned planes (8-device virtual CPU mesh,
interpret mode — the same harness that validates the 2-D pallas_shard)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_poisson_solver_tpu.models import poisson3d as p3
from multigrid_poisson_solver_tpu.ops import pallas3d as pk3
from multigrid_poisson_solver_tpu.parallel import pallas_shard3 as ps3

NDEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == NDEV
    return ps3.make_mesh_z(jax.devices())


def _volumes(n):
    prob = p3.REFERENCE_PROBLEM_3D
    f = prob.source_grid(n) + prob.boundary_grid(n)
    u = prob.boundary_grid(n) + 0.01 * f            # non-trivial interior
    return (pk3.pad_grid3(u.astype(jnp.float32)),
            pk3.pad_grid3(f.astype(jnp.float32)))


def _to_sharded(a, mesh):
    return jax.device_put(ps3.pad_planes3(a, NDEV), ps3.z_sharding(mesh))


@pytest.mark.parametrize("n,steps", [(33, 3), (33, 8), (65, 5)])
def test_sharded_jacobi3_matches_unsharded(mesh, n, steps):
    h = 1.0 / (n - 1)
    up, fp = _volumes(n)
    want = pk3.fused_jacobi3_padded(up, fp, n, h, steps, interpret=True)

    us, fs = _to_sharded(up, mesh), _to_sharded(fp, mesh)
    with mesh:
        got = ps3.sharded_fused_jacobi3(us, fs, n, h, steps, 6.0 / 7.0,
                                        mesh, interpret=True)
    assert got.shape == ps3.sharded_shape3(n, NDEV)
    np.testing.assert_array_equal(np.asarray(got)[:n], np.asarray(want))
    # padded planes stay zero
    assert not np.asarray(got)[n:].any()


def test_sharded_jacobi3_multi_pass(mesh):
    """steps > 8 splits into multiple fused passes with fresh halo
    exchanges; must still match the unsharded multi-pass result."""
    n, steps = 33, 11
    h = 1.0 / (n - 1)
    up, fp = _volumes(n)
    want = pk3.fused_jacobi3_padded(up, fp, n, h, 8, interpret=True)
    want = pk3.fused_jacobi3_padded(want, fp, n, h, 3, interpret=True)

    us, fs = _to_sharded(up, mesh), _to_sharded(fp, mesh)
    with mesh:
        got = ps3.sharded_fused_jacobi3(us, fs, n, h, steps, 6.0 / 7.0,
                                        mesh, interpret=True)
    np.testing.assert_array_equal(np.asarray(got)[:n], np.asarray(want))


def test_sharded_jacobi3_from_zero(mesh):
    n, steps = 33, 4
    h = 1.0 / (n - 1)
    _, fp = _volumes(n)
    z = jnp.zeros_like(fp)
    want = pk3.fused_jacobi3_padded(z, fp, n, h, steps, from_zero=True,
                                    interpret=True)
    zs, fs = _to_sharded(z, mesh), _to_sharded(fp, mesh)
    with mesh:
        got = ps3.sharded_fused_jacobi3(zs, fs, n, h, steps, 6.0 / 7.0,
                                        mesh, from_zero=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got)[:n], np.asarray(want))


@pytest.mark.parametrize("negate", [False, True])
def test_sharded_residual3_matches_unsharded(mesh, negate):
    n = 33
    h = 1.0 / (n - 1)
    up, fp = _volumes(n)
    want = pk3.residual3_pallas(up, fp, n, h, negate=negate, interpret=True)
    us, fs = _to_sharded(up, mesh), _to_sharded(fp, mesh)
    with mesh:
        got = ps3.sharded_residual3_pallas(us, fs, n, h, mesh, negate=negate,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(got)[:n], np.asarray(want))
    assert not np.asarray(got)[n:].any()


def test_sharded_jacobi3_vs_oracle(mesh):
    """End-to-end sanity straight against the plain-jnp oracle sweeps."""
    n, steps = 33, 6
    h = 1.0 / (n - 1)
    prob = p3.REFERENCE_PROBLEM_3D
    f = (prob.source_grid(n) + prob.boundary_grid(n)).astype(jnp.float32)
    u = prob.boundary_grid(n).astype(jnp.float32)
    want = u
    for _ in range(steps):
        want = p3.jacobi_sweep3(want, f, h, 6.0 / 7.0)

    us = _to_sharded(pk3.pad_grid3(u), mesh)
    fs = _to_sharded(pk3.pad_grid3(f), mesh)
    with mesh:
        got = ps3.sharded_fused_jacobi3(us, fs, n, h, steps, 6.0 / 7.0,
                                        mesh, interpret=True)
    np.testing.assert_allclose(np.asarray(got)[:n, :n, :n],
                               np.asarray(want), rtol=0, atol=5e-6)


@pytest.mark.parametrize("n", [65, 129])
def test_v_cycle3_sharded_matches_single_device(mesh, n):
    """The fully-sharded cycle (per-shard kernels + GSPMD einsum transfers +
    replicated coarse sub-cycle) matches the single-device padded-resident
    cycle. At n=129 on 8 devices the 129- and 65-levels run sharded."""
    h = 1.0 / (n - 1)
    prob = p3.REFERENCE_PROBLEM_3D
    f = (prob.source_grid(n) + prob.boundary_grid(n)).astype(jnp.float32)
    u = prob.boundary_grid(n).astype(jnp.float32)

    want = p3.v_cycle3(u, f, h, pre=3, post=3, kernels="pallas")
    with mesh:
        got = ps3.v_cycle3_sharded(u, f, n, h, mesh, interpret=True)
    # not bit-compared: the transfer einsums contract z over different
    # padded depths (and GSPMD fuses differently). The cycle's intermediates
    # are residual-scaled (~4u/h² ≈ 1e4·u), so ulp-class reassociation there
    # surfaces as ~1e-5 absolute on the O(1) iterate — ~1e-9 relative to the
    # quantities actually computed.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0,
                               atol=1e-4 * float(jnp.abs(want).max()))


def test_v_cycle3_sharded_converges(mesh):
    """Chained sharded cycles reach the discretization floor."""
    n = 65
    h = 1.0 / (n - 1)
    prob = p3.REFERENCE_PROBLEM_3D
    f = (prob.source_grid(n) + prob.boundary_grid(n)).astype(jnp.float32)
    u = prob.boundary_grid(n).astype(jnp.float32)

    @jax.jit
    def iterate(u, f):
        return jax.lax.fori_loop(
            0, 8, lambda i, v: ps3.v_cycle3_sharded(v, f, n, h, mesh,
                                                    interpret=True), u)

    with mesh:
        got = iterate(u, f)
    err = float(jnp.mean(jnp.abs(got - prob.analytic_grid(n))))
    assert err < 2e-3          # C·h² at n=65


def test_v_cycle3_sharded_unsharded_top(mesh):
    """A grid too small to shard still runs (regression: the replicated
    fallback used to receive the device-padded depth and trip
    v_cycle3_p's exact-shape assert)."""
    n = 33
    h = 1.0 / (n - 1)
    prob = p3.REFERENCE_PROBLEM_3D
    f = (prob.source_grid(n) + prob.boundary_grid(n)).astype(jnp.float32)
    u = prob.boundary_grid(n).astype(jnp.float32)
    want = p3.v_cycle3(u, f, h, pre=3, post=3, kernels="pallas")
    with mesh:
        got = ps3.v_cycle3_sharded(u, f, n, h, mesh, interpret=True)
    # replicated-under-GSPMD compilation reassociates like the sharded one
    # (see test_v_cycle3_sharded_matches_single_device's tolerance note)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0,
                               atol=1e-4 * float(jnp.abs(want).max()))


def test_sharded_smooth_residual3_matches_pair(mesh):
    """The fused per-shard smooth+residual equals the two-kernel pair on
    owned planes (u bit-exact; r to the Δ-identity's fp32 reassociation)."""
    n, steps = 33, 3
    h = 1.0 / (n - 1)
    up, fp = _volumes(n)
    us, fs = _to_sharded(up, mesh), _to_sharded(fp, mesh)
    with mesh:
        want_u = ps3.sharded_fused_jacobi3(us, fs, n, h, steps, 6.0 / 7.0,
                                           mesh, interpret=True)
        want_r = ps3.sharded_residual3_pallas(want_u, fs, n, h, mesh,
                                              negate=True, interpret=True)
        got_u, got_r = ps3.sharded_smooth_residual3(
            us, fs, n, h, steps, 6.0 / 7.0, mesh, negate=True,
            interpret=True)
    np.testing.assert_array_equal(np.asarray(got_u), np.asarray(want_u))
    scale = float(jnp.abs(want_r).max())
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               rtol=0, atol=3e-7 * scale)


@pytest.mark.parametrize("from_zero", [False, True])
def test_sharded_fused_descend3_matches_unsharded(mesh, from_zero):
    """The per-shard descend leg (sweeps + residual + z/row restriction in
    one kernel) matches the single-device leg: u bit-exact on owned planes,
    restricted coarse RHS to fp32 tolerance."""
    from multigrid_poisson_solver_tpu.ops import padded3 as pd3

    n, steps = 65, 3
    m = (n + 1) // 2
    h = 1.0 / (n - 1)
    up, fp = _volumes(n)
    if from_zero:
        up = jnp.zeros_like(up)
    want_u, want_dw, want_err = pk3.fused_descend3_padded(
        up, fp, n, h, steps, from_zero=from_zero, interpret=True)
    want_fc = pd3.restrict3_lanes_p(want_dw, n, m)

    # 2*NDEV padding: even planes per device (the leg's parity contract)
    us = jax.device_put(ps3.pad_planes3(up, 2 * NDEV), ps3.z_sharding(mesh))
    fs = jax.device_put(ps3.pad_planes3(fp, 2 * NDEV), ps3.z_sharding(mesh))
    with mesh:
        got_u, got_dw, got_err = ps3.sharded_fused_descend3(
            us, fs, n, h, steps, 6.0 / 7.0, mesh, from_zero=from_zero,
            interpret=True)
        got_fc = pd3.restrict3_lanes_p(got_dw, n, m)
    np.testing.assert_array_equal(np.asarray(got_u)[:n], np.asarray(want_u))
    assert not np.asarray(got_u)[n:].any()
    scale = float(jnp.abs(want_fc).max()) + 1e-30
    np.testing.assert_allclose(np.asarray(got_fc)[:m], np.asarray(want_fc),
                               rtol=0, atol=3e-6 * scale)
    assert not np.asarray(got_fc)[m:].any()
    assert float(got_err) == pytest.approx(float(want_err[0, 0]), rel=5e-5)


def test_sharded_fused_ascend3_matches_unsharded(mesh):
    """The per-shard ascend leg (prolong + add + post-sweeps in one kernel)
    matches the single-device leg on owned planes."""
    from multigrid_poisson_solver_tpu.ops import padded3 as pd3

    n, steps = 65, 3
    m = (n + 1) // 2
    h = 1.0 / (n - 1)
    up, fp = _volumes(n)
    ec = pk3.pad_grid3((0.1 * p3.REFERENCE_PROBLEM_3D.source_grid(m)
                        ).astype(jnp.float32))
    cw1 = pd3.prolong3_lanes_p(ec, n, m)
    want = pk3.fused_ascend3_padded(up, fp, cw1, n, h, steps, interpret=True)

    us = jax.device_put(ps3.pad_planes3(up, 2 * NDEV), ps3.z_sharding(mesh))
    fs = jax.device_put(ps3.pad_planes3(fp, 2 * NDEV), ps3.z_sharding(mesh))
    nzp = us.shape[0]
    # coarse level at exactly half the fine depth (the leg's contract)
    ecs = jax.device_put(
        jnp.concatenate([ec, jnp.zeros((nzp // 2 - ec.shape[0],)
                                       + ec.shape[1:], ec.dtype)], 0),
        ps3.z_sharding(mesh))
    with mesh:
        cws = ps3.z_sharding(mesh)
        cw = jax.device_put(pd3.prolong3_lanes_p(ecs, n, m), cws)
        got = ps3.sharded_fused_ascend3(us, fs, cw, n, h, steps, 6.0 / 7.0,
                                        mesh, interpret=True)
    np.testing.assert_array_equal(np.asarray(got)[:n], np.asarray(want))
    assert not np.asarray(got)[n:].any()


@pytest.mark.parametrize("steps", [2, 3])
def test_sharded_legs_multi_brick_clipped(monkeypatch, mesh, steps):
    """Force multiple z-bricks PER SHARD with oz ∤ planes-per-shard: the
    clipped final brick's load window must still cover the halo below its
    write start (regression: with ext_z > z_halo — odd-steps ascend — the
    naive load start left the first owned plane one sweep stale)."""
    from multigrid_poisson_solver_tpu.ops import padded3 as pd3

    monkeypatch.setattr(pk3, "_VMEM_BUDGET_3D_LEGS_BYTES", 2_000_000)
    n = 65
    m = (n + 1) // 2
    h = 1.0 / (n - 1)
    up, fp = _volumes(n)
    ec = pk3.pad_grid3((0.1 * p3.REFERENCE_PROBLEM_3D.source_grid(m)
                        ).astype(jnp.float32))
    cw1 = pd3.prolong3_lanes_p(ec, n, m)
    want_a = pk3.fused_ascend3_padded(up, fp, cw1, n, h, steps,
                                      interpret=True)
    want_u, want_dw, _ = pk3.fused_descend3_padded(up, fp, n, h, steps,
                                                   interpret=True)
    want_fc = pd3.restrict3_lanes_p(want_dw, n, m)

    us = jax.device_put(ps3.pad_planes3(up, 2 * NDEV), ps3.z_sharding(mesh))
    fs = jax.device_put(ps3.pad_planes3(fp, 2 * NDEV), ps3.z_sharding(mesh))
    nzp = us.shape[0]
    ecs = jax.device_put(
        jnp.concatenate([ec, jnp.zeros((nzp // 2 - ec.shape[0],)
                                       + ec.shape[1:], ec.dtype)], 0),
        ps3.z_sharding(mesh))
    with mesh:
        cw = jax.device_put(pd3.prolong3_lanes_p(ecs, n, m),
                            ps3.z_sharding(mesh))
        got_a = ps3.sharded_fused_ascend3(us, fs, cw, n, h, steps, 6.0 / 7.0,
                                          mesh, interpret=True)
        got_u, got_dw, _ = ps3.sharded_fused_descend3(
            us, fs, n, h, steps, 6.0 / 7.0, mesh, interpret=True)
        got_fc = pd3.restrict3_lanes_p(got_dw, n, m)
    np.testing.assert_array_equal(np.asarray(got_a)[:n], np.asarray(want_a))
    np.testing.assert_array_equal(np.asarray(got_u)[:n], np.asarray(want_u))
    scale = float(jnp.abs(want_fc).max()) + 1e-30
    np.testing.assert_allclose(np.asarray(got_fc)[:m], np.asarray(want_fc),
                               rtol=0, atol=3e-6 * scale)


def test_v_cycle3_sharded_rdma_halo_matches():
    """halo='rdma' on the models-level sharded cycle (fused legs +
    post-smoothing through the remote-DMA kernels) bit-matches the
    ppermute default — the harness bench_scaling's dim-3 mode will drive
    on a real ring."""
    import numpy as np

    n = 65
    h = 1.0 / (n - 1)
    prob = p3.REFERENCE_PROBLEM_3D
    f = (prob.source_grid(n) + prob.boundary_grid(n)).astype(jnp.float32)
    u = prob.boundary_grid(n).astype(jnp.float32)
    mesh = ps3.make_mesh_z(jax.devices()[:4])
    with mesh:
        want = ps3.v_cycle3_sharded(u, f, n, h, mesh, threshold_planes=8,
                                    interpret=True)
        got = ps3.v_cycle3_sharded(u, f, n, h, mesh, threshold_planes=8,
                                   halo="rdma", interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
