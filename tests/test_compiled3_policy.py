"""compiled3 under a z-plane sharding policy: the SAME CycleProgram walk,
multi-chip. Sharded levels run the per-shard brick kernels / fused legs /
trigger loops with psum'd error partials; coarse levels replicate. Outputs
must BIT-match the single-chip compiled3 engine on the 8-device virtual CPU
mesh (the per-shard kernels preserve the unsharded pass chunking, so even
CPU-interpret runs agree exactly; the error metric matches to the fp32
psum-reassociation level).

2-D analog: tests/test_compiled_sharded.py (the compiled engine under
parallel.mesh.ShardingPolicy). Reference: the whole schedule walk,
/root/reference/src/MG_solver_CPU.cpp:148-260 — single device there."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import multigrid_poisson_solver_tpu as mg
from multigrid_poisson_solver_tpu.compiled3 import compile_program3
from multigrid_poisson_solver_tpu.models import poisson3d as p3
from multigrid_poisson_solver_tpu.ops import pallas3d as pk3
from multigrid_poisson_solver_tpu.parallel import pallas_shard3 as ps3
from multigrid_poisson_solver_tpu.solver import SolverConfig

NDEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == NDEV
    return ps3.make_mesh_z(jax.devices())


@pytest.fixture(scope="module")
def policy(mesh):
    return ps3.ZShardingPolicy3(mesh)


def _cfg(**kw):
    kw.setdefault("omega", 6.0 / 7.0)
    kw.setdefault("kernels", "pallas")
    kw.setdefault("collect_node_stats", False)
    return SolverConfig(**kw)


def _agree(mesh, policy, program, cfg, err_rel=1e-4):
    prob = p3.REFERENCE_PROBLEM_3D
    cc1 = compile_program3(program, prob, cfg)
    u0, f0 = cc1.init()
    want, werr = cc1(u0, f0)
    with mesh:
        ccp = compile_program3(program, prob, cfg, policy=policy)
        us, fs = ccp.init()
        got, gerr = ccp(us, fs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert abs(float(gerr) - float(werr)) <= err_rel * max(
        abs(float(werr)), 1e-12)


def test_policy_vcycle_65(mesh, policy):
    _agree(mesh, policy,
           mg.v_cycle(65, n_min=5, steps=3, coarse_target=1e-8, coarsen=3),
           _cfg())


def test_policy_vcycle_129_two_sharded_levels(mesh, policy):
    """129 AND 65 run sharded (fused legs per shard); 33 down replicate."""
    _agree(mesh, policy,
           mg.v_cycle(129, n_min=5, steps=3, coarse_target=1e-8, coarsen=3),
           _cfg())


def test_policy_wcycle(mesh, policy):
    _agree(mesh, policy,
           mg.w_cycle(65, n_min=5, steps=2, coarse_target=1e-8, coarsen=3),
           _cfg())


def test_policy_fmg(mesh, policy):
    _agree(mesh, policy,
           mg.fmg(65, n_min=5, steps=3, coarse_target=1e-8, coarsen=3),
           _cfg())


def test_policy_trigger(mesh, policy):
    """Sharded per-pass trigger loop: one fused per-shard kernel pass
    (sweep + psum'd metric partial) per trigger sweep."""
    _agree(mesh, policy,
           mg.v_cycle(65, n_min=5, steps=-1, coarse_target=1e-8, coarsen=3),
           _cfg(trigger=1e-3, max_trigger_sweeps=30))


def test_policy_gpu_metric(mesh, policy):
    _agree(mesh, policy,
           mg.v_cycle(65, n_min=5, steps=3, coarse_target=1e-8, coarsen=3),
           _cfg(compat_error="gpu"))


def test_policy_xla_kernels(mesh, policy):
    """Without the pallas path the policy degrades to GSPMD constraints on
    the plain-jnp ops — still the same results."""
    _agree(mesh, policy,
           mg.v_cycle(65, n_min=5, steps=3, coarse_target=1e-8, coarsen=3),
           _cfg(kernels="xla"))


def test_policy_chained_converges(mesh, policy):
    """Chained policy cycles reach the discretization floor."""
    n = 65
    prob = p3.REFERENCE_PROBLEM_3D
    program = mg.repeat(
        mg.v_cycle(n, n_min=5, steps=3, coarse_target=1e-8, coarsen=3), 6)
    with mesh:
        ccp = compile_program3(program, prob, _cfg(), policy=policy)
        us, fs = ccp.init()
        got, _ = ccp(us, fs)
    err = float(jnp.mean(jnp.abs(got - prob.analytic_grid(n))))
    assert err < 2e-3          # C·h² at n=65


@pytest.mark.parametrize("n,steps,compat,fz", [
    (33, 3, "clean", False),
    (33, 11, "clean", False),       # multi-pass split
    (33, 5, "gpu", False),
    (33, 4, "clean", True),
    (65, 1, "clean", False),        # the trigger loop's per-sweep shape
])
def test_sharded_fused_jacobi3_err(mesh, n, steps, compat, fz):
    """u BIT-matches the unsharded kernel at the same pass chunking; the
    psum'd error partial matches to fp32 reduction-order tolerance."""
    h = 1.0 / (n - 1)
    prob = p3.REFERENCE_PROBLEM_3D
    f = (prob.source_grid(n) + prob.boundary_grid(n)).astype(jnp.float32)
    u = (prob.boundary_grid(n) + (0 if fz else 0.01 * f)).astype(jnp.float32)
    up, fp = pk3.pad_grid3(u), pk3.pad_grid3(f)
    if fz:
        up = jnp.zeros_like(up)
    # replicate the sharded body's pass split (CPU-interpret bit-identity
    # only holds at equal chunking — the documented FMA-contraction law)
    nz_loc = ps3.padded_depth3(up.shape[0], NDEV) // NDEV
    kmax = min(pk3.MAX_FUSED_SWEEPS_3D, nz_loc)
    last_cap = kmax if compat == "gpu" else min(7, nz_loc - 1)
    last = min(steps, last_cap)
    rem, want, first = steps - last, up, True
    while rem > 0:
        k = min(rem, kmax)
        want = pk3.fused_jacobi3_padded(want, fp, n, h, k,
                                        from_zero=fz and first,
                                        interpret=True)
        rem -= k
        first = False
    want, raw = pk3.fused_jacobi3_padded(want, fp, n, h, last,
                                         from_zero=fz and first,
                                         interpret=True, err_mode=compat)
    us = jax.device_put(ps3.pad_planes3(up, NDEV), ps3.z_sharding(mesh))
    fs = jax.device_put(ps3.pad_planes3(fp, NDEV), ps3.z_sharding(mesh))
    with mesh:
        got, graw = ps3.sharded_fused_jacobi3_err(
            us, fs, n, h, steps, 6.0 / 7.0, compat, mesh, from_zero=fz,
            interpret=True)
    np.testing.assert_array_equal(np.asarray(got)[:n], np.asarray(want))
    assert not np.asarray(got)[n:].any()
    assert float(graw) == pytest.approx(float(raw), rel=5e-6)


def test_sharded_fused_ascend3_err(mesh):
    """The fused-err ascend (last-node error inside the leg kernel) matches
    the unsharded err-fused leg: u bit-exact, psum'd partial to fp32."""
    from multigrid_poisson_solver_tpu.ops import padded3 as pd3

    n, steps = 65, 3
    m = (n + 1) // 2
    h = 1.0 / (n - 1)
    prob = p3.REFERENCE_PROBLEM_3D
    f = (prob.source_grid(n) + prob.boundary_grid(n)).astype(jnp.float32)
    u = (prob.boundary_grid(n) + 0.01 * f).astype(jnp.float32)
    up, fp = pk3.pad_grid3(u), pk3.pad_grid3(f)
    ec = pk3.pad_grid3((0.1 * prob.source_grid(m)).astype(jnp.float32))
    cw1 = pd3.prolong3_lanes_p(ec, n, m)
    want, wraw = pk3.fused_ascend3_padded(up, fp, cw1, n, h, steps,
                                          interpret=True, err_mode="clean")

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
        got, graw = ps3.sharded_fused_ascend3(
            us, fs, cw, n, h, steps, 6.0 / 7.0, mesh, err_mode="clean",
            interpret=True)
    np.testing.assert_array_equal(np.asarray(got)[:n], np.asarray(want))
    assert float(graw) == pytest.approx(float(wraw), rel=5e-6)


@pytest.mark.parametrize("steps,compat", [(3, "clean"), (4, "gpu")])
def test_sharded_fused_jacobi3_errs(mesh, steps, compat):
    """Round 5: the batched-trigger sharded kernel — per-iterate metric
    partials from ONE per-shard pass. u bit-matches the unsharded batched
    kernel (same chunking); the psum'd errs vector to fp32 reassociation."""
    n = 33
    h = 1.0 / (n - 1)
    prob = p3.REFERENCE_PROBLEM_3D
    f = (prob.source_grid(n) + prob.boundary_grid(n)).astype(jnp.float32)
    u = (prob.boundary_grid(n) + 0.01 * f).astype(jnp.float32)
    up, fp = pk3.pad_grid3(u), pk3.pad_grid3(f)
    want, werrs = pk3.fused_jacobi3_errs_padded(up, fp, n, h, steps,
                                                compat=compat,
                                                interpret=True)
    us = jax.device_put(ps3.pad_planes3(up, NDEV), ps3.z_sharding(mesh))
    fs = jax.device_put(ps3.pad_planes3(fp, NDEV), ps3.z_sharding(mesh))
    with mesh:
        got, gerrs = ps3.sharded_fused_jacobi3_errs(
            us, fs, n, h, steps, 6.0 / 7.0, compat, mesh, interpret=True)
    np.testing.assert_array_equal(np.asarray(got)[:n], np.asarray(want))
    assert not np.asarray(got)[n:].any()
    np.testing.assert_allclose(np.asarray(gerrs), np.asarray(werrs),
                               rtol=5e-6)


@pytest.mark.parametrize("batch", [1, 4, "auto"])
def test_sharded_trigger_batch3(mesh, policy, batch, monkeypatch):
    """Engine-level: z-sharded trigger schedule under trigger_batch in
    {1, 4, auto} — same solution quality. The whole-loop tiers are masked
    so "auto" actually reaches its two-phase branch (by default sharded
    auto engages only where the unsharded engine would also batch —
    test_policy_trigger pins that cross-policy exactness)."""
    monkeypatch.setattr(pk3, "trigger3_fits", lambda *a, **k: False)
    monkeypatch.setattr(pk3, "trigger3_stream_fits", lambda *a, **k: False)
    n = 65
    program = mg.v_cycle(n, n_min=5, steps=-1, coarse_target=1e-8,
                         coarsen=3)
    prob = p3.REFERENCE_PROBLEM_3D
    cfg = _cfg(trigger=1e-3, trigger_batch=batch, max_trigger_sweeps=40)
    with mesh:
        cc = compile_program3(program, prob, cfg, policy=policy)
        u, f = cc.init()
        u1, err = cc(u, f)
    q = float(jnp.mean(jnp.abs(u1 - prob.analytic_grid(n))))
    assert q < 2e-3                      # C·h² at n=65
    assert float(err) >= 0.0
