"""Sharded Pallas: the fused kernels under shard_map partitioning.

VERDICT r1's top item: sharded programs must run the fused Pallas smoother
per shard (parallel.pallas_shard) instead of falling back to XLA roll
stencils, under BOTH sharding policies, bit-matching the unsharded kernel.
Runs on the virtual 8-device CPU mesh in Pallas interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding

import multigrid_poisson_solver_tpu as mg
from multigrid_poisson_solver_tpu.compiled import compile_program
from multigrid_poisson_solver_tpu.ops import pallas_kernels as pk
from multigrid_poisson_solver_tpu.parallel.mesh import (
    BlockShardingPolicy,
    ShardingPolicy,
    make_mesh,
    make_mesh_2d,
)
from multigrid_poisson_solver_tpu.parallel.pallas_shard import (
    sharded_fused_jacobi,
    sharded_residual_pallas,
)

PROBLEM = mg.REFERENCE_PROBLEM


def _policies():
    return [
        pytest.param(lambda: ShardingPolicy(make_mesh(), threshold_rows=8),
                     id="rows-1d"),
        pytest.param(lambda: BlockShardingPolicy(make_mesh_2d((2, 4)),
                                                 threshold_rows=8),
                     id="block-2d"),
    ]


def _fields(policy, n, seed=7):
    rng = np.random.default_rng(seed)
    rp, cp = policy.padded_shape(n)
    u = jnp.zeros((rp, cp), jnp.float32).at[:n, :n].set(
        jnp.asarray(rng.random((n, n)), jnp.float32))
    f = jnp.zeros((rp, cp), jnp.float32).at[:n, :n].set(
        jnp.asarray(rng.random((n, n)), jnp.float32))
    sh = NamedSharding(policy.mesh, policy.spec(n))
    return u, f, jax.device_put(u, sh), jax.device_put(f, sh)


@pytest.mark.parametrize("make_policy", _policies())
@pytest.mark.parametrize("steps", [1, 8, 11])
def test_sharded_smoother_bitmatches_unsharded(make_policy, steps):
    """Owned cells of the per-shard fused kernel are BIT-identical to the
    unsharded kernel (same fp32 expression tree per point; halos carry the
    true neighbor values for ≤8 sweeps per exchange)."""
    policy = make_policy()
    n, h = 129, 1.0 / 128
    u, f, us, fs = _fields(policy, n)
    got = sharded_fused_jacobi(us, fs, n, h, steps, 0.8, policy,
                               interpret=True)
    want = pk.fused_jacobi_padded(u, f, n, h, steps, omega=0.8,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("make_policy", _policies())
def test_sharded_smoother_from_zero_bitmatches(make_policy):
    policy = make_policy()
    n, h = 129, 1.0 / 128
    _, f, _, fs = _fields(policy, n)
    z = jnp.zeros_like(f)
    zs = jax.device_put(z, NamedSharding(policy.mesh, policy.spec(n)))
    got = sharded_fused_jacobi(zs, fs, n, h, 3, 1.0, policy, from_zero=True,
                               interpret=True)
    want = pk.fused_jacobi_padded(z, f, n, h, 3, from_zero=True,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("make_policy", _policies())
def test_sharded_residual_bitmatches_unsharded(make_policy):
    policy = make_policy()
    n, h = 129, 1.0 / 128
    u, f, us, fs = _fields(policy, n)
    got = sharded_residual_pallas(us, fs, n, h, policy, negate=True,
                                  interpret=True)
    want = pk.residual_pallas(u, f, n, h, negate=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("make_policy", _policies())
@pytest.mark.parametrize("steps", [3, -1])
def test_compiled_pallas_sharded_matches_xla(make_policy, steps):
    """The compiled engine with kernels='pallas' under a sharding policy
    (fixed-step AND trigger schedules) matches the kernels='xla' sharded
    engine and the unsharded Pallas engine."""
    policy = make_policy()
    program = mg.v_cycle(129, n_min=8, steps=steps, coarse_target=1e-7)

    def run(config, policy):
        cc = compile_program(program, PROBLEM, config, policy=policy,
                             donate=False)
        u, f = cc.init()
        u1, _ = cc(u, f)
        return np.asarray(cc.unpad(u1))

    u_pallas_sharded = run(mg.SolverConfig(kernels="pallas"), policy)
    u_xla_sharded = run(mg.SolverConfig(kernels="xla"), policy)
    u_pallas_single = run(mg.SolverConfig(kernels="pallas"), None)
    np.testing.assert_allclose(u_pallas_sharded, u_xla_sharded,
                               rtol=1e-4, atol=1e-6)
    # vs the single-device Pallas engine the only fp32 differences are XLA
    # op-order in the non-smoother glue; the smoother itself bit-matches
    np.testing.assert_allclose(u_pallas_sharded, u_pallas_single,
                               rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("make_policy", _policies())
@pytest.mark.parametrize("restriction", ["sampling", "full_weighting"])
@pytest.mark.parametrize("from_zero", [False, True])
def test_sharded_fused_descend_matches_single_device(make_policy,
                                                     restriction, from_zero):
    """Sharded fused descend (rows AND 2-D block policies) vs the
    single-device fused descend: identical u and coarse RHS, matching
    fused error."""
    from multigrid_poisson_solver_tpu.ops import layout
    from multigrid_poisson_solver_tpu.ops import padded as P
    from multigrid_poisson_solver_tpu.parallel.pallas_shard import (
        sharded_fused_descend,
    )

    policy = make_policy()
    n, steps = 129, 3
    m = (n + 1) // 2
    h = 1.0 / (n - 1)
    rng = np.random.default_rng(11)
    rp, cp = policy.padded_shape(n)
    u = jnp.zeros((rp, cp), jnp.float32)
    if not from_zero:
        u = u.at[:n, :n].set(jnp.asarray(rng.random((n, n)), jnp.float32))
    f = jnp.zeros((rp, cp), jnp.float32).at[:n, :n].set(
        jnp.asarray(rng.random((n, n)), jnp.float32))
    sh = NamedSharding(policy.mesh, policy.spec(n))
    us, fs = jax.device_put(u, sh), jax.device_put(f, sh)

    gu, gdw, gerr = sharded_fused_descend(
        us, fs, n, h, steps, 0.8, restriction, "cpu", policy,
        from_zero=from_zero, interpret=True)
    gfc = P.restrict_lanes_p(gdw, n, m, layout.padded_shape(m))

    wu, wdw, werr = pk.fused_descend_padded(
        u, f, n, h, steps, omega=0.8, restriction=restriction,
        compat=True, want_err=True, from_zero=from_zero, interpret=True)
    wfc = P.restrict_lanes_p(wdw, n, m, layout.padded_shape(m))

    np.testing.assert_array_equal(np.asarray(gu), np.asarray(wu))
    np.testing.assert_array_equal(np.asarray(gfc), np.asarray(wfc))
    assert float(gerr) == pytest.approx(float(werr), rel=1e-5)


@pytest.mark.parametrize("make_policy", _policies())
def test_sharded_fused_ascend_matches_single_device(make_policy):
    from multigrid_poisson_solver_tpu.ops import layout
    from multigrid_poisson_solver_tpu.ops import padded as P
    from multigrid_poisson_solver_tpu.parallel.pallas_shard import (
        sharded_fused_ascend,
    )

    policy = make_policy()
    n, steps = 129, 3
    m = (n + 1) // 2
    h = 1.0 / (n - 1)
    rng = np.random.default_rng(12)
    rp, cp = policy.padded_shape(n)
    u = jnp.zeros((rp, cp), jnp.float32).at[:n, :n].set(
        jnp.asarray(rng.random((n, n)), jnp.float32))
    f = jnp.zeros((rp, cp), jnp.float32).at[:n, :n].set(
        jnp.asarray(rng.random((n, n)), jnp.float32))
    uc = jnp.zeros(layout.padded_shape(m), jnp.float32).at[1:m-1, 1:m-1].set(
        jnp.asarray(rng.random((m - 2, m - 2)), jnp.float32))

    sh = NamedSharding(policy.mesh, policy.spec(n))
    cw_sharded = jax.device_put(
        P.prolong_lanes_p(uc, m, n, (rp // 2, cp)), sh)
    us, fs = jax.device_put(u, sh), jax.device_put(f, sh)
    gu, gerr = sharded_fused_ascend(us, fs, cw_sharded, n, h, steps, 0.8,
                                    "cpu", policy, interpret=True)

    cw = P.prolong_lanes_p(uc, m, n, (rp // 2 + 8, cp))
    wu, werr = pk.fused_ascend_padded(u, f, cw, n, h, steps, omega=0.8,
                                      compat=True, want_err=True,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(gu), np.asarray(wu))
    assert float(gerr) == pytest.approx(float(werr), rel=1e-5)


@pytest.mark.parametrize("make_policy", _policies())
def test_compiled_pallas_sharded_aligned_uses_fused_legs(make_policy):
    """Engine-level: an aligned (coarsen=3) schedule under BOTH policies
    with kernels='pallas' (which routes descend/ascend through the sharded
    fused kernels) matches the XLA sharded engine."""
    policy = make_policy()
    program = mg.v_cycle(129, n_min=8, steps=3, coarse_option=0, coarsen=3)

    def run(config):
        cc = compile_program(program, PROBLEM, config, policy=policy,
                             donate=False)
        u, f = cc.init()
        u1, err = cc(u, f)
        return np.asarray(cc.unpad(u1)), float(err)

    up, ep = run(mg.SolverConfig(omega=0.8, kernels="pallas"))
    ux, ex = run(mg.SolverConfig(omega=0.8, kernels="xla"))
    np.testing.assert_allclose(up, ux, rtol=1e-4, atol=1e-6)
    assert ep == pytest.approx(ex, rel=1e-3)


def test_compiled_pallas_sharded_converges_deep():
    """End-to-end: refinement with a sharded Pallas cycle reaches 1e-9."""
    policy = ShardingPolicy(make_mesh(), threshold_rows=8)
    rep = mg.solve_to_tolerance(PROBLEM, 129, tol=1e-9, policy=policy,
                                config=mg.SolverConfig(omega=0.8,
                                                       kernels="pallas"))
    assert rep.rel_residual <= 1e-9


@pytest.mark.parametrize("make_policy", _policies())
@pytest.mark.parametrize("compat", [True, False, "gpu"])
def test_sharded_fused_err_matches_padded(make_policy, compat):
    """sharded_fused_jacobi_err: u BIT-matches the unsharded fused-err
    kernel; the psum'd error matches up to fp32 reassociation (VERDICT r2
    weak 4 — sharded programs keep the fused-error fast path)."""
    from multigrid_poisson_solver_tpu.parallel.pallas_shard import (
        sharded_fused_jacobi_err,
    )

    policy = make_policy()
    n, h = 129, 1.0 / 128
    u, f, us, fs = _fields(policy, n)
    for steps in (1, 3, 9):
        gu, ge = sharded_fused_jacobi_err(us, fs, n, h, steps, 0.8, compat,
                                          policy, interpret=True)
        wu, we = pk.fused_jacobi_err_padded(u, f, n, h, steps, omega=0.8,
                                            compat=compat, interpret=True)
        np.testing.assert_array_equal(np.asarray(gu), np.asarray(wu))
        assert float(ge) == pytest.approx(float(we), rel=2e-6)


@pytest.mark.parametrize("make_policy", _policies())
def test_sharded_fused_errs_batch_matches_padded(make_policy):
    """sharded_fused_jacobi_errs (trigger batching): per-iterate error
    vector matches the unsharded batched kernel; u bit-matches."""
    from multigrid_poisson_solver_tpu.parallel.pallas_shard import (
        sharded_fused_jacobi_errs,
    )

    policy = make_policy()
    n, h = 129, 1.0 / 128
    u, f, us, fs = _fields(policy, n, seed=5)
    gu, ges = sharded_fused_jacobi_errs(us, fs, n, h, 4, 0.8, True, policy,
                                        interpret=True)
    wu, wes = pk.fused_jacobi_errs_padded(u, f, n, h, 4, omega=0.8,
                                          compat=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(gu), np.asarray(wu))
    np.testing.assert_allclose(np.asarray(ges), np.asarray(wes), rtol=2e-6)


@pytest.mark.parametrize("make_policy", _policies())
def test_sharded_trigger_no_xla_error_pass(make_policy):
    """A sharded kernels='pallas' trigger program never calls the XLA error
    metrics — the reduction comes from the fused kernel partials (psum'd).
    Functional assertion: poison the XLA metric ops; compile+run must
    succeed and match the single-device fused engine."""
    from multigrid_poisson_solver_tpu.ops import padded as P

    policy = make_policy()
    program = mg.v_cycle(129, n_min=8, steps=-1)
    cfg = mg.SolverConfig(omega=0.8, kernels="pallas",
                          collect_node_stats=False)

    def boom(*a, **k):
        raise AssertionError("XLA error metric called on the sharded "
                             "Pallas trigger path")

    import unittest.mock as mock
    with mock.patch.object(P, "smoothing_error_p", boom), \
         mock.patch.object(P, "gpu_smoothing_error_p", boom):
        cc = compile_program(program, PROBLEM, cfg, policy=policy,
                             donate=False)
        u, f = cc.init()
        u_sharded, _ = cc(u, f)
        u_sharded = np.asarray(cc.unpad(u_sharded))

    cc1 = compile_program(program, PROBLEM, cfg, donate=False)
    u, f = cc1.init()
    u_single, _ = cc1(u, f)
    np.testing.assert_allclose(u_sharded, np.asarray(cc1.unpad(u_single)),
                               rtol=1e-4, atol=1e-6)


def test_sharded_trigger_batch_matches_unbatched():
    """Sharded trigger batching (sharded_fused_jacobi_errs in the compiled
    engine) reaches the same solution quality as the unbatched sharded
    trigger loop."""
    policy = ShardingPolicy(make_mesh(), threshold_rows=8)
    program = mg.v_cycle(129, n_min=8, steps=-1, coarse_option=0)
    results = {}
    for batch in (1, 4):
        cfg = mg.SolverConfig(omega=0.8, kernels="pallas",
                              trigger_batch=batch,
                              collect_node_stats=False)
        eng = compile_program(program, PROBLEM, cfg, policy=policy,
                              donate=False)
        u, f = eng.init()
        u, err = eng(u, f)
        spec = eng.finest_spec
        ana = PROBLEM.analytic_grid(spec, jnp.float32)
        results[batch] = float(jnp.mean(jnp.abs(eng.unpad(u) - ana)))
    assert results[4] == pytest.approx(results[1], rel=0.05)
