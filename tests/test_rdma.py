"""In-kernel RDMA halo exchange (ops.pallas_rdma / parallel.pallas_shard).

VERDICT r2's top item: the RDMA halo-overlap smoother must be wired and its
validation claims true. These tests run the kernel on the virtual 8-device
CPU mesh under the FULL TPU interpreter (``pltpu.InterpretParams`` with
``detect_races=True`` — remote DMAs and semaphores simulated, data races
detected) and assert BIT-equality against both the ppermute shard path and
the unsharded fused kernel. Hardware validation is separate: the plain
1-device ring (examples/exp_rdma_tpu.py) plus LOOPBACK mode
(examples/exp_rdma_loopback.py — every ring/all-to-all peer mapped to the
one real chip, so the complete remote-DMA/semaphore protocol executes on
hardware; matches the interpreter to the cross-platform FMA tolerance and
re-runs bit-identically).
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
    ShardingPolicy,
    make_mesh,
)
from multigrid_poisson_solver_tpu.parallel.pallas_shard import (
    rdma_fused_jacobi,
    sharded_fused_jacobi,
)

PROBLEM = mg.REFERENCE_PROBLEM


def _policy():
    return ShardingPolicy(make_mesh(), threshold_rows=8)


def _fields(policy, n, seed=7):
    rng = np.random.default_rng(seed)
    rp, cp = policy.padded_shape(n)
    u = jnp.zeros((rp, cp), jnp.float32).at[:n, :n].set(
        jnp.asarray(rng.random((n, n)), jnp.float32))
    f = jnp.zeros((rp, cp), jnp.float32).at[:n, :n].set(
        jnp.asarray(rng.random((n, n)), jnp.float32))
    sh = NamedSharding(policy.mesh, policy.spec(n))
    return u, f, jax.device_put(u, sh), jax.device_put(f, sh)


@pytest.mark.parametrize("steps", [1, 8, 11])
def test_rdma_smoother_bitmatches_unsharded(steps):
    """Owned cells of the RDMA kernel are BIT-identical to the unsharded
    fused kernel: the in-kernel remote halo copy delivers exactly the rows
    the ppermute path concatenates, and the per-strip sweep arithmetic is
    the same fp32 expression tree."""
    policy = _policy()
    n, h = 129, 1.0 / 128
    u, f, us, fs = _fields(policy, n)
    got = rdma_fused_jacobi(us, fs, n, h, steps, 0.8, policy, interpret=True)
    want = pk.fused_jacobi_padded(u, f, n, h, steps, omega=0.8,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("steps", [3, 8])
def test_rdma_matches_ppermute_path(steps):
    policy = _policy()
    n, h = 129, 1.0 / 128
    _, _, us, fs = _fields(policy, n, seed=13)
    got = rdma_fused_jacobi(us, fs, n, h, steps, 1.0, policy, interpret=True)
    want = sharded_fused_jacobi(us, fs, n, h, steps, 1.0, policy,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_rdma_from_zero_bitmatches():
    """from_zero passes skip the u exchange entirely (the closed-form first
    sweep never reads u); result still bit-matches."""
    policy = _policy()
    n, h = 129, 1.0 / 128
    _, f, _, fs = _fields(policy, n)
    z = jnp.zeros_like(f)
    zs = jax.device_put(z, NamedSharding(policy.mesh, policy.spec(n)))
    got = rdma_fused_jacobi(zs, fs, n, h, 3, 1.0, policy, from_zero=True,
                            interpret=True)
    want = pk.fused_jacobi_padded(z, f, n, h, 3, from_zero=True,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_rdma_multi_strip_shards(monkeypatch):
    """Shard blocks that need several strips per device (so the
    interior-first strip schedule actually reorders work and both halo
    splices land in different strips) still bit-match. Exercised by
    shrinking the VMEM budget — big shard blocks under the default budget
    deadlock the *interpreter* (not the kernel): io_callback_impl
    device_puts every callback arg onto cpu:0 and np.array-forces it, while
    cpu:0 itself sits blocked in a semaphore-wait callback of its own shard
    program. Real-TPU lowering has no such cross-device host dependency."""
    monkeypatch.setattr(pk, "_VMEM_BUDGET_BYTES", 96 * 1024)
    jax.clear_caches()
    policy = _policy()
    n, h = 129, 1.0 / 128
    u, f, us, fs = _fields(policy, n, seed=3)
    got = rdma_fused_jacobi(us, fs, n, h, 7, 0.9, policy, interpret=True)
    want = pk.fused_jacobi_padded(u, f, n, h, 7, omega=0.9, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    jax.clear_caches()


def test_rdma_larger_blocks_four_devices():
    """Bigger per-device blocks (48 owned rows, 384 lanes) on a 4-device
    ring — sized to stay clear of the 8-device interpreter deadlock
    described in test_rdma_multi_strip_shards."""
    policy = ShardingPolicy(make_mesh(jax.devices()[:4]), threshold_rows=8)
    n, h = 257, 1.0 / 256
    u, f, us, fs = _fields(policy, n, seed=3)
    got = rdma_fused_jacobi(us, fs, n, h, 8, 0.9, policy, interpret=True)
    want = pk.fused_jacobi_padded(u, f, n, h, 8, omega=0.9, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_compiled_engine_rdma_halo_matches():
    """SolverConfig(halo='rdma') routes sharded sweeps through the RDMA
    kernel; the whole compiled V-cycle matches the ppermute-path engine
    bit-for-bit (owned smoother cells identical; glue ops shared)."""
    policy = _policy()
    program = mg.v_cycle(129, n_min=8, steps=3, coarse_target=1e-7)

    def run(config):
        cc = compile_program(program, PROBLEM, config, policy=policy,
                             donate=False)
        u, f = cc.init()
        u1, _ = cc(u, f)
        return np.asarray(cc.unpad(u1))

    u_rdma = run(mg.SolverConfig(kernels="pallas", halo="rdma"))
    u_ppermute = run(mg.SolverConfig(kernels="pallas"))
    np.testing.assert_array_equal(u_rdma, u_ppermute)


@pytest.mark.parametrize("compat", [True, False, "gpu"])
def test_rdma_trigger_bitmatches_per_pass(compat):
    """The whole-loop RDMA trigger (round 4: per-shard u/fc resident for
    the entire |Δerr| > trigger loop, READY-handshaked remote-DMA halos +
    in-kernel scalar all-to-all per sweep) BIT-matches the per-pass sharded
    trigger loop on the race-detecting interpreter mesh — same sweep
    counts, same iterate, same metric, all three compat modes."""
    from multigrid_poisson_solver_tpu.parallel.pallas_shard import (
        rdma_fused_trigger, sharded_fused_jacobi_err)

    policy = _policy()
    n, h = 129, 1.0 / 128
    rng = np.random.default_rng(11)
    rp, cp = policy.padded_shape(n)
    u = jnp.zeros((rp, cp), jnp.float32).at[:n, :n].set(
        jnp.asarray(rng.random((n, n)), jnp.float32))
    f = jnp.zeros((rp, cp), jnp.float32).at[:n, :n].set(
        jnp.asarray(10 * rng.random((n, n)), jnp.float32))
    sh = NamedSharding(policy.mesh, policy.spec(n))
    us, fs = jax.device_put(u, sh), jax.device_put(f, sh)

    got, err = rdma_fused_trigger(us, fs, n, h, 30.0, 0.8, compat, 50,
                                  policy, interpret=True)

    v, prev, k = us, None, 0
    while True:
        v, e = sharded_fused_jacobi_err(v, fs, n, h, 1, 0.8, compat,
                                        policy, interpret=True)
        k += 1
        if prev is not None and abs(float(e) - prev) <= 30.0:
            break
        if k >= 50:
            break
        prev = float(e)
    assert k < 50
    np.testing.assert_array_equal(np.asarray(got), np.asarray(v))
    assert float(err) == pytest.approx(float(e), rel=1e-6)


def test_compiled_engine_rdma_trigger_routes():
    """SolverConfig(halo='rdma') routes sharded trigger levels through the
    whole-loop RDMA kernel and matches the ppermute per-pass engine."""
    import unittest.mock as mock

    from multigrid_poisson_solver_tpu.parallel import pallas_shard as ps

    policy = _policy()
    program = mg.v_cycle(129, n_min=8, steps=-1, coarse_option=0, coarsen=3)

    def run(halo):
        cfg = mg.SolverConfig(omega=0.8, kernels="pallas", halo=halo,
                              collect_node_stats=False,
                              max_trigger_sweeps=30)
        cc = compile_program(program, PROBLEM, cfg, policy=policy,
                             donate=False)
        u, f = cc.init()
        u1, err = cc(u, f)
        return np.asarray(u1), float(err)

    calls = []
    orig = ps.rdma_fused_trigger

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    with mock.patch.object(ps, "rdma_fused_trigger", spy):
        u_rdma, err_rdma = run("rdma")
    assert calls, "RDMA trigger kernel was not routed"
    u_pp, err_pp = run("ppermute")
    np.testing.assert_allclose(u_rdma, u_pp, rtol=0, atol=1e-6)
    assert err_rdma == pytest.approx(err_pp, rel=1e-4, abs=1e-10)


# ---------------------------------------------------------------------------
# 3-D whole-loop RDMA trigger (ops.pallas_rdma3 / parallel.pallas_shard3)
# ---------------------------------------------------------------------------

def _fields3(n, ndev=4, seed=13):
    # 4-device ring: an 8-device interpreter run deadlocks in
    # _allocate_buffer io_callbacks at kernel entry (the documented
    # interpreter artifact of test_rdma_multi_strip_shards — cpu:0 blocked
    # while every callback device_puts onto it); 4 devices still exercise
    # the ≥3-ring all-to-all per-sender-semaphore scenario with races
    # detected.
    from multigrid_poisson_solver_tpu.ops import pallas3d as pk3
    from multigrid_poisson_solver_tpu.parallel import pallas_shard3 as ps3

    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.random((n, n, n)), jnp.float32)
    f = jnp.asarray(10 * rng.random((n, n, n)), jnp.float32)
    mesh = ps3.make_mesh_z(jax.devices()[:ndev])
    sh = ps3.z_sharding(mesh)
    up = jax.device_put(ps3.pad_planes3(pk3.pad_grid3(u), ndev), sh)
    fp = jax.device_put(ps3.pad_planes3(pk3.pad_grid3(f), ndev), sh)
    return mesh, up, fp


@pytest.mark.parametrize("compat", ["clean", "gpu"])
def test_rdma_trigger3_bitmatches_per_pass(compat):
    """The 3-D whole-loop RDMA trigger (per-shard plane block + folded
    source resident for the entire |Δerr| > trigger loop, one-plane
    remote-DMA halos + per-sender-semaphore scalar all-to-all per sweep)
    BIT-matches the per-pass sharded trigger loop on the race-detecting
    interpreter mesh — same sweep counts, same iterate, same metric."""
    from multigrid_poisson_solver_tpu.parallel import pallas_shard3 as ps3

    n, h = 65, 1.0 / 64
    trig = 30.0
    mesh, up, fp = _fields3(n)

    got, err = ps3.rdma_fused_trigger3(up, fp, n, h, trig, 0.8, compat, 50,
                                       mesh, interpret=True)

    v, prev, k = up, None, 0
    while True:
        v, raw = ps3.sharded_fused_jacobi3_err(v, fp, n, h, 1, 0.8, compat,
                                               mesh, interpret=True)
        e = float(raw) / n ** 3
        k += 1
        if prev is not None and abs(e - prev) <= trig:
            break
        if k >= 50:
            break
        prev = e
    assert k < 50
    np.testing.assert_array_equal(np.asarray(got), np.asarray(v))
    assert float(err) == pytest.approx(e, rel=1e-6)


def test_compiled3_engine_rdma_trigger_routes():
    """SolverConfig(halo='rdma') under a ZShardingPolicy3 routes sharded
    3-D trigger levels through the whole-loop RDMA kernel and matches the
    ppermute per-pass engine."""
    import unittest.mock as mock

    from multigrid_poisson_solver_tpu.compiled3 import compile_program3
    from multigrid_poisson_solver_tpu.models import poisson3d as p3
    from multigrid_poisson_solver_tpu.parallel import pallas_shard3 as ps3

    # 4-device ring (see _fields3's interpreter-deadlock note)
    mesh = ps3.make_mesh_z(jax.devices()[:4])
    policy = ps3.ZShardingPolicy3(mesh)
    # 65 is the smallest level the policy shards; coarser trigger levels
    # run the single-chip tiers
    program = mg.v_cycle(65, n_min=5, steps=-1, coarse_option=0, coarsen=3)

    def run(halo):
        cfg = mg.SolverConfig(omega=6.0 / 7.0, kernels="pallas", halo=halo,
                              collect_node_stats=False,
                              max_trigger_sweeps=30)
        with mesh:
            cc = compile_program3(program, p3.REFERENCE_PROBLEM_3D, cfg,
                                  policy=policy)
            u, f = cc.init()
            u1, err = cc(u, f)
        return np.asarray(u1), float(err)

    calls = []
    orig = ps3.rdma_fused_trigger3

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    with mock.patch.object(ps3, "rdma_fused_trigger3", spy):
        u_rdma, err_rdma = run("rdma")
    assert calls, "3-D RDMA trigger kernel was not routed"
    u_pp, err_pp = run("ppermute")
    np.testing.assert_allclose(u_rdma, u_pp, rtol=0, atol=1e-6)
    assert err_rdma == pytest.approx(err_pp, rel=1e-4, abs=1e-10)


def test_loopback_mode_runs_and_is_deterministic():
    """The kernels' loopback mode (every ring/all-to-all peer = MYSELF —
    the one-chip hardware-validation configuration of
    examples/exp_rdma_loopback.py) keeps working under the interpreter:
    emits the full protocol with a phantom ndev=4 ring on a single device,
    produces finite results, and repeats bit-identically."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    from multigrid_poisson_solver_tpu.ops.pallas_rdma import (
        _rdma_trigger_shard_call)
    from multigrid_poisson_solver_tpu.ops.pallas_rdma3 import (
        _rdma_trigger3_shard_call)

    rng = np.random.default_rng(5)
    rows, cp, n2 = 32, 256, 48
    meta = jnp.asarray([8, 0], jnp.int32)
    u2 = jnp.asarray(rng.random((rows, cp)), jnp.float32)
    f2 = jnp.asarray(rng.random((rows, cp)), jnp.float32)
    mesh2 = Mesh(np.asarray(jax.devices()[:1]), ("rows",))

    def body2(u_loc, f_loc):
        return _rdma_trigger_shard_call(
            meta, u_loc, f_loc, n2, 1.0 / (n2 - 1), 10.0, 0.8, "clean", 6,
            ndev=4, interpret=True, axis_name="rows", loopback=True)

    with mesh2:
        run2 = shard_map(body2, mesh=mesh2, in_specs=(P(), P()),
                         out_specs=(P(), P()), check_vma=False)
        o2a, e2a = run2(u2, f2)
        o2b, e2b = run2(u2, f2)
    assert np.isfinite(np.asarray(o2a)).all() and np.isfinite(float(e2a))
    np.testing.assert_array_equal(np.asarray(o2a), np.asarray(o2b))
    assert float(e2a) == float(e2b)

    nl, rp3, cp3, n3 = 8, 48, 128, 16
    u3 = jnp.asarray(rng.random((nl, rp3, cp3)), jnp.float32)
    f3 = jnp.asarray(rng.random((nl, rp3, cp3)), jnp.float32)
    mesh3 = Mesh(np.asarray(jax.devices()[:1]), ("z",))

    def body3(u_loc, f_loc):
        return _rdma_trigger3_shard_call(
            u_loc, f_loc, n3, 1.0 / (n3 - 1), 10.0, 0.8, "clean", 6,
            ndev=4, interpret=True, axis_name="z", loopback=True)

    with mesh3:
        o3a, e3a = shard_map(body3, mesh=mesh3, in_specs=(P(), P()),
                             out_specs=(P(), P()), check_vma=False)(u3, f3)
    assert np.isfinite(np.asarray(o3a)).all() and np.isfinite(float(e3a))


@pytest.mark.parametrize("steps,compat", [(3, "clean"), (11, "clean"),
                                          (5, "gpu")])
def test_rdma_smoother3_bitmatches_ppermute(steps, compat):
    """Round 5: the 3-D RDMA halo-overlap SMOOTHER (in-kernel remote-DMA
    plane halos, interior bricks smooth while the wires are busy)
    BIT-matches the ppermute-barrier path at the same pass chunking —
    plain, multi-pass, and err-fused forms — on the race-detecting
    interpreter mesh."""
    from multigrid_poisson_solver_tpu.parallel import pallas_shard3 as ps3

    n, h = 65, 1.0 / 64
    mesh, up, fp = _fields3(n)

    want = ps3.sharded_fused_jacobi3(up, fp, n, h, steps, 0.8, mesh,
                                     interpret=True)
    got = ps3.rdma_fused_jacobi3(up, fp, n, h, steps, 0.8, mesh,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    want_e, wraw = ps3.sharded_fused_jacobi3_err(
        up, fp, n, h, steps, 0.8, compat, mesh, interpret=True)
    got_e, graw = ps3.rdma_fused_jacobi3_err(
        up, fp, n, h, steps, 0.8, compat, mesh, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_e), np.asarray(want_e))
    assert float(graw) == pytest.approx(float(wraw), rel=5e-6)


def test_rdma_smoother3_from_zero():
    """from_zero passes skip the u exchange entirely (closed-form first
    sweep) and still bit-match the ppermute path."""
    from multigrid_poisson_solver_tpu.parallel import pallas_shard3 as ps3

    n, h = 65, 1.0 / 64
    mesh, up, fp = _fields3(n)
    want = ps3.sharded_fused_jacobi3(jnp.zeros_like(up), fp, n, h, 3, 0.8,
                                     mesh, from_zero=True, interpret=True)
    got = ps3.rdma_fused_jacobi3(jnp.zeros_like(up), fp, n, h, 3, 0.8,
                                 mesh, from_zero=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_compiled3_engine_rdma_smoother_routes():
    """SolverConfig(halo='rdma') routes sharded 3-D SMOOTHING levels
    through the RDMA-overlap kernel and matches the ppermute engine."""
    import unittest.mock as mock

    from multigrid_poisson_solver_tpu.compiled3 import compile_program3
    from multigrid_poisson_solver_tpu.models import poisson3d as p3
    from multigrid_poisson_solver_tpu.parallel import pallas_shard3 as ps3

    mesh = ps3.make_mesh_z(jax.devices()[:4])
    policy = ps3.ZShardingPolicy3(mesh)
    program = mg.v_cycle(65, n_min=5, steps=3, coarse_target=1e-8,
                         coarsen=3)

    def run(halo):
        # the gpu metric keeps the fused legs out (clean-only), so the
        # sharded levels route through smooth() — the RDMA smoother's slot
        cfg = mg.SolverConfig(omega=6.0 / 7.0, kernels="pallas", halo=halo,
                              compat_error="gpu",
                              collect_node_stats=False)
        with mesh:
            cc = compile_program3(program, p3.REFERENCE_PROBLEM_3D, cfg,
                                  policy=policy)
            u, f = cc.init()
            u1, err = cc(u, f)
        return np.asarray(u1), float(err)

    calls = []
    orig = ps3.rdma_fused_jacobi3_err

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    with mock.patch.object(ps3, "rdma_fused_jacobi3_err", spy):
        u_rdma, err_rdma = run("rdma")
    assert calls, "3-D RDMA smoother kernel was not routed"
    u_pp, err_pp = run("ppermute")
    np.testing.assert_array_equal(u_rdma, u_pp)
    assert err_rdma == pytest.approx(err_pp, rel=1e-5)


@pytest.mark.parametrize("fz", [False, True])
def test_rdma_descend3_bitmatches_ppermute(fz):
    """Round 5: the RDMA descend LEG (sweeps + residual + restriction +
    err with in-kernel plane-halo DMAs) bit-matches the ppermute leg on
    the race-detecting interpreter mesh — u, dwide, and the psum'd err."""
    from multigrid_poisson_solver_tpu.ops import pallas3d as pk3
    from multigrid_poisson_solver_tpu.parallel import pallas_shard3 as ps3

    n, h = 65, 1.0 / 64
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.random((n, n, n)), jnp.float32)
    f = jnp.asarray(10 * rng.random((n, n, n)), jnp.float32)
    mesh = ps3.make_mesh_z(jax.devices()[:4])
    sh = ps3.z_sharding(mesh)
    # the legs' parity contract: pad to 2*ndev so planes/device is even
    up = jax.device_put(ps3.pad_planes3(pk3.pad_grid3(u), 8), sh)
    fp = jax.device_put(ps3.pad_planes3(pk3.pad_grid3(f), 8), sh)
    uu = jnp.zeros_like(up) if fz else up
    with mesh:
        wu, wdw, werr = ps3.sharded_fused_descend3(
            uu, fp, n, h, 3, 0.8, mesh, from_zero=fz, interpret=True)
        gu, gdw, gerr = ps3.rdma_fused_descend3(
            uu, fp, n, h, 3, 0.8, mesh, from_zero=fz, interpret=True)
    np.testing.assert_array_equal(np.asarray(gu), np.asarray(wu))
    np.testing.assert_array_equal(np.asarray(gdw), np.asarray(wdw))
    assert float(gerr) == pytest.approx(float(werr), rel=5e-6)


@pytest.mark.parametrize("em", [None, "clean"])
def test_rdma_ascend3_bitmatches_ppermute(em):
    """The RDMA ascend LEG (prolong + add + post-sweeps, u/f/cw halos by
    remote DMA) bit-matches the ppermute leg, with and without the fused
    last-node error."""
    from multigrid_poisson_solver_tpu.ops import padded3 as pd3
    from multigrid_poisson_solver_tpu.ops import pallas3d as pk3
    from multigrid_poisson_solver_tpu.parallel import pallas_shard3 as ps3

    n, h, m = 65, 1.0 / 64, 33
    rng = np.random.default_rng(6)
    u = jnp.asarray(rng.random((n, n, n)), jnp.float32)
    f = jnp.asarray(10 * rng.random((n, n, n)), jnp.float32)
    mesh = ps3.make_mesh_z(jax.devices()[:4])
    sh = ps3.z_sharding(mesh)
    up = jax.device_put(ps3.pad_planes3(pk3.pad_grid3(u), 8), sh)
    fp = jax.device_put(ps3.pad_planes3(pk3.pad_grid3(f), 8), sh)
    ec = jnp.asarray(rng.random(pk3.padded_shape3(m)), jnp.float32)
    zp = up.shape[0]
    ecc = jnp.concatenate(
        [ec, jnp.zeros((zp // 2 - ec.shape[0],) + ec.shape[1:],
                       ec.dtype)], 0)
    cw = jax.device_put(pd3.prolong3_lanes_p(ecc, n, m), sh)
    with mesh:
        wout = ps3.sharded_fused_ascend3(up, fp, cw, n, h, 3, 0.8, mesh,
                                         err_mode=em, interpret=True)
        gout = ps3.rdma_fused_ascend3(up, fp, cw, n, h, 3, 0.8, mesh,
                                      err_mode=em, interpret=True)
    if em is None:
        np.testing.assert_array_equal(np.asarray(gout), np.asarray(wout))
    else:
        np.testing.assert_array_equal(np.asarray(gout[0]),
                                      np.asarray(wout[0]))
        assert float(gout[1]) == pytest.approx(float(wout[1]), rel=5e-6)


def test_compiled3_engine_rdma_legs_route():
    """halo='rdma' under a clean-metric ALIGNED schedule routes the fused
    descend AND ascend legs through the RDMA kernels and the whole cycle
    bit-matches the ppermute engine."""
    import unittest.mock as mock

    from multigrid_poisson_solver_tpu.compiled3 import compile_program3
    from multigrid_poisson_solver_tpu.models import poisson3d as p3
    from multigrid_poisson_solver_tpu.parallel import pallas_shard3 as ps3

    mesh = ps3.make_mesh_z(jax.devices()[:4])
    policy = ps3.ZShardingPolicy3(mesh)
    program = mg.v_cycle(65, n_min=5, steps=3, coarse_target=1e-8,
                         coarsen=3)

    def run(halo):
        cfg = mg.SolverConfig(omega=6.0 / 7.0, kernels="pallas", halo=halo,
                              collect_node_stats=False)
        with mesh:
            cc = compile_program3(program, p3.REFERENCE_PROBLEM_3D, cfg,
                                  policy=policy)
            u, f = cc.init()
            u1, err = cc(u, f)
        return np.asarray(u1), float(err)

    calls = {"down": 0, "up": 0}
    od, oa = ps3.rdma_fused_descend3, ps3.rdma_fused_ascend3

    def spy_d(*a, **kw):
        calls["down"] += 1
        return od(*a, **kw)

    def spy_a(*a, **kw):
        calls["up"] += 1
        return oa(*a, **kw)

    with mock.patch.object(ps3, "rdma_fused_descend3", spy_d), \
            mock.patch.object(ps3, "rdma_fused_ascend3", spy_a):
        u_rdma, err_rdma = run("rdma")
    assert calls["down"] and calls["up"], calls
    u_pp, err_pp = run("ppermute")
    np.testing.assert_array_equal(u_rdma, u_pp)
    assert err_rdma == pytest.approx(err_pp, rel=1e-5)


@pytest.mark.slow
def test_rdma_smoother3_multi_row_bricks(monkeypatch):
    """Regression (round-5 review finding): middle row-bricks' load offset
    must match the smoother geometry's 8-row halo — a -16 offset left
    their top owned rows frozen (returned unsmoothed) while every
    existing test ran single-brick geometries. Force a 5x5 brick schedule
    via a tiny brick budget and assert the bit-match still holds."""
    import multigrid_poisson_solver_tpu.ops.pallas_rdma3 as rd
    from multigrid_poisson_solver_tpu.ops import pallas3d as pk3
    from multigrid_poisson_solver_tpu.parallel import pallas_shard3 as ps3

    monkeypatch.setattr(rd, "RDMA3_BRICK_BUDGET", 1024 * 1024)
    n, h = 65, 1.0 / 64
    mesh, up, fp = _fields3(n)
    zs, rs, oz, orow, nzb, nrb = rd._rdma_jacobi3_geometry(18, 80, 128, 3)
    assert nzb > 1 and nrb > 1, (nzb, nrb)    # the schedule must tile
    want = ps3.sharded_fused_jacobi3(up, fp, n, h, 3, 0.8, mesh,
                                     interpret=True)
    got = ps3.rdma_fused_jacobi3(up, fp, n, h, 3, 0.8, mesh,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_rdma_legs3_multi_row_bricks(monkeypatch):
    """Forced-tiling twin of test_rdma_smoother3_multi_row_bricks for the
    LEGS: shrink the legs' brick budget so the static schedule actually
    tiles in z AND rows, and assert both legs still bit-match the
    ppermute path (the shared _static_brick_schedule keeps the halo
    offsets consistent by construction now — this pins it)."""
    import multigrid_poisson_solver_tpu.ops.pallas_rdma3 as rd
    from multigrid_poisson_solver_tpu.ops import padded3 as pd3
    from multigrid_poisson_solver_tpu.ops import pallas3d as pk3
    from multigrid_poisson_solver_tpu.parallel import pallas_shard3 as ps3

    monkeypatch.setattr(rd, "RDMA3_DESCEND_BRICK_BUDGET", 2 * 1024 * 1024)
    n, h, m = 65, 1.0 / 64, 33
    rng = np.random.default_rng(9)
    u = jnp.asarray(rng.random((n, n, n)), jnp.float32)
    f = jnp.asarray(10 * rng.random((n, n, n)), jnp.float32)
    mesh = ps3.make_mesh_z(jax.devices()[:4])
    sh = ps3.z_sharding(mesh)
    up = jax.device_put(ps3.pad_planes3(pk3.pad_grid3(u), 8), sh)
    fp = jax.device_put(ps3.pad_planes3(pk3.pad_grid3(f), 8), sh)
    nl = up.shape[0] // 4
    g = rd._rdma_descend3_geometry(nl, 80, 128, 5)
    assert g[4] > 1 and g[5] > 1, g          # schedule must tile both axes

    with mesh:
        wu, wdw, werr = ps3.sharded_fused_descend3(
            up, fp, n, h, 3, 0.8, mesh, interpret=True)
        gu, gdw, gerr = ps3.rdma_fused_descend3(
            up, fp, n, h, 3, 0.8, mesh, interpret=True)
    np.testing.assert_array_equal(np.asarray(gu), np.asarray(wu))
    np.testing.assert_array_equal(np.asarray(gdw), np.asarray(wdw))
    assert float(gerr) == pytest.approx(float(werr), rel=5e-6)

    ec = jnp.asarray(rng.random(pk3.padded_shape3(m)), jnp.float32)
    zp = up.shape[0]
    ecc = jnp.concatenate(
        [ec, jnp.zeros((zp // 2 - ec.shape[0],) + ec.shape[1:],
                       ec.dtype)], 0)
    cw = jax.device_put(pd3.prolong3_lanes_p(ecc, n, m), sh)
    ga = rd._rdma_ascend3_geometry(nl, 80, 128, 4)
    assert ga[4] > 1 or ga[5] > 1, ga
    with mesh:
        wo = ps3.sharded_fused_ascend3(up, fp, cw, n, h, 3, 0.8, mesh,
                                       interpret=True)
        go = ps3.rdma_fused_ascend3(up, fp, cw, n, h, 3, 0.8, mesh,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(go), np.asarray(wo))
