"""VMEM-resident sub-cycle chain kernels (ops.pallas_chain).

The descend chain (per level: pre-sweeps + residual + restriction) and
ascend chain (prolongation + add + post-sweeps) must BIT-match the
per-level fused-leg path (pallas_kernels fused_descend/ascend + the XLA
lane passes) — same expression trees, lane transfers as exact MXU
selection/2-tap matmuls.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import multigrid_poisson_solver_tpu as mg
from multigrid_poisson_solver_tpu.ops import layout
from multigrid_poisson_solver_tpu.ops import padded as P
from multigrid_poisson_solver_tpu.ops import pallas_chain as pc
from multigrid_poisson_solver_tpu.ops import pallas_kernels as pk


def _fields(n0, seed=5):
    rng = np.random.default_rng(seed)
    rp, cp = layout.padded_shape(n0)
    u0 = jnp.zeros((rp, cp), jnp.float32).at[:n0, :n0].set(
        jnp.asarray(rng.random((n0, n0)), jnp.float32))
    f0 = jnp.zeros((rp, cp), jnp.float32).at[:n0, :n0].set(
        jnp.asarray(rng.random((n0, n0)), jnp.float32))
    return u0, f0


def _reference_descend(u0, f0, sizes, h0, steps, omega, restriction,
                       entry_from_zero=False):
    uref, fref = [], []
    ucur, fcur = u0, f0
    c = len(sizes) - 1
    for k in range(c):
        n, m = sizes[k], sizes[k + 1]
        h = h0 * 2 ** k
        un, dwide, _ = pk.fused_descend_padded(
            ucur, fcur, n, h, steps, omega=omega, restriction=restriction,
            compat=True, want_err=False,
            from_zero=entry_from_zero if k == 0 else True, interpret=True)
        fc = P.restrict_lanes_p(dwide, n, m, layout.padded_shape(m))
        uref.append(un)
        fref.append(fc)
        ucur = jnp.zeros(layout.padded_shape(m), jnp.float32)
        fcur = fc
    return uref, fref


@pytest.mark.parametrize("restriction", ["sampling", "full_weighting"])
def test_descend_chain_bitmatches_per_level(restriction):
    n0 = 65
    sizes = pc.chain_sizes(n0, n_min=5)
    assert pc.chain_fits(sizes)
    c = len(sizes) - 1
    h0 = 1.0 / (n0 - 1)
    u0, f0 = _fields(n0)
    got_u, got_f = pc.fused_chain_descend(
        u0, f0, sizes, h0, tuple([3] * c), 0.8, restriction=restriction,
        interpret=True)
    want_u, want_f = _reference_descend(u0, f0, sizes, h0, 3, 0.8,
                                        restriction)
    for k in range(c):
        np.testing.assert_array_equal(np.asarray(got_u[k]),
                                      np.asarray(want_u[k]))
        np.testing.assert_array_equal(np.asarray(got_f[k]),
                                      np.asarray(want_f[k]))


def test_descend_chain_from_zero_entry():
    """Entry level with u ≡ 0 (a W-cycle's inner excursion) takes the
    closed-form first sweep at the top too."""
    n0 = 33
    sizes = pc.chain_sizes(n0, n_min=5)
    c = len(sizes) - 1
    h0 = 1.0 / (n0 - 1)
    _, f0 = _fields(n0, seed=9)
    z = jnp.zeros_like(f0)
    got_u, got_f = pc.fused_chain_descend(
        z, f0, sizes, h0, tuple([2] * c), 1.0, entry_from_zero=True,
        interpret=True)
    want_u, want_f = _reference_descend(z, f0, sizes, h0, 2, 1.0,
                                        "sampling", entry_from_zero=True)
    for k in range(c):
        np.testing.assert_array_equal(np.asarray(got_u[k]),
                                      np.asarray(want_u[k]))
        np.testing.assert_array_equal(np.asarray(got_f[k]),
                                      np.asarray(want_f[k]))


def test_ascend_chain_bitmatches_per_level():
    n0 = 65
    sizes = pc.chain_sizes(n0, n_min=5)
    c = len(sizes) - 1
    h0 = 1.0 / (n0 - 1)
    u0, f0 = _fields(n0)
    u_list, f_list = pc.fused_chain_descend(
        u0, f0, sizes, h0, tuple([3] * c), 0.8, interpret=True)

    nb = sizes[-1]
    rpb, cpb = layout.padded_shape(nb)
    rng = np.random.default_rng(11)
    uc = jnp.zeros((rpb, cpb), jnp.float32).at[1:nb - 1, 1:nb - 1].set(
        jnp.asarray(rng.random((nb - 2, nb - 2)), jnp.float32))

    f_at = [f0] + f_list[:-1]
    got = pc.fused_chain_ascend(u_list, f_at, uc, sizes, h0,
                                tuple([3] * c), 0.8, interpret=True)

    ucur = uc
    for k in range(c - 1, -1, -1):
        n, m = sizes[k], sizes[k + 1]
        h = h0 * 2 ** k
        rpk, cpk = layout.padded_shape(n)
        cw = P.prolong_lanes_p(ucur, m, n, (rpk // 2 + 8, cpk))
        ucur, _ = pk.fused_ascend_padded(u_list[k], f_at[k], cw, n, h, 3,
                                         omega=0.8, compat=True,
                                         want_err=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ucur))


def test_chain_vcycle_converges():
    """A full V-cycle built from the two chain kernels + the dense coarse
    solve contracts like the engine's V-cycle and reaches the
    discretization floor."""
    from multigrid_poisson_solver_tpu.ops import coarse as co
    from multigrid_poisson_solver_tpu.ops.layout import (
        pad_grid_to, unpad_grid)

    n0 = 65
    sizes = pc.chain_sizes(n0, n_min=8)
    c = len(sizes) - 1
    h0 = 1.0 / (n0 - 1)
    spec = mg.GridSpec(n0)
    prob = mg.REFERENCE_PROBLEM
    f0 = layout.pad_grid(prob.source_grid(spec, jnp.float32)
                         + prob.boundary_grid(spec, jnp.float32))
    u = layout.pad_grid(prob.boundary_grid(spec, jnp.float32))
    nb, hb = sizes[-1], h0 * 2 ** c

    def vcycle(u):
        u_list, f_list = pc.fused_chain_descend(
            u, f0, sizes, h0, tuple([3] * c), 0.8, interpret=True)
        uc = pad_grid_to(co.dense_solve(unpad_grid(f_list[-1], nb), hb),
                         layout.padded_shape(nb))
        return pc.fused_chain_ascend(u_list, [f0] + f_list[:-1], uc, sizes,
                                     h0, tuple([3] * c), 0.8, interpret=True)

    for _ in range(8):
        u = vcycle(u)
    ana = prob.analytic_grid(spec, jnp.float32)
    err = float(jnp.mean(jnp.abs(unpad_grid(u, n0) - ana)))
    assert err < 5e-4          # h²-floor class at n=65


def test_chain_fits_guards():
    assert not pc.chain_fits((64, 32))            # not 2:1 vertex-aligned
    assert not pc.chain_fits((65,))               # no transition
    big = pc.chain_sizes(8193, n_min=8)
    assert not pc.chain_fits(big)                 # 8193 level alone > budget


def test_compiled_engine_chains_and_bitmatches():
    """The compiled engine detects the V-shaped remainder and routes it
    through the chain kernels; the result is BIT-identical to the
    per-level fused path (chain disabled via monkeypatch)."""
    import unittest.mock as mock

    from multigrid_poisson_solver_tpu import compiled as C

    program = mg.v_cycle(129, n_min=8, steps=3, coarse_option=0, coarsen=3)
    cfg = mg.SolverConfig(omega=0.8, kernels="pallas",
                          collect_node_stats=False)

    engaged = {"n": 0}
    real = C._match_chain

    def counting(*a, **k):
        r = real(*a, **k)
        if r is not None:
            engaged["n"] += 1
        return r

    with mock.patch.object(C, "_match_chain", counting):
        cc = C.compile_program(program, mg.REFERENCE_PROBLEM, cfg,
                               donate=False)
        u, f = cc.init()
        u_chain, _ = cc(u, f)
    assert engaged["n"] >= 1, "chain never engaged on an aligned program"

    with mock.patch.object(C, "_match_chain", lambda *a, **k: None):
        cc2 = C.compile_program(program, mg.REFERENCE_PROBLEM, cfg,
                                donate=False)
        u2, f2 = cc2.init()
        u_plain, _ = cc2(u2, f2)
    np.testing.assert_array_equal(np.asarray(u_chain), np.asarray(u_plain))


def test_compiled_engine_chain_err_semantics():
    """last_err from a chained finest-entry cycle matches the per-level
    engine's fused error to metric tolerance (recomputed post-chain)."""
    import unittest.mock as mock

    from multigrid_poisson_solver_tpu import compiled as C

    program = mg.v_cycle(65, n_min=8, steps=3, coarse_option=0, coarsen=3)
    for compat in (True, False):
        cfg = mg.SolverConfig(omega=0.8, kernels="pallas",
                              compat_error=compat,
                              collect_node_stats=False)
        cc = C.compile_program(program, mg.REFERENCE_PROBLEM, cfg,
                               donate=False)
        u, f = cc.init()
        _, err_chain = cc(u, f)
        with mock.patch.object(C, "_match_chain", lambda *a, **k: None):
            cc2 = C.compile_program(program, mg.REFERENCE_PROBLEM, cfg,
                                    donate=False)
            u2, f2 = cc2.init()
            _, err_plain = cc2(u2, f2)
        assert float(err_chain) == pytest.approx(float(err_plain), rel=1e-4)


def test_chain_skips_gpu_metric_at_finest():
    """The gpu ping-pong metric cannot be recomputed post-chain — the
    matcher must refuse finest-entry chains under compat_error='gpu' and
    the engine must still produce the fused gpu error."""
    import unittest.mock as mock

    from multigrid_poisson_solver_tpu import compiled as C

    program = mg.v_cycle(65, n_min=8, steps=3, coarse_option=0, coarsen=3)
    cfg = mg.SolverConfig(omega=0.8, kernels="pallas", compat_error="gpu",
                          collect_node_stats=False)
    cc = C.compile_program(program, mg.REFERENCE_PROBLEM, cfg, donate=False)
    u, f = cc.init()
    _, err = cc(u, f)
    with mock.patch.object(C, "_match_chain", lambda *a, **k: None):
        cc2 = C.compile_program(program, mg.REFERENCE_PROBLEM, cfg,
                                donate=False)
        u2, f2 = cc2.init()
        _, err2 = cc2(u2, f2)
    assert float(err) == pytest.approx(float(err2), rel=1e-5)


@pytest.mark.parametrize("compat", [True, False, "gpu"])
def test_trigger_vmem_bitmatches_per_pass_loop(compat):
    """fused_trigger_vmem: the whole |Δerr| > trigger loop in one kernel —
    iterates BIT-match the per-pass fused trigger loop, same stop point,
    same reported error."""
    n, h = 65, 1.0 / 64
    u0, f0 = _fields(n, seed=3)
    gu, ge = pc.fused_trigger_vmem(u0, f0, n, h, 0.05, 0.9, compat, 500,
                                   interpret=True)
    v, err = pk.fused_jacobi_err_padded(u0, f0, n, h, 1, omega=0.9,
                                        compat=compat, interpret=True)
    prev, k, slope = err, 1, 1e9
    while slope > 0.05 and k < 500:
        v, err = pk.fused_jacobi_err_padded(v, f0, n, h, 1, omega=0.9,
                                            compat=compat, interpret=True)
        slope = abs(float(err) - float(prev))
        prev = err
        k += 1
    np.testing.assert_array_equal(np.asarray(gu), np.asarray(v))
    assert float(ge) == pytest.approx(float(err), rel=1e-6)


def test_compiled_trigger_routes_through_vmem_kernel():
    """A kernels='pallas' trigger schedule at VMEM-fitting sizes uses the
    in-VMEM loop (the per-pass fused step must not be called) and matches
    the per-pass engine."""
    import unittest.mock as mock

    from multigrid_poisson_solver_tpu.ops import pallas_chain as PC

    program = mg.v_cycle(65, n_min=8, steps=-1)
    cfg = mg.SolverConfig(omega=0.8, kernels="pallas",
                          collect_node_stats=False)

    def boom(*a, **k):
        raise AssertionError("per-pass trigger step used despite the "
                             "VMEM trigger kernel fitting")

    with mock.patch.object(pk, "fused_jacobi_err_padded", boom):
        cc = mg.compile_program(program, mg.REFERENCE_PROBLEM, cfg,
                                donate=False)
        u, f = cc.init()
        u_vmem, _ = cc(u, f)

    with mock.patch.object(PC, "trigger_fits", lambda *a, **k: False), \
            mock.patch.object(PC, "trigger_stream_fits",
                              lambda *a, **k: False):
        # disable BOTH whole-loop kernels so the reference run really is
        # the per-pass path (round 4 added the streamed fallback tier)
        cc2 = mg.compile_program(program, mg.REFERENCE_PROBLEM, cfg,
                                 donate=False)
        u2, f2 = cc2.init()
        u_pass, _ = cc2(u2, f2)
    np.testing.assert_array_equal(np.asarray(cc.unpad(u_vmem)),
                                  np.asarray(cc2.unpad(u_pass)))


def test_chain_mixed_steps_and_zero_post():
    """The matcher supports per-level step counts, including 0 post-sweeps
    (add-only ascend); chain output stays bit-identical to the per-level
    engine, and last_err falls back to the pre-smoothing metric."""
    import unittest.mock as mock

    from multigrid_poisson_solver_tpu import compiled as C
    from multigrid_poisson_solver_tpu.schedule import (
        Ascend, CoarseSolve, CycleProgram, Descend)

    ins = (Descend(next_n=33, steps=4), Descend(next_n=17, steps=2),
           Descend(next_n=9, steps=1), CoarseSolve(1e-8, 0),
           Ascend(steps=0), Ascend(steps=3), Ascend(steps=0))
    program = CycleProgram(1.0, 0.0, 0.0, 65, ins)
    cfg = mg.SolverConfig(omega=0.8, kernels="pallas",
                          collect_node_stats=False)
    cc = C.compile_program(program, mg.REFERENCE_PROBLEM, cfg, donate=False)
    u, f = cc.init()
    u1, e1 = cc(u, f)
    with mock.patch.object(C, "_match_chain", lambda *a, **k: None):
        cc2 = C.compile_program(program, mg.REFERENCE_PROBLEM, cfg,
                                donate=False)
        u2, e2 = cc2(u, f)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    assert float(e1) == pytest.approx(float(e2), rel=1e-4)


def test_chain_skips_partial_v_patterns():
    """A W-shaped suffix (fewer ascends than descends before the next
    descend) must not match; the engine still runs it correctly."""
    from multigrid_poisson_solver_tpu import compiled as C
    from multigrid_poisson_solver_tpu.schedule import (
        Ascend, CoarseSolve, CycleProgram, Descend)

    ins = (Descend(next_n=33, steps=2), Descend(next_n=17, steps=2),
           CoarseSolve(1e-8, 0), Ascend(steps=2),        # partial ascent
           Descend(next_n=17, steps=2), CoarseSolve(1e-8, 0),
           Ascend(steps=2), Ascend(steps=2))
    cfg = mg.SolverConfig(omega=0.8, kernels="pallas",
                          collect_node_stats=False)
    # position 0 must NOT match (1 ascend < 2 descends); position 1 (the
    # inner 33→17 V) and position 4 must
    m0 = C._match_chain(ins, 0, 65, cfg, None, finest=True)
    assert m0 is None
    m1 = C._match_chain(ins, 1, 33, cfg, None, finest=False)
    assert m1 is not None and m1[0] == (33, 17)
    program = CycleProgram(1.0, 0.0, 0.0, 65, ins)
    cc = C.compile_program(program, mg.REFERENCE_PROBLEM, cfg, donate=False)
    u, f = cc.init()
    u1, _ = cc(u, f)
    cfg_x = mg.SolverConfig(omega=0.8, kernels="xla",
                            collect_node_stats=False)
    ccx = C.compile_program(program, mg.REFERENCE_PROBLEM, cfg_x,
                            donate=False)
    ux, _ = ccx(u, f)
    np.testing.assert_allclose(np.asarray(cc.unpad(u1)),
                               np.asarray(ccx.unpad(ux)),
                               rtol=1e-4, atol=1e-6)


def test_lane_panels_bitmatch_dense():
    """Round-4 banded 128-lane block-panel transfers (the cap-lifting form,
    VERDICT r3 item 1) are BIT-identical to the round-3 dense matmuls —
    selection has one tap per output lane and expansion at most two, so no
    reassociation exists to differ. Root 513 engages multi-block panels at
    every wide transition."""
    n0 = 513
    sizes = pc.chain_sizes(n0, n_min=5)
    assert pc.chain_fits(sizes)
    c = len(sizes) - 1
    h0 = 1.0 / (n0 - 1)
    u0, f0 = _fields(n0)
    outs = {}
    for form in ("panel", "dense"):
        du, df = pc.fused_chain_descend(
            u0, f0, sizes, h0, tuple([2] * c), 0.8,
            restriction="full_weighting", interpret=True, lane_form=form)
        uc = jnp.zeros(layout.padded_shape(sizes[-1]), jnp.float32)
        up = pc.fused_chain_ascend(
            du, [f0] + df[:-1], uc, sizes, h0, tuple([2] * c), 0.8,
            interpret=True, lane_form=form)
        outs[form] = (du, df, up)
    for a, b in zip(outs["panel"][0], outs["dense"][0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(outs["panel"][1], outs["dense"][1]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(outs["panel"][2]),
                                  np.asarray(outs["dense"][2]))


def test_panel_chain_bitmatches_per_level_at_513():
    """At a panel-engaging root the whole chain still bit-matches the
    per-level reference ops (the round-3 guarantee survives the banded
    transfer rewrite)."""
    n0 = 513
    sizes = pc.chain_sizes(n0, n_min=5)
    c = len(sizes) - 1
    h0 = 1.0 / (n0 - 1)
    u0, f0 = _fields(n0)
    got_u, got_f = pc.fused_chain_descend(
        u0, f0, sizes, h0, tuple([2] * c), 0.8, restriction="sampling",
        interpret=True, lane_form="panel")
    want_u, want_f = _reference_descend(u0, f0, sizes, h0, 2, 0.8,
                                        "sampling")
    for k in range(c):
        np.testing.assert_array_equal(np.asarray(got_u[k]),
                                      np.asarray(want_u[k]))
        np.testing.assert_array_equal(np.asarray(got_f[k]),
                                      np.asarray(want_f[k]))


def _per_pass_trigger(u, f, n, h, trig, omega, compat, cap):
    """The engine's per-pass trigger loop (fused err kernel, 1 sweep/pass)."""
    from multigrid_poisson_solver_tpu.ops import pallas_kernels as pk
    prev = None
    k = 0
    while True:
        u, err = pk.fused_jacobi_err_padded(u, f, n, h, 1, omega=omega,
                                            compat=compat, interpret=True)
        k += 1
        if prev is not None and abs(float(err) - prev) <= trig:
            break
        if k >= cap:
            break
        prev = float(err)
    return u, float(err), k


@pytest.mark.parametrize("compat", [True, False, "gpu"])
def test_trigger_stream_matches_per_pass(compat):
    """The u-resident / f-streamed trigger loop (the 4097² class) replays
    the per-pass loop: same sweep counts, same iterate to fp32-contraction
    tolerance (CPU-interpret XLA makes chunk-dependent FMA choices — even
    fused(1)∘fused(1) vs fused(2) differ at 1 ulp here; hardware Mosaic is
    canonical and the TPU experiment pins bit-identity)."""
    n = 129
    rp, cp = layout.padded_shape(n)
    rng = np.random.default_rng(5)
    u = jnp.zeros((rp, cp), jnp.float32).at[:n, :n].set(
        jnp.asarray(rng.standard_normal((n, n)), jnp.float32))
    f = jnp.zeros((rp, cp), jnp.float32).at[:n, :n].set(
        jnp.asarray(10 * rng.standard_normal((n, n)), jnp.float32))
    h = 1.0 / (n - 1)
    assert pc.trigger_stream_fits(n)
    got, err = pc.fused_trigger_stream(u, f, n, h, 30.0, 0.8, compat, 200,
                                       interpret=True)
    want, werr, k = _per_pass_trigger(u, f, n, h, 30.0, 0.8, compat, 200)
    assert k < 200                     # the stop rule actually fired
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)
    assert abs(float(err) - werr) <= 1e-5 * abs(werr)


def test_trigger_stream_multi_strip(monkeypatch):
    """Multi-strip wavefront (in-place commits + edge carry + lagged err)
    matches the single-strip evaluation of the same kernel."""
    n = 257
    rp, cp = layout.padded_shape(n)
    rng = np.random.default_rng(7)
    u = jnp.zeros((rp, cp), jnp.float32).at[:n, :n].set(
        jnp.asarray(rng.standard_normal((n, n)), jnp.float32))
    f = jnp.zeros((rp, cp), jnp.float32).at[:n, :n].set(
        jnp.asarray(10 * rng.standard_normal((n, n)), jnp.float32))
    h = 1.0 / (n - 1)
    single, es = pc.fused_trigger_stream(u, f, n, h, 60.0, 0.8, True, 100,
                                         interpret=True)
    # shrink the budget so strips engage (rp=272 -> S=64: 4 strips + rem 16)
    monkeypatch.setattr(pc, "STREAM_VMEM_BUDGET",
                        ((rp + 16) * cp + 8 * 64 * cp + 5 * 16 * cp) * 4)
    S = pc._stream_strip_rows(rp, cp)
    assert S < rp
    import jax
    jax.clear_caches()                 # same static signature, new geometry
    multi, em = pc.fused_trigger_stream(u, f, n, h, 60.0, 0.8, True, 100,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(multi), np.asarray(single),
                               rtol=0, atol=1e-6)
    assert abs(float(em) - float(es)) <= 1e-5 * abs(float(es))


def test_compiled_trigger_routes_through_stream_kernel(monkeypatch):
    """The compiled engine picks the streamed kernel for trigger levels in
    the (trigger_fits, trigger_stream_fits] band and matches the per-pass
    fallback engine."""
    import multigrid_poisson_solver_tpu as mg
    from multigrid_poisson_solver_tpu.compiled import compile_program

    n = 129
    program = mg.v_cycle(n, n_min=8, steps=-1, coarse_option=0, coarsen=3)
    cfg = mg.SolverConfig(omega=0.8, kernels="pallas",
                          collect_node_stats=False)

    def run():
        cc = compile_program(program, mg.REFERENCE_PROBLEM, cfg,
                             donate=False)
        u, f = cc.init()
        u, err = cc(u, f)
        return np.asarray(u), float(err)

    base_u, base_err = run()           # in-VMEM kernel path (129 fits)
    import jax
    # force the stream path: make trigger_fits reject 129
    monkeypatch.setattr(pc, "trigger_fits", lambda n, **kw: False)
    calls = []
    orig = pc.fused_trigger_stream

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(pc, "fused_trigger_stream", spy)
    jax.clear_caches()
    got_u, got_err = run()
    assert calls, "stream kernel was not routed"
    np.testing.assert_allclose(got_u, base_u, rtol=0, atol=1e-6)
    # the final err is a residual-magnitude sum of a near-converged state:
    # ulp-level u differences (CPU-interpret FMA contraction, see above)
    # amplify to ~1e-4 relative there
    assert abs(got_err - base_err) <= 1e-3 * abs(base_err) + 1e-12


@pytest.mark.parametrize("compat", [True, False])
def test_ascend_chain_fused_err_matches_metric(compat):
    """The ascend chain's in-kernel finest error (round 4, ADVICE r3 item 4)
    matches the separate metric pass on its own output to fp32
    reassociation tolerance, and u is unchanged by requesting it."""
    n0 = 65
    sizes = pc.chain_sizes(n0, n_min=5)
    c = len(sizes) - 1
    h0 = 1.0 / (n0 - 1)
    u0, f0 = _fields(n0)
    du, df = pc.fused_chain_descend(u0, f0, sizes, h0, tuple([2] * c), 0.8,
                                    interpret=True)
    uc = jnp.zeros(layout.padded_shape(sizes[-1]), jnp.float32)
    plain = pc.fused_chain_ascend(du, [f0] + df[:-1], uc, sizes, h0,
                                  tuple([2] * c), 0.8, interpret=True)
    got, err = pc.fused_chain_ascend(du, [f0] + df[:-1], uc, sizes, h0,
                                     tuple([2] * c), 0.8, interpret=True,
                                     compat=compat)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(plain))
    from multigrid_poisson_solver_tpu.ops import padded as P
    ref = float(P.smoothing_error_p(plain, f0, h0, n0, compat=compat))
    assert abs(float(err) - ref) <= 1e-5 * abs(ref)
