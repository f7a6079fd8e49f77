"""Communication-volume model vs the actually-lowered sharded HLO.

VERDICT r2 missing item 3: weak-scaling readiness without hardware. The
model (utils.scaling_model) predicts per-cycle collective counts and bytes;
these tests pin it against the collectives GSPMD/shard_map really emit for
the compiled sharded program on the virtual 8-device mesh.
"""

import jax
import pytest

import multigrid_poisson_solver_tpu as mg
from multigrid_poisson_solver_tpu.compiled import compile_program
from multigrid_poisson_solver_tpu.parallel.mesh import (
    ShardingPolicy,
    make_mesh,
)
from multigrid_poisson_solver_tpu.utils import scaling_model as sm


def _compiled_hlo(program, policy, **cfg_kw):
    cfg = mg.SolverConfig(omega=0.8, kernels="pallas",
                          collect_node_stats=False, **cfg_kw)
    cc = compile_program(program, mg.REFERENCE_PROBLEM, cfg, policy=policy,
                         donate=False)
    u, f = cc.init()
    return jax.jit(cc.fn).lower(u, f).compile().as_text()


def test_model_matches_lowered_collectives():
    """The model's event accounting is a tight pre-CSE upper bound on the
    lowered HLO: all-gather count exact, ppermute count an upper bound
    (XLA CSEs the duplicate f-halo exchanges between descend and ascend at
    the same level), psum an upper bound (scalar reductions merge)."""
    policy = ShardingPolicy(make_mesh(), threshold_rows=8)
    program = mg.v_cycle(129, n_min=8, steps=3, coarse_option=0, coarsen=3)
    counts = sm.hlo_collective_counts(_compiled_hlo(program, policy))
    rep = sm.comm_report(program, 8, threshold_rows=8)

    assert counts["all-gather"] == rep.events_allgather == 1
    assert 0 < counts["collective-permute"] <= rep.events_ppermute
    # CSE can only REMOVE exchanges; it cannot remove more than the
    # duplicate-f share (2 per sharded level per revisit)
    assert counts["collective-permute"] >= rep.events_ppermute - 2 * len(
        [l for l in rep.levels if l.sharded])
    assert counts["all-reduce"] <= rep.events_psum


def test_model_volume_accounting():
    """Volumes follow the halo geometry: a fused pass moves 2 arrays ×
    2 directions × 8 rows × cp bytes; the agglomeration all-gather moves
    (D−1)/D of the first replicated level."""
    program = mg.v_cycle(129, n_min=8, steps=3, coarse_option=0, coarsen=3)
    rep = sm.comm_report(program, 8, threshold_rows=8)
    from multigrid_poisson_solver_tpu.ops.layout import padded_shape

    _, cp129 = padded_shape(129)
    lv = {l.n: l for l in rep.levels}
    # descend pass (u,f × 8 rows) + ascend leg (u,f × 16 + cw × 16/2)
    expect_129 = (2 * 2 * 8 * cp129 * 4) + (2 * 2 * 16 * cp129 * 4
                                            + 2 * 16 * cp129 * 4 // 2)
    assert lv[129].ppermute_bytes == expect_129
    rp33, cp33 = padded_shape(33)
    assert lv[33].allgather_bytes == 7 * rp33 * cp33 * 4 // 8
    assert lv[33].events_ppermute == 0          # replicated level


def test_predicted_efficiency_meets_target():
    """With the measured single-chip cycle time (10.5 ms at 8193², BASELINE
    r2) the predicted 8-chip v5e weak-scaling efficiency clears the ≥80%
    BASELINE target with wide margin on both halo paths."""
    rows = sm.scaling_table(8193, 10.5e-3, ndevs=(2, 4, 8, 16))
    for r in rows:
        assert r["efficiency_ppermute"] > 0.9
        assert r["efficiency_rdma_bound"] > r["efficiency_ppermute"]


def test_dcn_attribution():
    """dcn_rows=True tags exactly the row-direction halo traffic, the
    agglomeration all-gather, and the error psum as DCN; the 1-D-rows
    report is unchanged by the flag's default."""
    program = mg.v_cycle(129, n_min=8, steps=3, coarse_option=0, coarsen=3)
    base = sm.comm_report(program, 8, threshold_rows=8)
    assert base.bytes_dcn == 0 and base.events_dcn == 0

    # pure rows-on-DCN (block_cols=1): ALL traffic is DCN-attributed
    rows_dcn = sm.comm_report(program, 8, threshold_rows=8, dcn_rows=True)
    assert rows_dcn.bytes_dcn == (rows_dcn.ppermute_bytes
                                  + rows_dcn.allgather_bytes)
    assert rows_dcn.events_dcn == rows_dcn.events
    assert rows_dcn.ppermute_bytes == base.ppermute_bytes

    # hybrid 2 hosts x 4 chips: lane halos stay on ICI
    hyb = sm.comm_report(program, 8, threshold_rows=8, block_cols=4,
                         dcn_rows=True)
    assert 0 < hyb.bytes_dcn < hyb.ppermute_bytes + hyb.allgather_bytes
    assert 0 < hyb.events_dcn < hyb.events
    assert hyb.local_devices == 4
    # DCN latency/bandwidth must make comm strictly more expensive than
    # pretending the same traffic rides ICI
    t_ici_only = (hyb.ppermute_bytes + hyb.allgather_bytes) / sm.ICI_BW[
        "v5e"] + hyb.events * sm.ICI_LATENCY_S
    assert hyb.t_comm(sm.ICI_BW["v5e"]) > t_ici_only


def test_multihost_table_shapes():
    """BASELINE config 5's planning table: strong mode predicts the DCN-
    latency-bound regime (documented honestly), weak mode recovers
    efficiency with scale; RDMA bound dominates ppermute in both."""
    strong = sm.multihost_scaling_table(mode="strong", n_hosts=(2, 4))
    weak = sm.multihost_scaling_table(mode="weak", n_hosts=(2, 4))
    for rows in (strong, weak):
        for r in rows:
            assert 0 < r["efficiency_ppermute"] < 1
            assert r["efficiency_rdma_bound"] >= r["efficiency_ppermute"]
            assert r["t_comm_dcn_ms"] <= r["t_comm_ms"]
    assert strong[0]["n"] == 16385
    assert weak[1]["n"] == (16385 - 1) * 4 + 1
    # weak efficiency grows with hosts (per-device work grows, comm ~flat)
    assert weak[1]["efficiency_ppermute"] > weak[0]["efficiency_ppermute"]


def test_tune_threshold_interior_optimum():
    """Agglomeration-threshold tuning on the DCN mesh finds an INTERIOR
    optimum: replicating more coarse levels deletes DCN latency events
    until the replicated-compute (and bigger agglomeration all-gather)
    penalty takes over."""
    res = sm.tune_threshold(16385, 46.9e-3, hosts=4, local_devices=4,
                            thresholds=(16, 64, 256, 1024, 4096))
    ths = [r["threshold_rows"] for r in res["rows"]]
    ts = [r["t_total_ms"] for r in res["rows"]]
    best = res["best"]["threshold_rows"]
    assert best not in (ths[0], ths[-1])          # interior
    assert min(ts) == res["best"]["t_total_ms"]
    # the tuned threshold beats the default-32-class entry by a real margin
    assert res["best"]["t_total_ms"] < ts[0] * 0.85


def test_hlo_counter_ignores_noise():
    txt = """
  %x = f32[8]{0} all-gather(%a), dimensions={0}
  %y = bf16[4]{0} collective-permute-start(%b)
  ROOT %z = f32[] add(%c, %d)
  // all-reduce in a comment should not count? it has no = sign before (
"""
    c = sm.hlo_collective_counts(txt)
    assert c["all-gather"] == 1 and c["collective-permute"] == 1


def test_trigger_loop_model_structure():
    """The whole-loop RDMA trigger prediction with the MEASURED constants
    (exp_rdma_calibrate.py): gain > 1 everywhere (it deletes the per-pass
    fixed overhead + one collective latency per sweep, never adds cost).
    Since calibration the per-pass overhead grows with the shard size
    (~1.1 µs/MB DMA ramp), so the serialized gain is roughly FLAT in n —
    only the overlap bound (which additionally hides the wire term)
    decays toward 1 as sweeps grow HBM-bound."""
    rows = [sm.trigger_loop_model(n, 8) for n in (1025, 4097, 8193)]
    for r in rows:
        assert 1.0 < r["predicted_gain"] < 1.5
        assert r["predicted_gain_overlap"] > r["predicted_gain"]
        assert r["t_sweep_rdma_overlap_us"] < r["t_sweep_rdma_us"] \
            < r["t_sweep_per_pass_us"]
    og = [r["predicted_gain_overlap"] for r in rows]
    assert og[0] > og[1] > og[2]
    # a measured per-sweep time overrides the HBM-roofline default:
    # overlap = t1 + measured protocol (0.81 us) + 2 ICI hops (3.0 us)
    m = sm.trigger_loop_model(4097, 8, t1_sweep_s=100e-6)
    assert abs(m["t_sweep_rdma_overlap_us"] - 103.81) < 0.1
