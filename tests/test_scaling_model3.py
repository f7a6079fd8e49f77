"""3-D z-plane communication model vs the actually-lowered sharded HLO.

VERDICT r4 missing item 3: the 2-D scaling model stopped at the row/block
policies; utils.scaling_model3 models the z-plane-sharded 3-D cycle
(parallel.pallas_shard3.v_cycle3_sharded). These tests pin the model's
collective accounting against the HLO GSPMD/shard_map really emit on the
virtual 8-device CPU mesh, and sanity-check the predicted tables.
"""

import jax
import numpy as np
import pytest

from multigrid_poisson_solver_tpu.parallel import pallas_shard3 as ps3
from multigrid_poisson_solver_tpu.utils import scaling_model as sm
from multigrid_poisson_solver_tpu.utils import scaling_model3 as sm3


def _mesh_z(ndev):
    return ps3.make_mesh_z(jax.devices()[:ndev])


def _lowered_hlo(n, ndev, threshold_planes):
    """Compiled HLO of one real v_cycle3_sharded cycle."""
    mesh = _mesh_z(ndev)
    u = np.zeros((n, n, n), np.float32)
    f = np.ones((n, n, n), np.float32)
    fn = jax.jit(lambda a, b: ps3.v_cycle3_sharded(
        a, b, n, 1.0 / (n - 1), mesh, threshold_planes=threshold_planes,
        interpret=True))
    return fn.lower(u, f).compile().as_text()


def test_model_matches_lowered_collectives_fused_geometry():
    """A geometry where the fused legs engage at the single sharded level
    (129³ on 2 devices, 65 replicated by threshold): the model's halo
    ppermute count matches shard_map's manual-mode collectives EXACTLY,
    and exactly one all-gather moves the agglomerated coarse volume."""
    rep = sm3.comm_report3(129, 2, threshold_planes=34)
    lv = {l.n: l for l in rep.levels}
    assert lv[129].fused_descend and lv[129].fused_ascend
    assert lv[129].events_transfer == 0          # no GSPMD fallback
    # descend: f+u × 2 dirs; ascend: u,f × 2 dirs + cw pair
    assert lv[129].events_ppermute == 10
    assert rep.events_psum == 1 and rep.events_allgather == 1

    mc = sm3.hlo_manual_collectives(_lowered_hlo(129, 2,
                                                 threshold_planes=34))
    # shard_map halo exchanges (channel_id=1) — exact match (no duplicate
    # f pairs at this geometry: descend ring 5 ≠ ascend ring 4)
    assert rep.events_cse_dup == 0
    assert mc["ppermute_manual"] == rep.events_ppermute == 10
    # the agglomeration all-gather of the model-shaped coarse RHS appears
    # exactly once; any OTHER all-gathers are GSPMD replication artifacts
    # inside the replicated sub-cycle (not wire-modeled — they broadcast
    # already-identical data)
    lv65 = {l.n: l for l in rep.levels}[65]
    zc, rc, cc = lv65.agg_shape
    coarse = {f"{zc},{rc},{cc}", f"2,{zc},{rc},{cc}"}
    agg = [s for s in mc["allgather_shapes"] if s in coarse]
    assert len(agg) == rep.events_allgather == 1


def test_model_matches_lowered_collectives_deep():
    """513³/8 devices with fallback levels: the shard_map halo ppermutes
    still match the model exactly (the fallback transfer estimate covers
    GSPMD's own collectives, which lower under fresh channel ids)."""
    rep = sm3.comm_report3(513, 8, threshold_planes=8)
    mc = sm3.hlo_manual_collectives(_lowered_hlo(513, 8,
                                                 threshold_planes=8))
    # fallback levels' descend/ascend f-halo rings coincide -> XLA CSEs
    # one exchange pair per level; the model flags exactly those events
    assert rep.events_cse_dup == 6          # three fallback levels
    assert mc["ppermute_manual"] == rep.events_ppermute - rep.events_cse_dup
    # GSPMD transfer collectives exist (fallback einsum resampling) but
    # stay bounded — they move coarse boundary slabs, not volumes
    assert mc["ppermute_gspmd"] <= 4 * max(rep.events_transfer, 1)


def test_volume_accounting():
    """Plane-halo bytes follow the halo geometry exactly: the fused
    descend moves (k_nb+2) full planes per direction per array."""
    rep = sm3.comm_report3(129, 2, threshold_planes=34)
    lv = {l.n: l for l in rep.levels}
    pb = sm3._plane_bytes(129)
    cpb = sm3._cplane_bytes(129)     # (rp//2+8)-row lane-expanded planes
    # descend: 2 arrays × 2 dirs × 5 planes; ascend: u,f × 2 × 4 + cw 5
    # half-height coarse planes (the shape the leg really ppermutes)
    expect = (2 * 2 * 5 * pb) + (2 * 2 * 4 * pb + 5 * cpb)
    assert lv[129].ppermute_bytes == expect
    # agglomeration: (D−1)/D of the fused-path coarse RHS — 66 planes ×
    # (rp_fine/2 = 72) rows × padded coarse lanes (the kernel row-decimates
    # in-kernel, so the RHS is NOT padded_shape3(65)'s 80 rows)
    assert lv[65].agg_shape == (66, 72, 128)
    assert lv[65].allgather_bytes == 1 * 66 * 72 * 128 * 4 // 2


def test_predicted_tables():
    """Strong 513³ slicing pays through 8 chips on the ppermute path and
    ~99% on the RDMA bound; weak scaling approaches 1."""
    strong = sm3.scaling_table3(513, 29.35e-3, ndevs=(2, 4, 8))
    for r in strong:
        assert 0.5 < r["efficiency_ppermute"] < 1
        assert r["efficiency_rdma_bound"] > r["efficiency_ppermute"]
    assert strong[0]["efficiency_ppermute"] > strong[-1][
        "efficiency_ppermute"]
    weak = sm3.scaling_table3(129, 1.0e-3, ndevs=(2, 4), mode="weak")
    assert all(r["efficiency_ppermute"] > 0.85 for r in weak)
    # per-device work grows ×c² while halos grow ×c: efficiency rises
    assert weak[1]["efficiency_ppermute"] > weak[0]["efficiency_ppermute"]


def test_trigger_loop_model3_structure():
    """3-D whole-loop RDMA trigger prediction mirrors the calibrated 2-D
    structure: gain > 1 and roughly flat in n (the measured per-pass
    overhead grows with shard size); the overlap bound dominates and
    decays toward 1 as sweeps grow HBM-bound."""
    rows = [sm3.trigger_loop_model3(n, 8) for n in (129, 257, 513)]
    for r in rows:
        assert 1.0 < r["predicted_gain"] < 1.5
        assert r["predicted_gain_overlap"] > r["predicted_gain"]
    og = [r["predicted_gain_overlap"] for r in rows]
    assert og[0] > og[1] > og[2]
    # overlap = t1 + measured 3-D protocol (0.64 us) + 2 ICI hops (3.0 us)
    m = sm3.trigger_loop_model3(257, 8, t1_sweep_s=100e-6)
    assert abs(m["t_sweep_rdma_overlap_us"] - 103.64) < 0.1
