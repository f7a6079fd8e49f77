"""Communication-volume / weak-scaling efficiency model for sharded cycles.

Real multi-chip hardware is unavailable in this environment, so this module
provides the next-best evidence toward the BASELINE ≥80% weak-scaling target
(VERDICT r2 missing item 3): a first-principles per-cycle communication
model for a policy-sharded compiled program —

  * bytes ``ppermute``d per device per cycle (the 8-row/128-lane halo
    exchanges in front of every fused Pallas pass, parallel.pallas_shard),
  * bytes ``all_gather``ed at the shard→replicated coarse-agglomeration
    boundary (and scattered back on the ascent),
  * collective latency events (each ppermute/psum is a barrier on the
    current non-RDMA path),

combined with a compute-time estimate (measured single-chip ms/cycle, or
the HBM roofline from utils.profiling.cost_report) into a predicted
weak-scaling efficiency for an N-chip ICI ring — or, with ``dcn_rows=True``
(the ``multihost.hybrid_block_mesh`` layout), a DCN×ICI mesh where
row-direction traffic pays per-host DCN bandwidth/latency
(``multihost_scaling_table`` = BASELINE config 5's planning table):

    eff = T_comp / (T_comp + T_comm)          (ppermute barrier path)
    eff_rdma ≈ T_comp / (T_comp + T_lat)      (in-kernel RDMA overlap path:
                                               wire time hidden under
                                               interior compute, only the
                                               per-pass semaphore waits
                                               remain, ops.pallas_rdma)

Cross-check: ``hlo_collective_counts`` counts the collectives in the
actually-lowered HLO of the compiled sharded program on the virtual mesh;
``tests/test_scaling_model.py`` asserts the model's event counts match.

The reference has no distributed layer (single GPU, SURVEY.md §2); this is
the planning tool its multi-GPU port would have needed.
"""

from __future__ import annotations

import dataclasses
import math

from ..ops.layout import LANE, padded_shape
from ..ops.pallas_kernels import HALO, MAX_FUSED_SWEEPS as MAX_FUSED
from ..schedule import Ascend, CoarseSolve, CycleProgram, Descend

DTYPE_BYTES = 4

# Public per-chip interconnect figures (1-D ring, one link per direction).
# v5e: 4 ICI links x ~400 Gbps/dir aggregate ≈ 45 GB/s per direction per
# link-pair used by a ring; v5p is ~3x. Latency ~1.5 us per collective hop
# (barrier ppermute → one round trip + dispatch).
ICI_BW = {"v5e": 45e9, "v5p": 150e9}
ICI_LATENCY_S = 1.5e-6
HBM_BW = {"v5e": 819e9, "v5p": 2765e9}

# Public per-HOST data-center-network figures (inter-host collectives when a
# mesh axis leaves the ICI slice — parallel.multihost.hybrid_block_mesh puts
# the grid's ROW axis there). ~2×100 Gbps NICs ≈ 25 GB/s egress per host per
# direction (the "How to Scale Your Model" planning figure for v5e/v5p
# pods); shared by all local devices sending concurrently. Latency is an
# order of magnitude above ICI (host NIC + switch round trip).
DCN_BW_HOST = {"v5e": 25e9, "v5p": 25e9}
DCN_LATENCY_S = 25e-6

# MEASURED on hardware (TPU v5e, 2026-08-20, examples/exp_rdma_calibrate.py,
# chained ≥100 ms negative-trigger protocol — three consistent runs):
#
# * RDMA protocol overhead per sweep, loopback ring of 4 vs the ndev=1
#   build (READY handshake + edge DMAs + per-sender-semaphore all-to-all,
#   WITHOUT the ICI wire hop — unmeasurable on one chip, still charged at
#   the public ICI_LATENCY_S figure): 2-D 8-row halos 0.77/0.84/0.81
#   µs/sweep; 3-D 1-plane halos 0.64/0.63 µs/sweep.
# * Per-pass fixed overhead of a fused k=1 pass inside a jit chain
#   (cost(k=1) − marginal in-kernel sweep): 0.83 µs at 257² (~0.4 MB
#   arrays — near-pure launch cost) and 5.78 µs at 1025² (~4.9 MB — DMA
#   ramp grows with the array), i.e. ≈ 0.7 µs + 1.1 µs/MB of array.
MEASURED_RDMA_PROTOCOL_2D_S = 0.81e-6
MEASURED_RDMA_PROTOCOL_3D_S = 0.64e-6
MEASURED_PASS_OVERHEAD_BASE_S = 0.7e-6
MEASURED_PASS_OVERHEAD_PER_MB_S = 1.1e-6


def pass_overhead_s(array_bytes: int) -> float:
    """Fixed per-pass cost of one fused kernel pass over an ``array_bytes``
    array inside a jit chain (measured law above)."""
    return (MEASURED_PASS_OVERHEAD_BASE_S
            + MEASURED_PASS_OVERHEAD_PER_MB_S * array_bytes / 1e6)


@dataclasses.dataclass
class LevelComm:
    n: int
    sharded: bool
    ppermute_bytes: int          # per device, per cycle, this level (TOTAL)
    allgather_bytes: int         # per device (received), per cycle (TOTAL)
    events_ppermute: int         # ppermute launches (pre-CSE upper bound)
    events_psum: int             # scalar psum launches
    events_allgather: int        # agglomeration all-gathers
    # DCN-attributed subsets of the totals above (nonzero only under
    # dcn_rows=True — the hybrid_block_mesh layout with the row axis on DCN)
    bytes_dcn: int = 0
    events_dcn: int = 0

    @property
    def events(self) -> int:
        return self.events_ppermute + self.events_psum + self.events_allgather


@dataclasses.dataclass
class CommReport:
    ndev: int
    levels: list[LevelComm]
    ppermute_bytes: int
    allgather_bytes: int
    events_ppermute: int
    events_psum: int
    events_allgather: int
    bytes_dcn: int = 0           # DCN-attributed share of the byte totals
    events_dcn: int = 0          # events paying DCN (not ICI) latency
    local_devices: int = 1       # devices per host (DCN NIC contention)

    @property
    def events(self) -> int:
        return self.events_ppermute + self.events_psum + self.events_allgather

    def t_comm(self, ici_bw: float, latency: float = ICI_LATENCY_S,
               dcn_bw: float = DCN_BW_HOST["v5e"],
               dcn_latency: float = DCN_LATENCY_S) -> float:
        """Serialized communication time per device per cycle.

        ICI bytes ride the per-chip ring links; DCN bytes share the per-HOST
        NIC with the ``local_devices - 1`` siblings sending concurrently
        (hybrid_block_mesh: every device in a host row-block owns a
        width-slice of the same halo row, so the host egress per exchange is
        the full-width row = per-device bytes × local_devices). Summing the
        two wire terms is conservative: row (DCN) and lane (ICI) exchanges
        of the same pass could overlap, but the barrier ppermute path
        serializes them in front of the kernel anyway."""
        ici_bytes = self.ppermute_bytes + self.allgather_bytes - self.bytes_dcn
        wire = (ici_bytes / ici_bw
                + self.bytes_dcn * self.local_devices / dcn_bw)
        lat = ((self.events - self.events_dcn) * latency
               + self.events_dcn * dcn_latency)
        return wire + lat

    def summary(self) -> str:
        lines = [f"{'level n':>8}{'sharded':>9}{'ppermute KB':>13}"
                 f"{'allgather KB':>14}{'events':>8}"]
        for lc in self.levels:
            lines.append(f"{lc.n:>8}{str(lc.sharded):>9}"
                         f"{lc.ppermute_bytes/1e3:>13.1f}"
                         f"{lc.allgather_bytes/1e3:>14.1f}{lc.events:>8}")
        lines.append(f"total/device/cycle: {self.ppermute_bytes/1e3:.1f} KB "
                     f"ppermuted, {self.allgather_bytes/1e3:.1f} KB "
                     f"all-gathered, {self.events} collective launches")
        return "\n".join(lines)


def _passes(steps: int) -> int:
    """Fused ≤8-sweep passes for a smoothing leg (trigger ≈ 10 sweeps)."""
    if steps == -1:
        steps = 10
    if steps == 0:
        return 0
    return math.ceil(steps / MAX_FUSED)


def comm_report(program: CycleProgram, ndev: int,
                threshold_rows: int = 32, block_cols: int = 1,
                dcn_rows: bool = False) -> CommReport:
    """Per-device communication volume for one cycle of ``program`` under a
    1-D rows (block_cols=1) or 2-D block (rows×cols device grid) policy.

    Mirrors the actual sharded Pallas data path (parallel.pallas_shard):
      * every fused smoothing pass exchanges HALO rows of u AND f each
        direction (from_zero legs skip u — counted for correction levels);
      * the fused descend leg is ONE pass (sweeps+residual+restriction) and
        its output transfers stay device-local (coarse row d·m/D comes from
        fine row 2·d·m/D, which the same device owns — alignment by
        construction of policy.padded_shape);
      * the fused ascend leg exchanges 2·HALO rows of u/f and 2·HALO rows of
        the lane-expanded coarse solution;
      * the first descend BELOW the shard threshold all-gathers the coarse
        RHS (replication), the matching ascend re-slices locally (free);
      * column sharding adds LANE-wide lane halos per pass on each array
        (and their own ppermute launches).

    ``dcn_rows=True`` models the ``multihost.hybrid_block_mesh`` layout —
    the row axis spans hosts over DCN, the column axis stays on ICI inside
    a host (multihost.py's layout rationale). Row-direction halo traffic,
    the agglomeration all-gather, and the error psum are then tagged DCN
    (``bytes_dcn``/``events_dcn``) and ``CommReport.t_comm`` charges them at
    per-host DCN bandwidth (shared by ``block_cols`` local devices) and DCN
    latency instead of the ICI figures.
    """
    row_dev = ndev // block_cols
    events_per_exchange = 2          # fwd + bwd ppermute per array

    def sharded(n: int) -> bool:
        return n // row_dev >= threshold_rows and row_dev > 1

    def halo_parts(n: int, rows: int, arrays: int) -> tuple[int, int]:
        """(row_bytes, lane_bytes) per device for one exchange of ``arrays``
        arrays with a ``rows``-deep row halo; lane halos are LANE wide and
        exist only under column sharding."""
        rp, cp = padded_shape(n)
        cp_loc = cp // block_cols
        row_b = arrays * 2 * rows * cp_loc * DTYPE_BYTES
        lane_b = (arrays * 2 * LANE * (rp // row_dev) * DTYPE_BYTES
                  if block_cols > 1 else 0)
        return row_b, lane_b

    levels: dict[int, LevelComm] = {}

    def acc(n: int, pp: int = 0, ag: int = 0, ev_pp: int = 0,
            ev_ps: int = 0, ev_ag: int = 0, b_dcn: int = 0, ev_dcn: int = 0):
        lc = levels.setdefault(n, LevelComm(n, sharded(n), 0, 0, 0, 0, 0))
        lc.ppermute_bytes += pp
        lc.allgather_bytes += ag
        lc.events_ppermute += ev_pp
        lc.events_psum += ev_ps
        lc.events_allgather += ev_ag
        lc.bytes_dcn += b_dcn
        lc.events_dcn += ev_dcn

    def acc_exchange(n: int, k: int, row_b: int, lane_b: int, arrays: int):
        """k passes exchanging `arrays` arrays: row halos (DCN-taggable) +
        lane halos (always ICI) with their launch events."""
        ev_row = k * arrays * events_per_exchange
        ev_lane = k * arrays * events_per_exchange if block_cols > 1 else 0
        acc(n, pp=k * (row_b + lane_b), ev_pp=ev_row + ev_lane,
            b_dcn=k * row_b if dcn_rows else 0,
            ev_dcn=ev_row if dcn_rows else 0)

    stack = [program.n_max]
    for ins in program.instructions:
        n = stack[-1]
        if isinstance(ins, Descend):
            if sharded(n):
                k = _passes(ins.steps)
                if k:
                    # fused descend leg: one combined pass; extra passes for
                    # steps > 8 are plain smoother passes
                    row_b, lane_b = halo_parts(n, HALO, 2)   # u and f
                    acc_exchange(n, k, row_b, lane_b, arrays=2)
                else:
                    # FMG descent: restriction only — device-local
                    pass
                if not sharded(ins.next_n):
                    # shard → replicated agglomeration: all-gather the
                    # restricted RHS (each device receives the others'
                    # blocks); crosses hosts when the row axis is on DCN
                    rp, cp = padded_shape(ins.next_n)
                    ag = (row_dev - 1) * rp * cp * DTYPE_BYTES // row_dev
                    acc(ins.next_n, ag=ag, ev_ag=1,
                        b_dcn=ag if dcn_rows else 0,
                        ev_dcn=1 if dcn_rows else 0)
            stack.append(ins.next_n)
        elif isinstance(ins, CoarseSolve):
            pass                                  # replicated: no traffic
        elif isinstance(ins, Ascend):
            stack.pop()
            n = stack[-1]
            if sharded(n):
                k = _passes(ins.steps)
                # ascend leg: u, f at 2·HALO rows + coarse wide at 2·HALO
                # (half height)
                row_uf, lane_uf = halo_parts(n, 2 * HALO, 2)
                row_cw, lane_cw = halo_parts(n, 2 * HALO, 1)
                acc_exchange(n, 1, row_uf + row_cw // 2,
                             lane_uf + lane_cw // 2, arrays=3)
                if k > 1:
                    row_b, lane_b = halo_parts(n, HALO, 2)
                    acc_exchange(n, k - 1, row_b, lane_b, arrays=2)
            # psum of the fused error partial (scalar) — the compiled engine
            # only fuses/psums the error at the FINEST level's ascend
            # (compiled.py reports last_err from the top of the cycle), so
            # charging it per level would inflate the latency term (ADVICE r3)
            if sharded(n) and len(stack) == 1:
                acc(n, ev_ps=1, ev_dcn=1 if dcn_rows else 0)

    lv = sorted(levels.values(), key=lambda lc: -lc.n)
    return CommReport(
        ndev=ndev, levels=lv,
        ppermute_bytes=sum(l.ppermute_bytes for l in lv),
        allgather_bytes=sum(l.allgather_bytes for l in lv),
        events_ppermute=sum(l.events_ppermute for l in lv),
        events_psum=sum(l.events_psum for l in lv),
        events_allgather=sum(l.events_allgather for l in lv),
        bytes_dcn=sum(l.bytes_dcn for l in lv),
        events_dcn=sum(l.events_dcn for l in lv),
        local_devices=block_cols if dcn_rows else 1)


def predicted_efficiency(report: CommReport, t_compute_s: float,
                         chip: str = "v5e",
                         latency: float = ICI_LATENCY_S,
                         dcn_latency: float = DCN_LATENCY_S) -> dict:
    """Weak-scaling efficiency prediction for a mesh of report.ndev chips,
    given the per-device compute time of one cycle (constant under weak
    scaling). DCN-tagged traffic (reports built with dcn_rows=True) is
    charged at per-host DCN bandwidth/latency; the rest at ICI figures.

    Returns both the current ppermute-barrier path (wire + latency serialize
    in front of each pass) and the RDMA-overlap bound (wire time hidden
    under interior compute; only the collective launch latency remains —
    ops.pallas_rdma)."""
    bw = ICI_BW.get(chip, ICI_BW["v5e"])
    dcn_bw = DCN_BW_HOST.get(chip, DCN_BW_HOST["v5e"])
    t_comm = report.t_comm(bw, latency, dcn_bw, dcn_latency)
    t_lat = ((report.events - report.events_dcn) * latency
             + report.events_dcn * dcn_latency)
    return {
        "ndev": report.ndev,
        "t_compute_ms": t_compute_s * 1e3,
        "t_comm_ms": t_comm * 1e3,
        "t_comm_dcn_ms": (report.bytes_dcn * report.local_devices / dcn_bw
                          + report.events_dcn * dcn_latency) * 1e3,
        "efficiency_ppermute": t_compute_s / (t_compute_s + t_comm),
        "efficiency_rdma_bound": t_compute_s / (t_compute_s + t_lat),
    }


def tune_threshold(n: int, t1_s: float, hosts: int = 2,
                   local_devices: int = 4, chip: str = "v5e",
                   steps: int = 3, coarsen: int = 3,
                   schedule: str = "fmg",
                   thresholds=(16, 32, 64, 128, 256, 512, 1024)) -> dict:
    """Sweep the agglomeration threshold for a DCN×ICI mesh and return the
    predicted-time-optimal row.

    The multihost table showed config 5 is DCN-LATENCY-bound: FMG revisits
    every level O(L) times and each sharded level pays per-pass DCN
    collective latency. Raising ``threshold_rows`` replicates more coarse
    levels (their compute is trivial) and deletes their DCN events — the
    standard agglomeration-schedule tuning, now quantified. Returns
    {"best": row, "rows": all rows}; each row carries the predicted
    per-pass time t_total_ms = compute + comm."""
    ndev = hosts * local_devices
    row_dev = hosts
    if schedule == "fmg":
        from ..schedule import fmg as make
        prog = make(n, n_min=8, steps=steps, coarsen=coarsen)
    else:
        from ..schedule import v_cycle as make
        prog = make(n, n_min=8, steps=steps, coarse_option=0,
                    coarsen=coarsen)

    # visit-weighted per-level work shares (n² per smoothing-leg visit):
    # replicated levels run their FULL share on every device, sharded
    # levels 1/ndev of it — the compute penalty that bounds how far the
    # agglomeration threshold can profitably rise
    visits: list[int] = []
    stack = [prog.n_max]
    for ins in prog.instructions:
        if isinstance(ins, Descend):
            visits.append(stack[-1])
            stack.append(ins.next_n)
        elif isinstance(ins, Ascend):
            stack.pop()
            visits.append(stack[-1])
    total_w = sum(v * v for v in visits) or 1

    rows = []
    for th in thresholds:
        repl_w = sum(v * v for v in visits if v // row_dev < th)
        t_comp = t1_s * ((total_w - repl_w) / total_w / ndev
                         + repl_w / total_w)
        rep = comm_report(prog, ndev, threshold_rows=th,
                          block_cols=local_devices, dcn_rows=True)
        row = predicted_efficiency(rep, t_comp, chip)
        row.update(threshold_rows=th,
                   t_total_ms=row["t_compute_ms"] + row["t_comm_ms"])
        rows.append(row)
    best = min(rows, key=lambda r: r["t_total_ms"])
    return {"best": best, "rows": rows}


def hlo_collective_counts(hlo_text: str) -> dict:
    """Count collective ops in a lowered/compiled HLO module text — the
    cross-check that the model's event accounting matches what GSPMD/
    shard_map actually emit (run on the virtual 8-device mesh)."""
    counts = {"collective-permute": 0, "all-gather": 0, "all-reduce": 0,
              "all-to-all": 0, "reduce-scatter": 0}
    for line in hlo_text.splitlines():
        s = line.lstrip()
        for key in counts:
            # match op creations ("%x = ... collective-permute(") including
            # start/done pairs counted once via the -start form
            if (f"{key}(" in s or f"{key}-start(" in s) and "=" in s:
                counts[key] += 1
    return counts


def scaling_table(base_n: int, t1_s: float,
                  ndevs=(2, 4, 8, 16), chip: str = "v5e",
                  threshold_rows: int = 32, steps: int = 3,
                  coarsen: int = 3, block_cols: int = 1) -> list[dict]:
    """Predicted weak-scaling table, one row per ring size, following
    bench_scaling.py's weak ladder: n_c = (base_n − 1)·c + 1 — rows/device
    constant, width (and per-device work) growing ×c. Per-device halo bytes
    also grow ×c (the halo is a full-width row), so the comm:compute ratio
    is nearly flat and the efficiency prediction is dominated by the
    halo-to-block ratio plus the agglomeration all-gather.

    ``t1_s``: measured single-chip seconds/cycle at base_n (the same-kernel
    compute term; per-device compute at count c is modeled as t1·c)."""
    from ..schedule import v_cycle

    rows = []
    for c in ndevs:
        n = (base_n - 1) * c + 1
        prog = v_cycle(n, n_min=8, steps=steps, coarse_option=0,
                       coarsen=coarsen)
        rep = comm_report(prog, c, threshold_rows=threshold_rows,
                          block_cols=block_cols)
        row = predicted_efficiency(rep, t1_s * c, chip)
        row["n"] = n
        rows.append(row)
    return rows


def multihost_scaling_table(n: int = 16385, t1_s: float = 46.9e-3,
                            n_hosts=(2, 4, 8), local_devices: int = 4,
                            chip: str = "v5e", threshold_rows: int = 32,
                            steps: int = 3, coarsen: int = 3,
                            schedule: str = "fmg",
                            mode: str = "strong") -> list[dict]:
    """Predicted efficiency for BASELINE config 5: multi-host
    block-partitioned FMG at 16385², hybrid_block_mesh layout (grid rows on
    DCN across hosts, columns on ICI inside each host —
    parallel/multihost.py). No reference analog exists (single GPU); no
    hardware exists here either, so this is the DCN-aware planning table
    the first real multi-host session compares against (VERDICT r3 item 6).

    ``mode="strong"`` (the literal config-5 grid): fixed ``n``, per-device
    compute modeled as ``t1_s / ndev`` (``t1_s`` = measured single-chip
    seconds per pass at ``n`` — BASELINE 16385² V(3,3) 46.9 ms). Coarse-
    level serialization is NOT modeled, so the efficiency isolates the
    communication overhead — and it still predicts DCN-LATENCY-BOUND
    operation (~20-30% at 2 hosts): 16385² simply does not carry enough
    work per device to hide ~60 DCN-latency collectives per FMG pass.
    ``mode="weak"``: rows grow with hosts (n_h = (n−1)·hosts + 1, block per
    device constant-height × hosts-wider), per-device compute
    ``t1_s · hosts / local_devices`` — the regime where multi-host pays."""
    from ..schedule import fmg, v_cycle

    rows = []
    for hosts in n_hosts:
        ndev = hosts * local_devices
        n_h = n if mode == "strong" else (n - 1) * hosts + 1
        t_comp = t1_s / ndev if mode == "strong" \
            else t1_s * hosts / local_devices
        if schedule == "fmg":
            prog = fmg(n_h, n_min=8, steps=steps, coarsen=coarsen)
        else:
            prog = v_cycle(n_h, n_min=8, steps=steps, coarse_option=0,
                           coarsen=coarsen)
        rep = comm_report(prog, ndev, threshold_rows=threshold_rows,
                          block_cols=local_devices, dcn_rows=True)
        row = predicted_efficiency(rep, t_comp, chip)
        row.update(n=n_h, hosts=hosts, local_devices=local_devices,
                   schedule=schedule, mode=mode)
        rows.append(row)
    return rows


def trigger_loop_model(n: int, ndev: int, chip: str = "v5e",
                       t1_sweep_s: float | None = None,
                       dispatch_s: float | None = None) -> dict:
    """Predicted PER-SWEEP cost of a sharded ``|Δerr| > trigger`` loop:
    the per-pass engine vs the whole-loop RDMA kernel
    (parallel.pallas_shard.rdma_fused_trigger / pallas_shard3 twin).

    Per sweep, the per-pass path pays one kernel dispatch plus THREE
    collective-latency events serialized in front of the kernel (the two
    directed halo ppermutes and the scalar psum barrier); the RDMA loop
    pays TWO in-kernel latency events (the READY-handshaked edge-DMA
    round trip and the all-to-all, whose ~4 KB tiles are wire-negligible)
    — zero dispatch, zero XLA collectives. The modeled gain is therefore
    ~(dispatch + one collective latency) per sweep, plus the whole wire
    term when overlap hides it: decisive where per-shard sweeps are cheap
    (coarse levels, many-sweep reference triggers), marginal when the
    sweep itself is HBM-bound milliseconds — the same structure the
    single-chip in-VMEM trigger A/Bs measured (BASELINE "In-VMEM trigger
    loop").

    ``dispatch_s`` defaults to the MEASURED per-pass fixed-overhead law
    (``pass_overhead_s`` at the per-shard array size —
    exp_rdma_calibrate.py); the RDMA side charges the MEASURED loopback
    protocol cost (handshake + edge DMAs + all-to-all,
    MEASURED_RDMA_PROTOCOL_2D_S) plus the public ICI hop latency for the
    wire part one chip cannot see. ``t1_sweep_s`` defaults to the HBM
    roofline of one fused k=1 sweep on the shard (3 array transits)."""
    rp, cp = padded_shape(n)
    rows = max(rp // ndev, 1)
    shard_bytes = rows * cp * DTYPE_BYTES
    if t1_sweep_s is None:
        t1_sweep_s = 3 * shard_bytes / HBM_BW[chip]
    if dispatch_s is None:
        dispatch_s = pass_overhead_s(shard_bytes)
    halo_bytes = 2 * HALO * cp * DTYPE_BYTES          # 8 rows each way
    bw = ICI_BW[chip]
    # per-pass: exchange (2 directed ppermutes, serialized) + psum + launch
    t_pp = (t1_sweep_s + dispatch_s + halo_bytes / bw + 3 * ICI_LATENCY_S)
    # whole-loop RDMA: measured protocol cost + the unmeasured ICI hop pair
    t_rdma = (t1_sweep_s + halo_bytes / bw + MEASURED_RDMA_PROTOCOL_2D_S
              + 2 * ICI_LATENCY_S)
    t_rdma_overlap = (t1_sweep_s + MEASURED_RDMA_PROTOCOL_2D_S
                      + 2 * ICI_LATENCY_S)            # wire under compute
    return {"n": n, "ndev": ndev, "rows_per_device": rows,
            "t_sweep_per_pass_us": t_pp * 1e6,
            "t_sweep_rdma_us": t_rdma * 1e6,
            "t_sweep_rdma_overlap_us": t_rdma_overlap * 1e6,
            "predicted_gain": t_pp / t_rdma,
            "predicted_gain_overlap": t_pp / t_rdma_overlap}
