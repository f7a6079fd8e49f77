"""Multi-device scaling harness: sharded V-cycles across a device mesh.

Weak scaling: the finest grid side grows with the device count (constant
rows per device; total work per device still grows ~linearly because the
grid is square), so the efficiency column is *throughput-normalized*:
eff = (work/time) / (devices × work₁/time₁). Strong scaling: fixed grid,
growing mesh, eff = t₁ / (c·t_c).

All device counts run the same kernel path (default kernels="xla"; set
SCALING_KERNELS=pallas for the production path — since round 2 the fused
Pallas kernels run sharded too, via shard_map + ppermute halo exchange in
parallel.pallas_shard) so scaling loss is never conflated with a kernel swap.

On real multi-chip TPU hardware this is the BASELINE.md weak-scaling
measurement; on a single host it runs against virtual CPU devices as a
functional check of the sharded execution path — efficiencies are then
bounded by host cores, not interconnect.

    python bench_scaling.py                  # weak scaling on all devices
    SCALING_MODE=strong python bench_scaling.py
    SCALING_BASE_N=2049 SCALING_KERNELS=pallas python bench_scaling.py
"""

from __future__ import annotations

import json
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # single-host functional mode: fabricate 8 virtual devices (must happen
    # before the first jax import; real multi-chip sets its own flags)
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("SCALING_PLATFORM"):
    # JAX_PLATFORMS env is ignored when jax is pre-imported with a TPU
    # plugin (see CLAUDE.md); the config update is honored post-import
    jax.config.update("jax_platforms", os.environ["SCALING_PLATFORM"])

import multigrid_poisson_solver_tpu as mg  # noqa: E402
from multigrid_poisson_solver_tpu.parallel.mesh import (  # noqa: E402
    ShardingPolicy, make_mesh,
)
from multigrid_poisson_solver_tpu.solver import SolverConfig  # noqa: E402
from multigrid_poisson_solver_tpu.utils.profiling import DeviceTimer  # noqa: E402


def cycle_time(n: int, devices, iters: int = 8, reps: int = 3) -> float:
    policy = None
    if len(devices) > 1:
        policy = ShardingPolicy(make_mesh(devices), threshold_rows=16)
    # same kernels at every device count (pallas = the production path)
    config = SolverConfig(kernels=os.environ.get("SCALING_KERNELS", "xla"))
    program = mg.v_cycle(n, n_min=8, steps=3, coarse_option=0,
                         coarsen=int(os.environ.get("SCALING_COARSEN", "1")))
    cold = mg.compile_program(program, mg.REFERENCE_PROBLEM, config,
                              policy=policy, donate=False)
    warm = mg.compile_program(program, mg.REFERENCE_PROBLEM, config,
                              policy=policy, warm=True, donate=False)
    u, f = cold.init()
    # iterate cycles inside one jit: per-call dispatch over the device tunnel
    # would swamp a ~ms cycle and is NOT cancelled by differential timing
    run = jax.jit(lambda u, f: jax.lax.fori_loop(
        0, iters, lambda i, v: warm.fn(v, f)[0], cold.fn(u, f)[0]))
    per_call = DeviceTimer().measure_differential(run, u, f, reps=reps)
    return per_call / (iters + 1)


def cycle_time3(n: int, devices, iters: int = 4, reps: int = 3) -> float:
    """3-D: the fully z-sharded padded-resident cycle (SCALING_DIM=3).
    Every device count runs v_cycle3_sharded — on 1 device it degenerates
    to the replicated single-device fast path, same kernels throughout."""
    import jax.numpy as jnp

    from multigrid_poisson_solver_tpu.models import poisson3d as p3
    from multigrid_poisson_solver_tpu.parallel.pallas_shard3 import (
        make_mesh_z, v_cycle3_sharded,
    )

    mesh = make_mesh_z(devices)
    h = 1.0 / (n - 1)
    prob = p3.REFERENCE_PROBLEM_3D
    interp = jax.default_backend() != "tpu"

    @jax.jit
    def build():
        f = (prob.source_grid(n) + prob.boundary_grid(n)).astype(jnp.float32)
        return prob.boundary_grid(n).astype(jnp.float32), f

    u, f = build()
    halo = os.environ.get("SCALING_HALO", "ppermute")
    with mesh:
        run = jax.jit(lambda u, f: jax.lax.fori_loop(
            0, iters, lambda i, v: v_cycle3_sharded(
                v, f, n, h, mesh, threshold_planes=8, halo=halo,
                interpret=interp), u))
        per_call = DeviceTimer().measure_differential(run, u, f, reps=reps)
    return per_call / iters


# odd 2:1-alignable sides whose volumes grow ~2x per step (the z-sharded
# 3-D weak-scaling ladder: cubic grids cannot hold planes/device constant
# exactly, so efficiency is throughput-normalized like the 2-D column)
_LADDER_3D = [65, 81, 101, 129, 161, 201, 257]


def main():
    mode = os.environ.get("SCALING_MODE", "weak")
    dim = int(os.environ.get("SCALING_DIM", "2"))
    default_base = (1025 if jax.default_backend() != "cpu" else 257) \
        if dim == 2 else (257 if jax.default_backend() != "cpu" else 65)
    base_n = int(os.environ.get("SCALING_BASE_N", default_base))
    all_devices = jax.devices()
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= len(all_devices)]

    results = []
    t1 = w1 = None
    for ci, c in enumerate(counts):
        if dim == 3:
            if mode == "weak":
                ladder = [x for x in _LADDER_3D if x >= base_n]
                n = ladder[min(ci, len(ladder) - 1)]
            else:
                n = base_n
            n_work = (n - 1) ** 3
            dt = cycle_time3(n, all_devices[:c])
        else:
            n = (base_n - 1) * c + 1 if mode == "weak" else base_n
            n_work = (n - 1) ** 2
            dt = cycle_time(n, all_devices[:c])
        if t1 is None:
            t1, w1 = dt, n_work
        eff = (n_work / dt) / (c * (w1 / t1))
        results.append({"devices": c, "n": n, "cycle_ms": round(dt * 1e3, 3),
                        "efficiency": round(eff, 3)})
        print(f"[scaling/{mode}] {c} devices, N={n}: {dt*1e3:.2f} ms/cycle, "
              f"throughput efficiency {eff:.1%}", file=sys.stderr)

    # predicted ICI-ring efficiency from the communication-volume model
    # (utils.scaling_model) seeded with the 1-device measured cycle time —
    # the hardware-free counterpart of the measured table above, for
    # comparison against first real multi-chip numbers (BASELINE.md)
    model_rows = []
    if dim == 2 and t1 is not None:
        from multigrid_poisson_solver_tpu.utils import scaling_model as smod

        chip = "v5p" if "v5p" in getattr(
            all_devices[0], "device_kind", "") else "v5e"
        model_rows = smod.scaling_table(base_n, t1, ndevs=(2, 4, 8, 16),
                                        chip=chip)
        for r in model_rows:
            print(f"[scaling/model] {r['ndev']} chips ({chip} ring), "
                  f"N={r['n']}: comm {r['t_comm_ms']:.3f} ms/cycle vs "
                  f"compute {r['t_compute_ms']:.2f} -> predicted eff "
                  f"{r['efficiency_ppermute']:.1%} (ppermute) / "
                  f"{r['efficiency_rdma_bound']:.1%} (RDMA overlap bound)",
                  file=sys.stderr)

    # DCN-aware multi-host prediction (BASELINE config 5: block FMG at
    # 16385², rows on DCN, cols on ICI — utils.scaling_model). Emitted in
    # the same machine-readable JSON so the first real multi-host session
    # has a ready predicted-vs-measured harness.
    model_multihost = []
    if dim == 2:
        from multigrid_poisson_solver_tpu.utils import scaling_model as smod

        model_multihost = (smod.multihost_scaling_table(mode="strong")
                           + smod.multihost_scaling_table(mode="weak"))
        # agglomeration-threshold tuning on the DCN mesh (the actionable
        # counterpart of the latency-bound finding): the optimal threshold
        # per host count rides along in the JSON
        tuned = {h: smod.tune_threshold(16385, 46.9e-3, hosts=h,
                                        local_devices=4,
                                        thresholds=(16, 32, 64, 128, 256,
                                                    512, 1024, 2048))
                 for h in (2, 4, 8)}
        for h, res in tuned.items():
            b = res["best"]
            print(f"[scaling/model-dcn/tune] {h} hosts: optimal "
                  f"threshold_rows={b['threshold_rows']} -> "
                  f"{b['t_total_ms']:.2f} ms/pass (default-32 entry: "
                  f"{res['rows'][1]['t_total_ms']:.2f})", file=sys.stderr)
        for r in model_multihost:
            print(f"[scaling/model-dcn/{r['mode']}] {r['hosts']} hosts x "
                  f"{r['local_devices']} chips, N={r['n']} {r['schedule']}: "
                  f"comm {r['t_comm_ms']:.3f} ms/pass (DCN share "
                  f"{r['t_comm_dcn_ms']:.3f}) vs compute "
                  f"{r['t_compute_ms']:.2f} -> predicted eff "
                  f"{r['efficiency_ppermute']:.1%} (ppermute) / "
                  f"{r['efficiency_rdma_bound']:.1%} (RDMA overlap bound)",
                  file=sys.stderr)

    # 3-D z-plane model (round 5, utils.scaling_model3): predicted
    # strong-slicing table for the 513³ flagship + the weak ladder, seeded
    # with the 1-device measured cycle time; plus the 3-D whole-loop RDMA
    # trigger prediction — the hardware-free counterpart the first real
    # multi-chip 3-D session compares against
    model_rows3 = []
    model_trigger3 = []
    if dim == 3 and t1 is not None:
        from multigrid_poisson_solver_tpu.utils import scaling_model3 as sm3

        chip = "v5p" if "v5p" in getattr(
            all_devices[0], "device_kind", "") else "v5e"
        # seed with the measured single-device time at ITS grid (results[0])
        n1 = results[0]["n"]
        model_rows3 = (sm3.scaling_table3(n1, t1, ndevs=(2, 4, 8),
                                          chip=chip, mode="strong")
                       + sm3.scaling_table3(n1, t1, ndevs=(2, 4, 8),
                                            chip=chip, mode="weak"))
        for r in model_rows3:
            print(f"[scaling/model3/{r['mode']}] {r['ndev']} chips "
                  f"({chip} z-ring), N={r['n']}³: comm "
                  f"{r['t_comm_ms']:.3f} ms/cycle vs compute "
                  f"{r['t_compute_ms']:.2f} -> predicted eff "
                  f"{r['efficiency_ppermute']:.1%} (ppermute) / "
                  f"{r['efficiency_rdma_bound']:.1%} (RDMA overlap bound)",
                  file=sys.stderr)
        model_trigger3 = [sm3.trigger_loop_model3(nn, 8, chip=chip)
                          for nn in (129, 257, 513)]
        for r in model_trigger3:
            print(f"[scaling/model3-trigger] N={r['n']}³ x8 chips: "
                  f"{r['t_sweep_per_pass_us']:.1f} us/sweep per-pass vs "
                  f"{r['t_sweep_rdma_us']:.1f} RDMA "
                  f"({r['t_sweep_rdma_overlap_us']:.1f} overlapped) -> "
                  f"predicted {r['predicted_gain']:.2f}x "
                  f"({r['predicted_gain_overlap']:.2f}x)", file=sys.stderr)

    # whole-loop RDMA trigger prediction (round 4): per-sweep cost of the
    # per-pass sharded trigger vs the one-kernel-per-chip loop — a
    # latency/dispatch-deletion gain, decisive on cheap per-shard sweeps
    model_trigger = []
    if dim == 2:
        from multigrid_poisson_solver_tpu.utils import scaling_model as smod

        chip = "v5p" if "v5p" in getattr(
            all_devices[0], "device_kind", "") else "v5e"
        model_trigger = [smod.trigger_loop_model(nn, 8, chip=chip)
                         for nn in (1025, 4097, 8193)]
        for r in model_trigger:
            print(f"[scaling/model-trigger] N={r['n']} x8 chips: "
                  f"{r['t_sweep_per_pass_us']:.1f} us/sweep per-pass vs "
                  f"{r['t_sweep_rdma_us']:.1f} RDMA "
                  f"({r['t_sweep_rdma_overlap_us']:.1f} overlapped) -> "
                  f"predicted {r['predicted_gain']:.2f}x "
                  f"({r['predicted_gain_overlap']:.2f}x)", file=sys.stderr)

    tuned_json = []
    if dim == 2 and t1 is not None:
        tuned_json = [{"hosts": h, **res["best"]}
                      for h, res in tuned.items()]
    print(json.dumps({"mode": mode, "dim": dim,
                      "backend": jax.default_backend(),
                      "results": results, "model": model_rows,
                      "model3": model_rows3,
                      "model_multihost": model_multihost,
                      "model_trigger_loop": model_trigger,
                      "model3_trigger_loop": model_trigger3,
                      "model_dcn_threshold": tuned_json}))


if __name__ == "__main__":
    main()
