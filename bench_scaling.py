"""Multi-device scaling harness: sharded V-cycles across a device mesh.

Weak scaling: the finest grid grows with the device count (constant rows per
device), so perfect scaling is constant time per cycle. Strong scaling:
fixed grid, growing mesh.

On real multi-chip TPU hardware this is the BASELINE.md weak-scaling
measurement; on a single host it still runs (virtual CPU devices via
--xla_force_host_platform_device_count) as a functional check of the sharded
execution path — the printed efficiencies are then bounded by host cores,
not interconnect.

    python bench_scaling.py                  # weak scaling on all devices
    SCALING_MODE=strong python bench_scaling.py
    SCALING_BASE_N=2049 python bench_scaling.py
"""

from __future__ import annotations

import json
import os
import sys

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    # single-host functional mode: fabricate 8 devices unless real multi-chip
    import jax as _jax_probe  # noqa: F401  (must set flags BEFORE first use)

import jax

import multigrid_poisson_solver_tpu as mg
from multigrid_poisson_solver_tpu.parallel.mesh import ShardingPolicy, make_mesh
from multigrid_poisson_solver_tpu.utils.profiling import DeviceTimer


def cycle_time(n: int, devices, reps: int = 5) -> float:
    policy = None
    if len(devices) > 1:
        policy = ShardingPolicy(make_mesh(devices), threshold_rows=16)
    program = mg.v_cycle(n, n_min=8, steps=3, coarse_option=0)
    cc = mg.compile_program(program, mg.REFERENCE_PROBLEM, policy=policy,
                            donate=False)
    u, f = cc.init()
    return DeviceTimer().measure_differential(
        lambda u, f: cc.fn(u, f)[0], u, f, reps=reps)


def main():
    mode = os.environ.get("SCALING_MODE", "weak")
    base_n = int(os.environ.get("SCALING_BASE_N",
                                1025 if jax.default_backend() != "cpu" else 257))
    all_devices = jax.devices()
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= len(all_devices)]

    results = []
    t1 = None
    for c in counts:
        if mode == "weak":
            # rows/device constant: n−1 scales with devices (n stays 2^k+1)
            n = (base_n - 1) * c + 1 if c > 1 else base_n
            n_work = (n - 1) ** 2
        else:
            n = base_n
            n_work = (n - 1) ** 2
        dt = cycle_time(n, all_devices[:c])
        if t1 is None:
            t1, w1 = dt, n_work
        eff = ((t1 * (n_work / w1) / (c * dt)) if mode == "weak"
               else t1 / (c * dt))
        results.append({"devices": c, "n": n, "cycle_ms": round(dt * 1e3, 3),
                        "efficiency": round(eff, 3)})
        print(f"[scaling/{mode}] {c} devices, N={n}: {dt*1e3:.2f} ms/cycle, "
              f"efficiency {eff:.1%}", file=sys.stderr)

    print(json.dumps({"mode": mode, "backend": jax.default_backend(),
                      "results": results}))


if __name__ == "__main__":
    main()
