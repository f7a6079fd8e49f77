"""Benchmark driver: smoothing throughput (GDoF/s/chip) on the real device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GDoF/s", "vs_baseline": N}

``value`` is smoothed interior cells per second per chip for fp32 Jacobi
sweeps at N=8193 (the BASELINE.json single-chip headline config), using the
framework's hot path: the Pallas fused multi-sweep strip kernel on TPU, the
XLA padded stencil elsewhere.

``vs_baseline`` is the throughput relative to the *unfused* speed-of-light
roofline for this chip: one Jacobi sweep re-reading u and f and writing u
moves 12 bytes/point fp32, so roofline = HBM_BW / 12 points/s. The reference
publishes no numbers (BASELINE.md), so this hardware roofline is the honest
baseline; values > 1 mean the fused kernel beats what any unfused
implementation (the reference's per-sweep kernel included) could reach.

Timing protocol (see .claude/skills/verify/SKILL.md): the remote-device
tunnel makes block_until_ready a no-op and costs ~0.6 s per scalar fetch, so
sweeps are iterated *inside* one jitted fori_loop and timed with
utils.profiling.DeviceTimer's differential protocol — t(3k calls) − t(k
calls) cancels dispatch and sync costs exactly.

Extra context (V-cycle wall time, compensated relative residual) goes to
stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

import jax

# persistent compile cache: repeated bench runs (the driver runs this every
# round) skip the multi-minute remote compiles
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import multigrid_poisson_solver_tpu as mg
from multigrid_poisson_solver_tpu.ops import layout
from multigrid_poisson_solver_tpu.ops import padded as P


# HBM bandwidth per chip (bytes/s) by device kind, for the roofline estimate.
_HBM_BW = {
    "TPU v5 lite": 819e9,        # v5e
    "TPU v5e": 819e9,
    "TPU v5": 2765e9,            # v5p
    "TPU v5p": 2765e9,
    "TPU v4": 1228e9,
    "TPU v6 lite": 1640e9,       # v6e / Trillium
    "TPU v6e": 1640e9,
    "cpu": 50e9,                 # nominal, so CPU runs still emit sane JSON
}


def _hbm_bw(device) -> float:
    kind = getattr(device, "device_kind", "cpu")
    for key, bw in _HBM_BW.items():
        if kind.lower().startswith(key.lower()):
            return bw
    return 819e9


def _smooth_step(on_tpu: bool, n: int, h: float, sweeps: int):
    if on_tpu:
        from multigrid_poisson_solver_tpu.ops.pallas_kernels import fused_jacobi_padded
        return lambda u, f: fused_jacobi_padded(u, f, n, h, sweeps)
    return lambda u, f: jax.lax.fori_loop(
        0, sweeps, lambda _, v: P.jacobi_sweep_p(v, f, h, n), u)


def bench_smoothing(n: int, sweeps: int, iters: int, on_tpu: bool,
                    dtype=jnp.float32):
    """GDoF/s for fused Jacobi sweeps on an (n, n) grid (padded layout)."""
    spec = mg.GridSpec(n)
    problem = mg.REFERENCE_PROBLEM
    f = layout.pad_grid(problem.source_grid(spec, dtype)
                        + problem.boundary_grid(spec, dtype))
    u = layout.pad_grid(problem.boundary_grid(spec, dtype))

    step = _smooth_step(on_tpu, n, spec.h, sweeps)
    # f must be an ARGUMENT, not a closure: a closed-over concrete array
    # becomes a jit constant embedded in the serialized program (a 270 MB
    # request the remote-compile tunnel rejects with HTTP 413)
    run = jax.jit(lambda u, f: jax.lax.fori_loop(
        0, iters, lambda i, v: step(v, f), u))

    # differential timing (t(3k) − t(k) calls): cancels dispatch + sync
    # latency exactly — the single-subtraction protocol over the 0.6 s
    # tunnel latency mismeasured ms-scale kernels by up to 5×
    from multigrid_poisson_solver_tpu.utils.profiling import DeviceTimer

    per_call = DeviceTimer().measure_differential(run, u, f, reps=3)
    per_sweep = per_call / (iters * sweeps)
    return (n - 2) * (n - 2) / per_sweep / 1e9, per_sweep


def bench_vcycle(n: int, iters: int = 20, dtype=jnp.float32):
    """Wall time of one compiled V-cycle + compensated relative residual.

    The cycle is iterated warm-restarted inside one jit (per-call dispatch
    over the tunnel would swamp a ~5 ms cycle), so this also measures the
    realistic chained-cycle steady state.
    """
    program = mg.v_cycle(n, n_min=8, steps=3, coarse_target=1e-7)
    cc = mg.compile_program(program, mg.REFERENCE_PROBLEM, donate=False)
    warm = mg.compile_program(program, mg.REFERENCE_PROBLEM, donate=False,
                              warm=True)
    u, f = cc.init()

    run = jax.jit(lambda u, f: jax.lax.fori_loop(
        0, iters, lambda i, v: warm.fn(v, f)[0], cc.fn(u, f)[0]))

    from multigrid_poisson_solver_tpu.utils.profiling import DeviceTimer

    per_call = DeviceTimer().measure_differential(run, u, f, reps=2)
    dt = per_call / (iters + 1)
    u1 = run(u, f)
    rr = float(jax.device_get(
        P.relative_residual_norm_p(u1, f, cc.finest_spec.h, n)))
    return dt, rr


def main():
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    n = int(os.environ.get("BENCH_N", 8193 if on_tpu else 513))
    sweeps = int(os.environ.get("BENCH_SWEEPS", 8))
    iters = int(os.environ.get("BENCH_ITERS", 40 if on_tpu else 3))

    gdofs, per_sweep = bench_smoothing(n, sweeps, iters, on_tpu)
    bw = _hbm_bw(dev)
    roofline_gdofs = bw / 12.0 / 1e9      # unfused 12 B/point fp32 Jacobi
    frac = gdofs / roofline_gdofs

    print(f"[bench] device={dev.device_kind} platform={dev.platform}", file=sys.stderr)
    print(f"[bench] smoothing N={n} ({sweeps}-sweep fused x{iters}): "
          f"{gdofs:.2f} GDoF/s ({per_sweep*1e3:.3f} ms/sweep); unfused roofline "
          f"{roofline_gdofs:.1f} GDoF/s -> {frac:.2f}x", file=sys.stderr)

    try:
        vn = int(os.environ.get("BENCH_VCYCLE_N", 4097 if on_tpu else 257))
        vdt, vrr = bench_vcycle(vn)
        print(f"[bench] V-cycle N={vn}: {vdt*1e3:.2f} ms, "
              f"compensated rel residual {vrr:.3e}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — context only, never break the JSON line
        print(f"[bench] V-cycle bench skipped: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": f"fp32 Jacobi smoothing throughput, N={n}, 1 chip",
        "value": round(gdofs, 3),
        "unit": "GDoF/s",
        "vs_baseline": round(frac, 4),
    }))


if __name__ == "__main__":
    main()
