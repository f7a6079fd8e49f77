"""Benchmark driver: smoothing throughput (GDoF/s/chip) on the real device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GDoF/s", "vs_baseline": N}

``value`` is smoothed interior cells per second per chip for fp32 Jacobi
sweeps at N=8193 (the BASELINE.json single-chip headline config).
``vs_baseline`` is the fraction of the speed-of-light roofline for this chip:
a Jacobi sweep moves at least 12 bytes/point of HBM traffic (read u, read f,
write u in fp32), so roofline = HBM_BW / 12 points/s. The reference publishes
no numbers (BASELINE.md), so the roofline fraction — with a ≥0.70 target —
is the honest baseline comparison.

Extra context (wall time of a full V-cycle, residual reduction) goes to
stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

import multigrid_poisson_solver_tpu as mg
from multigrid_poisson_solver_tpu.ops import stencils


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


def _sync(x) -> float:
    """Force completion of everything ``x`` depends on.

    On the tunneled TPU platform ``block_until_ready`` returns before remote
    execution finishes, so timing must anchor on a dependent *scalar* fetch
    (large-array fetches are prohibitively slow over the tunnel).
    """
    return float(jax.device_get(jnp.sum(x[:1, :1])))


def _scalar_latency() -> float:
    """Round-trip time of a scalar fetch, to subtract from timed sections."""
    x = jnp.ones((8, 8))
    _sync(x)
    t0 = time.perf_counter()
    for _ in range(3):
        _sync(x + 1.0)
    return (time.perf_counter() - t0) / 3


def bench_smoothing(n: int, sweeps: int, reps: int, dtype=jnp.float32):
    """Time `sweeps` fused Jacobi sweeps on an (n, n) grid; returns GDoF/s."""
    spec = mg.GridSpec(n)
    h = spec.h
    problem = mg.REFERENCE_PROBLEM
    f = problem.source_grid(spec, dtype) + problem.boundary_grid(spec, dtype)
    u = problem.boundary_grid(spec, dtype)

    @jax.jit
    def run(u, f):
        return jax.lax.fori_loop(
            0, sweeps, lambda _, v: stencils.jacobi_sweep(v, f, h), u)

    u = run(u, f)               # compile + warm
    _sync(u)
    lat = _scalar_latency()
    t0 = time.perf_counter()
    for _ in range(reps):
        u = run(u, f)
    _sync(u)
    elapsed = time.perf_counter() - t0 - lat
    per_call = elapsed / reps
    cells = (n - 2) * (n - 2) * sweeps
    return cells / per_call / 1e9, per_call


def bench_vcycle(n: int, dtype=jnp.float32):
    """Wall time of one compiled V-cycle + resulting relative residual."""
    from multigrid_poisson_solver_tpu.compiled import compile_program
    program = mg.v_cycle(n, n_min=8, steps=3, coarse_target=1e-7)
    cc = compile_program(program, mg.REFERENCE_PROBLEM, donate=False)
    u, f = cc.init()
    u1, _ = cc(u, f)            # compile + warm
    _sync(u1)
    lat = _scalar_latency()
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        u1, _ = cc(u, f)
    _sync(u1)
    dt = (time.perf_counter() - t0 - lat) / reps
    rr = float(stencils.relative_residual_norm(u1, f, cc.finest_spec.h))
    return dt, rr


def main():
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    n = int(os.environ.get("BENCH_N", 8193 if on_tpu else 513))
    sweeps = int(os.environ.get("BENCH_SWEEPS", 20))
    reps = int(os.environ.get("BENCH_REPS", 5))

    gdofs, best = bench_smoothing(n, sweeps, reps)
    bw = _hbm_bw(dev)
    roofline_gdofs = bw / 12.0 / 1e9      # 12 B/point fp32 Jacobi
    frac = gdofs / roofline_gdofs

    print(f"[bench] device={dev.device_kind} platform={dev.platform}", file=sys.stderr)
    print(f"[bench] smoothing N={n}: {gdofs:.2f} GDoF/s "
          f"({best*1e3:.2f} ms / {sweeps} sweeps), roofline {roofline_gdofs:.1f} "
          f"GDoF/s -> {frac:.1%} of speed of light", file=sys.stderr)

    try:
        vn = int(os.environ.get("BENCH_VCYCLE_N", 4097 if on_tpu else 257))
        vdt, vrr = bench_vcycle(vn)
        print(f"[bench] V-cycle N={vn}: {vdt*1e3:.2f} ms, rel residual {vrr:.3e}",
              file=sys.stderr)
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
