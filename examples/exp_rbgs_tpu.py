"""rb-GS Pallas kernel on real TPU: Mosaic bit-match + the VERDICT r3 A/B.

1. Hardware bit-match of fused_rbgs_padded (strip pipeline, parity-mask
   half-sweeps) vs the XLA padded oracle at 1025², plus the fused cpu error.
2. ms/sweep at 8193²: rbgs (≤4 sweeps/pass → 2 HBM passes for 8 sweeps) vs
   jacobi (1 pass) — the raw bandwidth cost of the halved fusion budget.
3. The end-to-end A/B the kernel exists for: df32 refinement at 4097² to
   rel 1e-6 (and 1e-10), inner V(2,2) rb-GS + full-weighting vs inner
   V(3,3) ω=0.8 Jacobi — cycles and device wall (reference analog: the
   GS-vs-Jacobi smoother choice, MG_solver_GPU.cu:663-795).

Run:  python -u examples/exp_rbgs_tpu.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

import multigrid_poisson_solver_tpu as mg  # noqa: E402
from multigrid_poisson_solver_tpu.ops import padded as P  # noqa: E402
from multigrid_poisson_solver_tpu.ops import pallas_kernels as pk  # noqa: E402
from multigrid_poisson_solver_tpu.ops import layout  # noqa: E402
from multigrid_poisson_solver_tpu.refine import (  # noqa: E402
    IterativeRefinementSolver,
)
from multigrid_poisson_solver_tpu.utils.profiling import DeviceTimer  # noqa: E402

timer = DeviceTimer()


def fetch(x):
    return float(jax.device_get(x))


def bitmatch(n=1025, steps=3):
    spec = mg.GridSpec(n)
    h = spec.h
    prob = mg.REFERENCE_PROBLEM

    @jax.jit
    def build():
        f = layout.pad_grid(prob.source_grid(spec, jnp.float32)
                            + prob.boundary_grid(spec, jnp.float32))
        u = layout.pad_grid(prob.boundary_grid(spec, jnp.float32))
        return u, f

    u, f = build()

    @jax.jit
    def want_fn(u, f):
        for _ in range(steps):
            u = P.redblack_gs_sweep_p(u, f, h, n)
        return u

    got = jax.jit(lambda a, b: pk.fused_rbgs_padded(a, b, n, h, steps))(u, f)
    want = want_fn(u, f)
    md = fetch(jnp.max(jnp.abs(got - want)))
    print(f"[bitmatch] n={n} steps={steps}: maxdiff {md:.3e}", flush=True)

    got2, err = jax.jit(lambda a, b: pk.fused_rbgs_err_padded(
        a, b, n, h, steps, compat=True))(u, f)
    md2 = fetch(jnp.max(jnp.abs(got2 - want)))
    ref_err = fetch(P.smoothing_error_p(want, f, h, n, compat=True))
    print(f"[bitmatch] err pass: u maxdiff {md2:.3e}, err "
          f"{fetch(err):.6e} vs separate {ref_err:.6e}", flush=True)


def sweep_cost(n=8193, sweeps=8):
    h = 1.0 / (n - 1)
    rp, cp = layout.padded_shape(n)

    @jax.jit
    def build(key):
        k1, k2 = jax.random.split(key)
        return (jax.random.normal(k1, (rp, cp), jnp.float32),
                jax.random.normal(k2, (rp, cp), jnp.float32))

    u, f = build(jax.random.key(0))
    for name, fn in [
        ("jacobi", jax.jit(lambda a, b: pk.fused_jacobi_padded(
            a, b, n, h, sweeps, omega=0.8))),
        ("rbgs", jax.jit(lambda a, b: pk.fused_rbgs_padded(
            a, b, n, h, sweeps))),
    ]:
        t0 = time.perf_counter()
        out = fn(u, f)
        _ = fetch(jnp.sum(out[:8, :8]))
        print(f"[sweep] {name} compile+run {time.perf_counter()-t0:.1f}s",
              flush=True)
        t = timer.measure_differential(fn, u, f, reps=4)
        print(f"[sweep] {name} N={n} k={sweeps}: {t*1e3:.3f} ms "
              f"({t/sweeps*1e3:.3f} ms/sweep)", flush=True)


def refine_ab(n=4097):
    prob = mg.REFERENCE_PROBLEM
    configs = {
        "jacobi-V33": dict(
            config=mg.SolverConfig(omega=0.8, collect_node_stats=False),
            program=mg.v_cycle(n, n_min=8, steps=3, coarse_option=0,
                               coarsen=3)),
        "rbgs-V22": dict(
            config=mg.SolverConfig(smoother="rbgs",
                                   restriction="full_weighting",
                                   collect_node_stats=False),
            program=mg.v_cycle(n, n_min=8, steps=2, coarse_option=0,
                               coarsen=3)),
        "rbgs-V11": dict(
            config=mg.SolverConfig(smoother="rbgs",
                                   restriction="full_weighting",
                                   collect_node_stats=False),
            program=mg.v_cycle(n, n_min=8, steps=1, coarse_option=0,
                               coarsen=3)),
    }
    for tol in (1e-6, 1e-10):
        for name, kw in configs.items():
            s = IterativeRefinementSolver(prob, n, max_cycles=40,
                                          state="tw32", **kw)
            r0 = s.solve(tol=tol)            # compile + first run
            r = s.solve(tol=tol)             # warm: wall = device loop
            print(f"[refine] N={n} tol={tol:g} {name}: {r.cycles} cycles, "
                  f"rel {r.rel_residual:.2e}, wall {r.wall_time_s*1e3:.1f} ms"
                  f" (cold {r0.wall_time_s*1e3:.1f})", flush=True)


if __name__ == "__main__":
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    bitmatch()
    sweep_cost()
    refine_ab()
