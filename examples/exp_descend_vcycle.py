"""Measure the panelized descend kernel and the full 8193 V-cycle on TPU."""
import time
from functools import partial
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

import multigrid_poisson_solver_tpu as mg
from multigrid_poisson_solver_tpu.ops import pallas_kernels as pk
from multigrid_poisson_solver_tpu.ops.layout import padded_shape
from multigrid_poisson_solver_tpu.utils.profiling import DeviceTimer

N = 8193
H = 1.0 / (N - 1)
rp, cp = padded_shape(N)
timer = DeviceTimer()
print(f"descend geom: {pk._descend_geometry(rp, cp, 0, 4)}", flush=True)


@partial(jax.jit, static_argnums=(1, 2))
def _mk(seed, rows, cols):
    return jax.random.normal(jax.random.key(seed), (rows, cols), jnp.float32)


u = _mk(0, rp, cp)
f = _mk(1, rp, cp)

fn = jax.jit(lambda uu, ff: pk.fused_descend_padded(
    uu, ff, N, H, 3, omega=0.8, restriction="sampling", want_err=False,
    interpret=False)[0])
t0 = time.perf_counter()
out = fn(u, f)
_ = float(jax.device_get(jnp.sum(out[:8, :8])))
print(f"descend compile+run {time.perf_counter()-t0:.1f}s", flush=True)
t = timer.measure_differential(fn, u, f, reps=5)
print(f"descend steps=3 N={N}: {t*1e3:.3f} ms", flush=True)

# full converging V(3,3) cycle at 8193 (bench configuration)
cfg = mg.SolverConfig(omega=0.8, collect_node_stats=False)
program = mg.v_cycle(N, n_min=8, steps=3, coarse_option=0, coarsen=3)
cold = mg.compile_program(program, mg.REFERENCE_PROBLEM, cfg, donate=False)
warm = mg.compile_program(program, mg.REFERENCE_PROBLEM, cfg, donate=False,
                          warm=True)
u0, f0 = cold.init()
ITERS = 20
run = jax.jit(lambda a, b: jax.lax.fori_loop(
    0, ITERS, lambda i, v: warm.fn(v, b)[0], cold.fn(a, b)[0]))
t0 = time.perf_counter()
out = run(u0, f0)
_ = float(jax.device_get(jnp.sum(out[:8, :8])))
print(f"vcycle compile+run {time.perf_counter()-t0:.1f}s", flush=True)
t = timer.measure_differential(run, u0, f0, reps=2) / (ITERS + 1)
print(f"V(3,3) N={N}: {t*1e3:.3f} ms/cycle", flush=True)
