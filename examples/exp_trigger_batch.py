"""Experiment: trigger-batch A/B on real TPU (ROADMAP r3 item 3 payoff).

Times the N=1025 trigger W-cycle (BASELINE config 2) with
SolverConfig.trigger_batch in {1, 4, 6}: ms/cycle via chained warm cycles,
plus the final error-vs-analytic so the overshoot semantics stay honest.
"""
import time
import jax
import jax.numpy as jnp

import multigrid_poisson_solver_tpu as mg
from multigrid_poisson_solver_tpu.utils.profiling import DeviceTimer

N = 1025
ITERS = 40
program = mg.w_cycle(N, n_min=8, steps=-1, coarse_option=1, coarsen=3)
timer = DeviceTimer()

for batch in (1, 4, 6):
    cfg = mg.SolverConfig(omega=0.8, trigger_batch=batch,
                          collect_node_stats=False)
    cold = mg.compile_program(program, mg.REFERENCE_PROBLEM, cfg,
                              donate=False)
    warm = mg.compile_program(program, mg.REFERENCE_PROBLEM, cfg,
                              donate=False, warm=True)
    u, f = cold.init()

    run = jax.jit(lambda u, f: jax.lax.fori_loop(
        0, ITERS, lambda i, v: warm.fn(v, f)[0], cold.fn(u, f)[0]))
    t0 = time.perf_counter()
    out = run(u, f)
    _ = float(jax.device_get(jnp.sum(out[:8, :8])))
    print(f"batch={batch}: compile+run {time.perf_counter()-t0:.1f}s",
          flush=True)
    per = timer.measure_differential(run, u, f, reps=3) / (ITERS + 1)
    # solution quality after 3 cycles (cheap fetch: mean |u-ana| on device)
    spec = cold.finest_spec
    ana = mg.REFERENCE_PROBLEM.analytic_grid(spec, jnp.float32)

    @jax.jit
    def qual(u, f):
        v = jax.lax.fori_loop(0, 2, lambda i, v: warm.fn(v, f)[0],
                              cold.fn(u, f)[0])
        return jnp.mean(jnp.abs(cold.unpad(v) - ana))

    q = float(jax.device_get(qual(u, f)))
    print(f"batch={batch}: {per*1e3:.3f} ms/cycle, "
          f"|u-ana| after 3 cycles = {q:.3e}", flush=True)
