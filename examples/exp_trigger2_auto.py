"""A/B trigger_batch="auto" for the 2-D per-pass regime (8193^2) on TPU.

Below 4097^2 the whole-loop kernel tiers supersede batching; 8193^2 is
the first unsharded size where the per-pass loop (and therefore
batching/auto) actually runs. Mirrors exp_trigger3_auto.py.

Run:  python -u examples/exp_trigger2_auto.py
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
from multigrid_poisson_solver_tpu.compiled import compile_program  # noqa: E402
from multigrid_poisson_solver_tpu.utils.profiling import DeviceTimer  # noqa: E402

N = 8193
timer = DeviceTimer()
program = mg.v_cycle(N, n_min=8, steps=-1, coarse_option=0, coarsen=3)

for label, trig, cap in (("many-sweep", 1e-6, 48),
                         ("early-stop", 1e-2, 20)):
    print(f"--- {label}: trigger={trig} cap={cap} ---", flush=True)
    for batch in (1, 7, "auto"):
        cfg = mg.SolverConfig(omega=0.8, kernels="pallas", trigger=trig,
                              max_trigger_sweeps=cap, trigger_batch=batch,
                              collect_node_stats=False)
        cc = compile_program(program, mg.REFERENCE_PROBLEM, cfg,
                             donate=False)
        u, f = cc.init()
        t0 = time.perf_counter()
        out, err = cc(u, f)
        _ = float(jax.device_get(jnp.sum(out[:1, :8])))
        print(f"  batch={batch}: compile+run "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        per = timer.measure_differential(lambda a, b: cc.fn(a, b)[0],
                                         u, f, reps=2)
        print(f"  batch={batch}: {per*1e3:.1f} ms/cycle, "
              f"err={float(err):.4e}", flush=True)
