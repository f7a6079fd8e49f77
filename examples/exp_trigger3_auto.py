"""A/B the round-5 trigger_batch="auto" heuristic on real TPU at 513^3.

The measured law (BASELINE "3-D fused error"): explicit batch=7 wins
1.42x on the many-sweep config (trigger=1e-4, cap 56) and LOSES on the
early-stop config (trigger=1e-2, cap 20). "auto" must reproduce the win
without regressing the early-stop case: exact per-sweep warmup (2B
sweeps), then batched passes only if the loop is still running.

Run:  python -u examples/exp_trigger3_auto.py
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
from multigrid_poisson_solver_tpu.compiled3 import compile_program3  # noqa: E402
from multigrid_poisson_solver_tpu.models import poisson3d as p3  # noqa: E402
from multigrid_poisson_solver_tpu.utils.profiling import DeviceTimer  # noqa: E402

N = 513
timer = DeviceTimer()
program = mg.v_cycle(N, n_min=5, steps=-1, coarse_option=0, coarsen=3)

for label, trig, cap in (("many-sweep", 1e-4, 56),
                         ("early-stop", 1e-2, 20)):
    print(f"--- {label}: trigger={trig} cap={cap} ---", flush=True)
    for batch in (1, 7, "auto"):
        cfg = mg.SolverConfig(omega=6.0 / 7.0, kernels="pallas",
                              trigger=trig, max_trigger_sweeps=cap,
                              trigger_batch=batch,
                              collect_node_stats=False)
        cc = compile_program3(program, p3.REFERENCE_PROBLEM_3D, cfg,
                              donate=False)
        u, f = cc.init()
        t0 = time.perf_counter()
        out, err = cc(u, f)
        _ = float(jax.device_get(jnp.sum(out[:1, :8, :8])))
        print(f"  batch={batch}: compile+run "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        per = timer.measure_differential(lambda a, b: cc(a, b)[0],
                                         u, f, reps=2)

        # analytic grid TRACED inside the jit: a concrete 540 MB closure
        # constant would ship over the ~2 MB/s tunnel (HTTP 413)
        @jax.jit
        def qual(a, b):
            ana = p3.REFERENCE_PROBLEM_3D.analytic_grid(N, jnp.float32)
            return jnp.mean(jnp.abs(cc(a, b)[0] - ana))

        q = float(jax.device_get(qual(u, f)))
        print(f"  batch={batch}: {per*1e3:.1f} ms/cycle, "
              f"err={float(err):.4e}, |u-ana|={q:.4e}", flush=True)
