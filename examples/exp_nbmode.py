"""Experiment: neighbor-sum lowering A/B on real TPU (ROADMAP r3 item 2).

Times the fused 8-sweep Jacobi pass at N=8193 under each _NB_MODE and
reports the per-sweep slope (t8 - t4)/4 — pure VPU cost, DMA cancelled.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from multigrid_poisson_solver_tpu.ops import pallas_kernels as pk
from multigrid_poisson_solver_tpu.ops.layout import padded_shape
from multigrid_poisson_solver_tpu.utils.profiling import DeviceTimer

N = 8193
H = 1.0 / (N - 1)
rp, cp = padded_shape(N)
print(f"N={N} padded {rp}x{cp}", flush=True)

rng = np.random.default_rng(0)

@jax.jit
def _mk(seed):
    k = jax.random.key(seed)
    a = jax.random.normal(k, (rp, cp), jnp.float32)
    rows = jnp.arange(rp)[:, None]
    cols = jnp.arange(cp)[None, :]
    ok = ((rows >= 1) & (rows <= N - 2) & (cols >= 1) & (cols <= N - 2))
    return jnp.where(ok, a, 0.0)

u = _mk(0)
f = _mk(1)

timer = DeviceTimer()
results = {}
checks = {}
for mode in ("rotate", "concat", "mixed"):
    pk._NB_MODE = mode
    pk._fused_jacobi_call.clear_cache()
    ts = {}
    for steps in (4, 8):
        def run(uu, ff, steps=steps):
            return pk._fused_jacobi_call(uu, ff, n=N, h=H, steps=steps,
                                         omega=0.8, from_zero=False,
                                         interpret=False)
        t0 = time.perf_counter()
        out = run(u, f)
        checks[(mode, steps)] = float(jax.device_get(
            jnp.sum(out[:N:97, :N:97])))
        print(f"  {mode} steps={steps} compile+run "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        ts[steps] = timer.measure_differential(run, u, f, reps=5)
        print(f"  {mode} steps={steps}: {ts[steps]*1e3:.3f} ms", flush=True)
    slope = (ts[8] - ts[4]) / 4
    results[mode] = (ts[4], ts[8], slope)
    print(f"{mode}: t4={ts[4]*1e3:.3f} t8={ts[8]*1e3:.3f} "
          f"per-sweep={slope*1e3:.3f} ms", flush=True)

print("\n=== summary ===")
for m, (t4, t8, sl) in results.items():
    print(f"{m:8s} t8={t8*1e3:7.3f} ms  per-sweep={sl*1e3:6.3f} ms  "
          f"({N*N/sl/1e9:.0f} GDoF/s marginal)")
ref = checks[("rotate", 8)]
for k, v in checks.items():
    if abs(v - ref) > 1e-3 * max(1.0, abs(ref)) and k[1] == 8:
        print(f"MISMATCH {k}: {v} vs {ref}")
print("checksums ok" if all(
    abs(checks[(m, s)] - checks[("rotate", s)]) < 1e-3
    for m in ("rotate", "concat", "mixed") for s in (4, 8)) else "CHECK FAIL")
