"""Experiment: decompose the fused-ascend kernel cost (ROADMAP r3 item 1).

Times the N=8193 ascend kernel under: steps 1 vs 3 (sweep slope), the
"no_od" probe (skip the odd-row average), and "no_interleave" (skip the
whole row-prolongation construct) — all with the current _NB_MODE.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from multigrid_poisson_solver_tpu.ops import pallas_kernels as pk
from multigrid_poisson_solver_tpu.ops.layout import padded_shape
from multigrid_poisson_solver_tpu.utils.profiling import DeviceTimer

NB_MODE = sys.argv[1] if len(sys.argv) > 1 else "rotate"
pk._NB_MODE = NB_MODE

N = 8193
H = 1.0 / (N - 1)
rp, cp = padded_shape(N)
print(f"N={N} padded {rp}x{cp} nb_mode={NB_MODE}", flush=True)

from functools import partial

@partial(jax.jit, static_argnums=(1, 2))
def _mk(seed, rows, cols):
    return jax.random.normal(jax.random.key(seed), (rows, cols), jnp.float32)

u = _mk(0, rp, cp)
f = _mk(1, rp, cp)
cw = _mk(2, rp // 2 + 8, cp)

timer = DeviceTimer()


ITERS = 64


def run_case(label, probe, steps):
    """Time a 64-iteration carry-chained loop (~120 ms/call): single-call
    differentials at ~2 ms are swamped by the tunnel-window noise (the
    ROADMAP probe-protocol warning), and the carry dependence prevents
    hoisting."""
    pk._ASCEND_PROBE = probe

    def leg(uu, ff, cc):
        return pk._fused_ascend_shard_call(
            jnp.zeros((2,), jnp.int32), uu, ff, cc, N, H, steps, 1.0,
            None, ext_r=0, ext_c=0, interpret=False)[0]

    fn = jax.jit(lambda uu, ff, cc: jax.lax.fori_loop(
        0, ITERS, lambda i, v: leg(v, ff, cc), uu))
    t0 = time.perf_counter()
    out = fn(u, f, cw)
    _ = float(jax.device_get(jnp.sum(out[:8, :8])))
    print(f"  {label}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t = timer.measure_differential(fn, u, f, cw, reps=2) / ITERS
    print(f"  {label}: {t*1e3:.3f} ms", flush=True)
    return t


r = {}
r["base_s3"] = run_case("base steps=3", None, 3)
r["base_s1"] = run_case("base steps=1", None, 1)
pass
r["no_od_s3"] = run_case("no_od steps=3", "no_od", 3)
r["no_int_s3"] = run_case("no_interleave steps=3", "no_interleave", 3)
r["no_int_s1"] = run_case("no_interleave steps=1", "no_interleave", 1)
r["const_s3"] = run_case("const_coeff steps=3", "const_coeff", 3)
r["const_s1"] = run_case("const_coeff steps=1", "const_coeff", 1)
pk._ASCEND_PROBE = None

print("\n=== summary (ms) ===")
for k, v in r.items():
    print(f"{k:12s} {v*1e3:7.3f}")
sweep = (r["base_s3"] - r["base_s1"]) / 2
print(f"per-sweep slope      {sweep*1e3:.3f} ms")
print(f"odd-average cost     {(r['base_s3']-r['no_od_s3'])*1e3:.3f} ms")
print(f"interleave+avg cost  {(r['base_s3']-r['no_int_s3'])*1e3:.3f} ms")
print(f"interleave@s1        {(r['base_s1']-r['no_int_s1'])*1e3:.3f} ms")
print(f"mask-build cost @s3  {(r['base_s3']-r['const_s3'])*1e3:.3f} ms")
print(f"mask-build cost @s1  {(r['base_s1']-r['const_s1'])*1e3:.3f} ms")
