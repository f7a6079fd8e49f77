"""3-D smoother multi-output-plane blocking A/B on real TPU.

The reread form loads 3 VMEM planes per updated plane per sweep; the
pair/quad forms update B planes per fori iteration, loading t-1..t+B once
(B+2 loads / B updates -> 2.0 / 1.5 loads per update). Per-plane
expressions/order are identical to reread, so outputs are bit-identical.
513^3 k=8, chained >=100 ms protocol (same as exp_sweep3_carry.py).

Run:  python -u examples/exp_sweep3_block.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

from multigrid_poisson_solver_tpu.ops import pallas3d as p3  # noqa: E402
from multigrid_poisson_solver_tpu.utils.profiling import DeviceTimer  # noqa: E402

timer = DeviceTimer()
N = 513
H = 1.0 / (N - 1)
K = 8
ITERS = 12


def fetch(x):
    return float(jax.device_get(x))


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    nz, rp, cp = p3.padded_shape3(N)

    @jax.jit
    def build(key):
        k1, k2 = jax.random.split(key)
        return (jax.random.normal(k1, (nz, rp, cp), jnp.float32),
                jax.random.normal(k2, (nz, rp, cp), jnp.float32))

    u, f = build(jax.random.key(0))
    outs = {}
    for form in ("reread", "oct", "blk16"):
        p3._SWEEP3_FORM = form

        def pass_(uu, ff):
            return p3.fused_jacobi3_padded(uu, ff, N, H, K)

        fn = jax.jit(lambda uu, ff: jax.lax.fori_loop(
            0, ITERS, lambda i, v: pass_(v, ff), uu))
        t0 = time.perf_counter()
        out = fn(u, f)
        _ = fetch(jnp.sum(out[:1, :8, :8]))
        print(f"[{form}] compile+run {time.perf_counter()-t0:.1f}s",
              flush=True)
        outs[form] = out
        t = timer.measure_differential(fn, u, f, reps=2) / (ITERS * K)
        gdof = N ** 3 / t / 1e9
        print(f"[{form}] 513^3 k={K}: {t*1e3:.3f} ms/sweep = "
              f"{gdof:.1f} GDoF/s", flush=True)
    for form in ("oct", "blk16"):
        md = fetch(jnp.max(jnp.abs(outs[form] - outs["reread"])))
        print(f"[match] {form} vs reread maxdiff {md:.3e}", flush=True)


if __name__ == "__main__":
    main()
