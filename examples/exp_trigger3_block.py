"""A/B the multi-output-plane blocking inside the 3-D whole-loop trigger
kernels on real TPU: fused_trigger3_vmem at 129^3 (largest in-VMEM size).

Negative trigger => the loop runs max_sweeps exactly (fixed work, clean
slopes — the exp_rdma_calibrate.py protocol); slope over two max_sweeps
values cancels entry/exit. Outputs must be bit-identical across forms.

Run:  python -u examples/exp_trigger3_block.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

from multigrid_poisson_solver_tpu.ops import pallas3d as p3  # noqa: E402
from multigrid_poisson_solver_tpu.utils.profiling import DeviceTimer  # noqa: E402

timer = DeviceTimer()
N = 129
H = 1.0 / (N - 1)
S1, S2 = 300, 900


def fetch(x):
    return float(jax.device_get(jnp.ravel(x)[0]))


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
    for form in ("reread", "oct"):
        p3._SWEEP3_FORM = form
        slopes = {}
        for compat in ("clean", "gpu"):
            ts = {}
            for S in (S1, S2):
                fn = jax.jit(lambda a, b, S=S, c=compat:
                             p3.fused_trigger3_vmem(
                                 a, b, N, H, -1.0, 6.0 / 7.0, c, S)[1])
                _ = fetch(fn(u, f))
                ts[S] = timer.measure_differential(fn, u, f, reps=4)
            slope = (ts[S2] - ts[S1]) / (S2 - S1)
            slopes[compat] = slope
            print(f"[{form}/{compat}] T({S1})={ts[S1]*1e3:.2f} ms "
                  f"T({S2})={ts[S2]*1e3:.2f} -> {slope*1e6:.2f} us/sweep",
                  flush=True)
        # bit-identity on the full-state output (clean, S1 sweeps)
        fn_u = jax.jit(lambda a, b: p3.fused_trigger3_vmem(
            a, b, N, H, -1.0, 6.0 / 7.0, "clean", 50)[0])
        outs[form] = fn_u(u, f)
        _ = fetch(outs[form])
    md = float(jax.device_get(jnp.max(jnp.abs(outs["oct"]
                                              - outs["reread"]))))
    print(f"[match] oct vs reread (50 sweeps) maxdiff {md:.3e}", flush=True)
    p3._SWEEP3_FORM = "oct"


if __name__ == "__main__":
    main()
