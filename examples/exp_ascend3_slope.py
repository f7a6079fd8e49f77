"""Per-sweep marginal cost inside the 3-D fused ascend leg (oct forms).

cost(steps=3) - cost(steps=1) over 2 = the in-kernel sweep marginal; the
smoother's oct sweep is ~1.7 ms at 513^3, so a much larger marginal here
would mean the leg's sweep loop is not getting the blocked-form win.
Also re-times the descend leg for the same slope.

Run:  python -u examples/exp_ascend3_slope.py
"""
import sys
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

from multigrid_poisson_solver_tpu.ops import pallas3d as p3k  # noqa: E402
from multigrid_poisson_solver_tpu.ops import padded3 as pd3  # noqa: E402
from multigrid_poisson_solver_tpu.utils.profiling import DeviceTimer  # noqa: E402

timer = DeviceTimer()
N = 513
H = 1.0 / (N - 1)
M = (N + 1) // 2
OMEGA = 6.0 / 7.0


@partial(jax.jit, static_argnums=(1,))
def mkpad(seed, n):
    nz, rp, cp = p3k.padded_shape3(n)
    v = jax.random.normal(jax.random.key(seed), (nz, rp, cp), jnp.float32)
    z = jnp.arange(nz).reshape(nz, 1, 1)
    r = jnp.arange(rp).reshape(1, rp, 1)
    c = jnp.arange(cp).reshape(1, 1, cp)
    interior = ((z >= 1) & (z <= n - 2) & (r >= 1) & (r <= n - 2)
                & (c >= 1) & (c <= n - 2))
    return jnp.where(interior, v, jnp.zeros_like(v))


def fetch(x):
    if isinstance(x, tuple):
        x = x[0]
    return float(jax.device_get(jnp.ravel(x)[0]))


def t_of(fn, *args, reps=3):
    fetch(fn(*args))
    return timer.measure_differential(fn, *args, reps=reps)


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    u, f = mkpad(3, N), mkpad(4, N)
    ec = mkpad(5, M)

    for k in (1, 3):
        fn = jax.jit(lambda a, b, c, k=k: p3k.fused_ascend3_padded(
            a, b, pd3.prolong3_lanes_p(c, N, M), N, H, k, omega=OMEGA))
        t = t_of(fn, u, f, ec)
        print(f"[ascend k={k}] {t*1e3:.2f} ms", flush=True)
        if k == 1:
            t1 = t
    print(f"[ascend] marginal sweep {(t-t1)/2*1e3:.2f} ms", flush=True)

    for k in (1, 3):
        fn = jax.jit(lambda a, b, k=k: p3k.fused_descend3_padded(
            a, b, N, H, k, omega=OMEGA)[0])
        t = t_of(fn, u, f)
        print(f"[descend k={k}] {t*1e3:.2f} ms", flush=True)
        if k == 1:
            t1 = t
    print(f"[descend] marginal sweep {(t-t1)/2*1e3:.2f} ms", flush=True)

    fn = jax.jit(lambda a, b: p3k.fused_jacobi3_padded(a, b, N, H, 8))
    t = t_of(fn, u, f)
    print(f"[smoother k=8] {t*1e3:.2f} ms = {t/8*1e3:.2f} ms/sweep",
          flush=True)


if __name__ == "__main__":
    main()
