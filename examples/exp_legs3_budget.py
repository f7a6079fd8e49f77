"""VMEM-budget sweep for the fused 3-D descend/ascend legs at 513^3."""
import time
from functools import partial

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from multigrid_poisson_solver_tpu.ops import pallas3d as p3k
from multigrid_poisson_solver_tpu.ops import padded3 as pd3


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


def _s(out):
    if not isinstance(out, (tuple, list)):
        out = (out,)
    acc = sum(jnp.ravel(o)[:1].astype(jnp.float32).sum() for o in out)
    return float(jax.device_get(acc))


def tdiff(fn, *args, reps=4):
    out = fn(*args)
    _s(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _s(out)
    t1 = time.perf_counter()
    for _ in range(3 * reps):
        out = fn(*args)
    _s(out)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (2 * reps)


OMEGA = 6.0 / 7.0
n = 513
h = 1.0 / (n - 1)
m = (n + 1) // 2
u, f = mkpad(3, n), mkpad(4, n)
ec = mkpad(5, m)

for mb in (32, 48, 64, 80, 96):
    p3k._VMEM_BUDGET_3D_BYTES = mb * 1024 * 1024
    t0 = time.perf_counter()
    f_dn = jax.jit(partial(
        lambda a, b, mb=mb: pd3.restrict3_lanes_p(
            p3k.fused_descend3_padded(a, b, n, h, 3, omega=OMEGA)[1], n, m)))
    try:
        t = tdiff(f_dn, u, f)
        g = p3k._brick_geometry(n, 528, 640, 4, z_halo=5, num_bufs=6.6,
                                orow_mult=16, oz_even=True)
        print(f"[{time.perf_counter()-t0:.0f}s] descend @{mb} MiB: "
              f"{t*1e3:.2f} ms  geom={g}", flush=True)
    except Exception as e:
        print(f"descend @{mb} MiB: FAIL {type(e).__name__}: {e}"[:200],
              flush=True)
    t0 = time.perf_counter()
    f_up = jax.jit(partial(
        lambda a, b, c, mb=mb: p3k.fused_ascend3_padded(
            a, b, pd3.prolong3_lanes_p(c, n, m), n, h, 3, omega=OMEGA)))
    try:
        t = tdiff(f_up, u, f, ec)
        g = p3k._brick_geometry(n, 528, 640, 4, z_halo=3, num_bufs=6.6,
                                orow_mult=16, r_halo=16, zs_even=True)
        print(f"[{time.perf_counter()-t0:.0f}s] ascend  @{mb} MiB: "
              f"{t*1e3:.2f} ms  geom={g}", flush=True)
    except Exception as e:
        print(f"ascend @{mb} MiB: FAIL {type(e).__name__}: {e}"[:200],
              flush=True)
