"""Hardware validation + timing of the fused 3-D descend/ascend legs.

Correctness at n=129 (multi-brick on the real chip) against the already
hardware-validated component ops, then 513^3 component timings and the full
padded-resident V(3,3) cycle. Differential-timing protocol throughout
(.claude/skills/verify/SKILL.md)."""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from multigrid_poisson_solver_tpu.models import poisson3d as p3
from multigrid_poisson_solver_tpu.ops import pallas3d as p3k
from multigrid_poisson_solver_tpu.ops import padded3 as pd3

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


def maxdiff(a, b):
    return float(jax.device_get(jnp.abs(a - b).max()))


# --------------------------- correctness, n=129 ---------------------------
n = 129
h = 1.0 / (n - 1)
m = (n + 1) // 2
u, f = mkpad(0, n), mkpad(1, n)
ec = mkpad(2, m)

t0 = time.perf_counter()
uo, dw, err = jax.jit(
    lambda a, b: p3k.fused_descend3_padded(a, b, n, h, 3, omega=OMEGA))(u, f)
fc = pd3.restrict3_lanes_p(dw, n, m)
# oracle from hardware-validated components
uref = p3k.fused_jacobi3_padded(u, f, n, h, 3, omega=OMEGA)
rref = p3k.residual3_pallas(uref, f, n, h, negate=True)
fcref = pd3.restrict3_p(rref, n, m)
err_ref = float(jax.device_get(jnp.sum(jnp.abs(rref))))
print(f"[{time.perf_counter()-t0:.0f}s] descend n=129: "
      f"u maxdiff {maxdiff(uo, uref):.3e}  fc maxdiff {maxdiff(fc, fcref):.3e}"
      f"  err {float(jax.device_get(err[0,0])):.6e} vs {err_ref:.6e}",
      flush=True)

t0 = time.perf_counter()
cw = pd3.prolong3_lanes_p(ec, n, m)
ua = jax.jit(lambda a, b, c: p3k.fused_ascend3_padded(
    a, b, c, n, h, 3, omega=OMEGA))(u, f, cw)
uaref = p3k.fused_jacobi3_padded(
    pd3.prolong3_add_p(u, ec, n, m, interior_only=True), f, n, h, 3,
    omega=OMEGA)
print(f"[{time.perf_counter()-t0:.0f}s] ascend n=129: "
      f"maxdiff {maxdiff(ua, uaref):.3e}", flush=True)

# sampling-mode descend
uo2, dw2, _ = jax.jit(lambda a, b: p3k.fused_descend3_padded(
    a, b, n, h, 3, omega=OMEGA, restriction="sampling"))(u, f)
fc2 = pd3.restrict3_lanes_p(dw2, n, m)
fc2ref = pd3.restrict3_p(rref, n, m, mode="sampling")
print(f"descend sampling n=129: fc maxdiff {maxdiff(fc2, fc2ref):.3e}",
      flush=True)

# --------------------------- timing, n=513 ---------------------------------
n = 513
h = 1.0 / (n - 1)
m = (n + 1) // 2
u, f = mkpad(3, n), mkpad(4, n)
ec = mkpad(5, m)

for steps in (3,):
    t0 = time.perf_counter()
    f_sm = jax.jit(lambda a, b: p3k.fused_jacobi3_padded(
        a, b, n, h, steps, omega=OMEGA))
    t = tdiff(f_sm, u, f)
    print(f"[{time.perf_counter()-t0:.0f}s] smooth k={steps} 513^3: "
          f"{t*1e3:.2f} ms", flush=True)

t0 = time.perf_counter()
f_res = jax.jit(lambda a, b: p3k.residual3_pallas(a, b, n, h, negate=True))
t = tdiff(f_res, u, f)
print(f"[{time.perf_counter()-t0:.0f}s] residual 513^3: {t*1e3:.2f} ms",
      flush=True)

t0 = time.perf_counter()
f_rst = jax.jit(lambda r: pd3.restrict3_p(r, n, m))
t = tdiff(f_rst, u)
print(f"[{time.perf_counter()-t0:.0f}s] restrict3_p 513->257: {t*1e3:.2f} ms",
      flush=True)

t0 = time.perf_counter()
f_dn = jax.jit(lambda a, b: pd3.restrict3_lanes_p(
    p3k.fused_descend3_padded(a, b, n, h, 3, omega=OMEGA)[1], n, m))
t = tdiff(f_dn, u, f)
print(f"[{time.perf_counter()-t0:.0f}s] FUSED descend leg (k=3 + lanes) "
      f"513^3: {t*1e3:.2f} ms", flush=True)

t0 = time.perf_counter()
f_old_up = jax.jit(lambda a, b, c: p3k.fused_jacobi3_padded(
    pd3.prolong3_add_p(a, c, n, m, interior_only=True), b, n, h, 3,
    omega=OMEGA))
t = tdiff(f_old_up, u, f, ec)
print(f"[{time.perf_counter()-t0:.0f}s] OLD ascend (prolong_add + k=3) "
      f"513^3: {t*1e3:.2f} ms", flush=True)

t0 = time.perf_counter()
f_up = jax.jit(lambda a, b, c: p3k.fused_ascend3_padded(
    a, b, pd3.prolong3_lanes_p(c, n, m), n, h, 3, omega=OMEGA))
t = tdiff(f_up, u, f, ec)
print(f"[{time.perf_counter()-t0:.0f}s] FUSED ascend leg (lanes + k=3) "
      f"513^3: {t*1e3:.2f} ms", flush=True)

# full V(3,3) cycle, padded-resident pallas path
uu, ff = mkpad(6, n)[:n, :n, :n], mkpad(7, n)[:n, :n, :n]
t0 = time.perf_counter()
f_vc = jax.jit(lambda a, b: p3.v_cycle3(a, b, h, pre=3, post=3,
                                        kernels="pallas"))
t = tdiff(f_vc, uu, ff, reps=3)
print(f"[{time.perf_counter()-t0:.0f}s] v_cycle3(3,3) pallas 513^3: "
      f"{t*1e3:.2f} ms/cycle", flush=True)
