"""3-D u-resident/f-streamed trigger on real TPU (the 257³ class).

Bit-match vs the per-pass fused-err loop (same stop rule, cap-bound so
both run the same sweep count) + the wall A/B — the 2-D
exp_trigger_stream_tpu measurement one dimension up.

Run:  python -u examples/exp_trigger3_stream_tpu.py
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
N = 257
H = 1.0 / (N - 1)
CAP = 30
COMPAT = "clean"
OMEGA = 6.0 / 7.0


def fetch(x):
    return float(jax.device_get(x))


def per_pass(u, f, trig):
    u, raw = p3.fused_jacobi3_padded(u, f, N, H, 1, omega=OMEGA,
                                     err_mode=COMPAT)
    err0 = (raw / N ** 3).astype(u.dtype)

    def cond(s):
        _, _, slope, k = s
        return jnp.logical_and(slope > trig, k < CAP)

    def body(s):
        u, prev, _, k = s
        u, raw = p3.fused_jacobi3_padded(u, f, N, H, 1, omega=OMEGA,
                                         err_mode=COMPAT)
        err = (raw / N ** 3).astype(u.dtype)
        return u, err, jnp.abs(err - prev), k + 1

    u, err, _, _ = jax.lax.while_loop(
        cond, body, (u, err0, jnp.asarray(trig + 1.0, err0.dtype),
                     jnp.asarray(1, jnp.int32)))
    return u, err


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)
    nz, rp, cp = p3.padded_shape3(N)
    print(f"stream fits: {p3.trigger3_stream_fits(N)} "
          f"(volume {nz*rp*cp*4/2**20:.1f} MiB)", flush=True)

    @jax.jit
    def build(key):
        k1, k2 = jax.random.split(key)
        return (jax.random.normal(k1, (nz, rp, cp), jnp.float32),
                jax.random.normal(k2, (nz, rp, cp), jnp.float32))

    u, f = build(jax.random.key(0))

    # cap-bound loop (tiny trigger): both paths run exactly CAP sweeps
    fn_s = jax.jit(lambda a, b: p3.fused_trigger3_stream(
        a, b, N, H, 1e-12, OMEGA, COMPAT, CAP))
    fn_p = jax.jit(lambda a, b: per_pass(a, b, 1e-12))

    t0 = time.perf_counter()
    us, es = fn_s(u, f)
    _ = fetch(jnp.sum(us[:1, :8, :8]))
    print(f"[stream] compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    up, ep = fn_p(u, f)
    _ = fetch(jnp.sum(up[:1, :8, :8]))
    print(f"[per-pass] compile+run {time.perf_counter()-t0:.1f}s",
          flush=True)

    md = fetch(jnp.max(jnp.abs(us - up)))
    print(f"[match] u maxdiff {md:.3e}; err {fetch(es):.6e} vs "
          f"{fetch(ep):.6e}", flush=True)

    fn_s1 = jax.jit(lambda a, b: fn_s(a, b)[0])
    fn_p1 = jax.jit(lambda a, b: fn_p(a, b)[0])
    ts = timer.measure_differential(fn_s1, u, f, reps=3)
    tp = timer.measure_differential(fn_p1, u, f, reps=3)
    print(f"[time] 257^3 cap-bound {CAP}-sweep trigger loop: stream "
          f"{ts*1e3:.2f} ms ({ts/CAP*1e3:.3f}/sweep) vs per-pass "
          f"{tp*1e3:.2f} ({tp/CAP*1e3:.3f}/sweep) -> {tp/ts:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
